package graft

import org.apache.spark.sql.functions._
import graft.ext.Extensions

/** Round-7 additions: Zipf fit (E25), NB quality-classifier
  * distillation (E26), hybrid RRF retrieval (E27). The DuckDB hash
  * compare is the primary gate; these tests pin the semantic
  * invariants a hash can't explain when it breaks. */
class RetrievalStatsSpec extends SparkSpec {

  test("zipf fit: one row, negative slope, r2 in [0,1], n_terms capped") {
    val r = Extensions.zipfFit.fn(spark, sf0001).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(0) > 0 && row.getLong(0) <= Extensions.ZipfTopK)
    assert(row.getDouble(1) < 0.0, "frequency must fall with rank")
    val r2 = row.getDouble(3)
    assert(r2 >= 0.0 && r2 <= 1.0)
  }

  test("zipf fit: planted zipfian corpus recovers its exponent") {
    // freq(term_i) = round(1000 / i) for i in 1..50 → slope ≈ -1
    import spark.implicits._
    val docs = (1 to 50).flatMap { i =>
      Seq.fill(math.max(1000 / i, 1))(s"w$i")
    }.zipWithIndex.map { case (w, j) => (j.toLong, w) }.toDF("doc_id", "text")
    val tc = docs
      .select(explode(split(Extensions.edgeTrim(lower(col("text"))), "\\s+")).as("term"))
      .groupBy("term").agg(count(lit(1)).cast("double").as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("term").asc)
    val slope = tc.withColumn("rank", row_number().over(w).cast("double"))
      .agg(expr("regr_slope(ln(cnt), ln(rank))")).first().getDouble(0)
    assert(math.abs(slope - (-1.0)) < 0.05, s"slope $slope should be ~ -1")
  }

  test("NB classifier: one row per doc; labels binary; log-odds sign defines nb_label") {
    val df = Extensions.qualityClassifier.fn(spark, sf0001)
    val rows = df.collect()
    val nDocs = graft.model.Tables.documents(spark, sf0001).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val (weak, lo, nb, agrees) =
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))
      assert(weak == 0L || weak == 1L)
      assert(nb == (if (lo >= 0) 1L else 0L))
      assert(agrees == (if (nb == weak) 1L else 0L))
    }
    // the distilled model must beat coin-flip agreement with its own
    // training signal by a wide margin — if this drops near 0.5 the
    // model join or the smoothing is broken, even if hashes "pass"
    val agree = rows.count(_.getLong(4) == 1L).toDouble / rows.length
    assert(agree > 0.55, s"NB agreement with weak label only $agree")
  }

  test("NB classifier: single-class corpus stays finite (smoothed prior)") {
    // every doc below the 0.6 weak-label threshold: n_pos = 0, and an
    // unsmoothed ln(n_pos/n_neg) prior would be -Infinity — the sign
    // cut then compares non-finite values across engines and the hash
    // gate fails opaquely. The add-one-smoothed prior must keep every
    // log_odds finite on any class balance.
    import spark.implicits._
    val docs = (1L to 20L)
      .map(i => (i, s"zz zz zz zz zz zz zz zz zz$i"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet("target/tmp-nb1cls/documents.parquet")
    val rows = Extensions.qualityClassifier.fn(spark, "target/tmp-nb1cls").collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getLong(1) == 0L), "fixture must be single-class")
    rows.foreach { r =>
      val lo = r.getDouble(2)
      assert(!lo.isNaN && !lo.isInfinite, s"non-finite log_odds $lo")
    }
  }

  test("indexed hybrid (PQ dense tower): overlap floor clears; metric well-formed") {
    val rows = Extensions.hybridSearchPq.fn(spark, sf0001).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getString(0) == "hybrid_pq")
    // denominator is the fixed query workload — a query whose indexed
    // fusion returned nothing counts as overlap 0, never drops out
    assert(r.getLong(1) == Extensions.HybridQueryCount.toLong)
    info(s"hybrid_pq overlap_at_10 = ${r.getDouble(2)}")
    assert(r.getBoolean(3),
      s"overlap ${r.getDouble(2)} below floor ${Extensions.HybridPqOverlapFloor}")
    // the indexed ranking itself is well-formed: dense ranks 1..k per
    // query, no self-retrieval
    val ranking = Extensions.hybridSearchPqRanking(spark, sf0001)
    assert(ranking.filter(col("query_id") === col("doc_id")).count() == 0)
    val byQ = ranking.collect().groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      assert(rs.length <= Extensions.HybridTopK)
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length))
    }
  }

  test("indexed hybrid (IVFPQ dense tower): overlap floor clears; metric well-formed") {
    val rows = Extensions.hybridSearchIvfpq.fn(spark, sf0001).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getString(0) == "hybrid_ivfpq")
    assert(r.getLong(1) == Extensions.HybridQueryCount.toLong)
    info(s"hybrid_ivfpq overlap_at_10 = ${r.getDouble(2)}")
    assert(r.getBoolean(3),
      s"overlap ${r.getDouble(2)} below floor ${Extensions.HybridIvfpqOverlapFloor}")
    // the cell-routed ranking itself is well-formed: top-k per query,
    // ranks contiguous from 1, no self-retrieval
    val ranking = Extensions.hybridSearchIvfpqRanking(spark, sf0001)
    assert(ranking.filter(col("query_id") === col("doc_id")).count() == 0)
    val byQ = ranking.collect().groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      assert(rs.length <= Extensions.HybridTopK)
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length))
    }
    Extensions.releaseCaches()
  }

  test("hybrid overlap metrics: fixture-served reference equals the live derivation to 4dp") {
    // round 12 moved the metric's REFERENCE side (sparse tower + exact
    // fusion) into parquet fixtures — the annExactBaseline discipline.
    // This pins the reported overlap to a twin computed LIVE from the
    // public tower builders, so a stale or corrupted fixture (or any
    // drift in the fixture keying) fails loudly instead of silently
    // shifting the metric.
    def liveOverlap(indexedRanking: org.apache.spark.sql.DataFrame): Double = {
      val q = Extensions.hybridQueries(spark, sf0001)
      val sparse = Extensions.hybridSparseTop(spark, sf0001, q)
      val exact = Extensions.hybridFuse(
          Extensions.hybridDenseExact(Extensions.hybridEmb(spark, sf0001), q), sparse)
        .select("query_id", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val idx = indexedRanking.select("query_id", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val byQ = exact.groupBy(_._1)
      val overlaps = byQ.values.map(ps => ps.count(idx.contains).toDouble / ps.length)
      math.rint(overlaps.sum / overlaps.size * 1e4) / 1e4
    }
    val reportedPq = Extensions.hybridSearchPq.fn(spark, sf0001)
      .collect()(0).getDouble(2)
    val livePq = liveOverlap(Extensions.hybridSearchPqRanking(spark, sf0001))
    assert(reportedPq == livePq,
      s"fixture-served pq overlap $reportedPq != live twin $livePq")
    val reportedIvfpq = Extensions.hybridSearchIvfpq.fn(spark, sf0001)
      .collect()(0).getDouble(2)
    val liveIvfpq = liveOverlap(Extensions.hybridSearchIvfpqRanking(spark, sf0001))
    assert(reportedIvfpq == liveIvfpq,
      s"fixture-served ivfpq overlap $reportedIvfpq != live twin $liveIvfpq")
    Extensions.releaseCaches()
  }

  test("hybrid RRF: rank-1 fused score requires presence in a top list; bounds hold") {
    val rows = Extensions.hybridSearch.fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.foreach { case (_, rs) =>
      assert(rs.length <= Extensions.HybridTopK)
      // ranks are 1..k dense and rrf is non-increasing in rank
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to rs.length))
      val scores = sorted.map(_.getDouble(2)).toSeq
      assert(scores == scores.sorted.reverse)
      // max possible fused score is 2/(RrfK+1); min positive is 1/(RrfK+PerSide)
      assert(scores.head <= 2.0 / (Extensions.RrfK + 1) + 1e-9)
      assert(scores.last >= 1.0 / (Extensions.RrfK + Extensions.HybridPerSide) - 1e-9)
    }
    // a doc ranked #1 by BOTH towers must fuse to exactly 2/(RrfK+1)
    // somewhere unless towers disagree everywhere — just assert the
    // self-exclusion contract instead: a query never retrieves itself
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("kNN label audit: votes bounded by k, purity consistent with correct") {
    val rows = Extensions.knnLabelAudit.fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (votes, correct, purity) =
        (r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(votes >= 1 && votes <= Extensions.AnnK)
      assert(purity >= 0.0 && purity <= 1.0)
      // if the majority label IS the true label, purity must cover the
      // winning vote share; if not, the true label got at most `votes`
      if (correct == 1L) assert(purity >= votes.toDouble / Extensions.AnnK - 1e-9)
      else assert(purity <= votes.toDouble / Extensions.AnnK + 1e-9)
    }
  }

  test("cluster centroids: every label covered; cosines bounded; planted coherent cluster") {
    import spark.implicits._
    val rows = Extensions.clusterCentroids.fn(spark, sf0001).collect()
    val nLabels = graft.model.Tables.embeddings(spark, sf0001)
      .select("label").distinct().count()
    assert(rows.length == nLabels)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(3) >= -1.0 - 1e-9 && r.getDouble(3) <= 1.0 + 1e-9)
      assert(r.getDouble(4) <= r.getDouble(3) + 1e-9, "min_cos <= avg_cos")
    }
    // identical members ⇒ centroid == member ⇒ all cosines exactly 1
    val planted = Seq.tabulate(4)(i =>
      (i.toLong, Array.fill(8)(0.5f), 7)).toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("centroid-planted").toString
    planted.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Extensions.clusterCentroids.fn(spark, dir).collect()
    assert(out.length == 1 && out(0).getDouble(3) == 1.0 && out(0).getDouble(4) == 1.0)
  }

  test("BPE pair stats: planted corpus counts weighted pairs; single-char tokens ignored") {
    import spark.implicits._
    // "ab" ×3 docs + "abc" ×1 + "x" (no pairs): ab = 3+1 = 4, bc = 1
    val docs = Seq((0L, "ab ab x"), (1L, "ab abc")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bpe-planted").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Extensions.bpePairStats.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("ab" -> 4L, "bc" -> 1L), s"got $got")
  }
}
