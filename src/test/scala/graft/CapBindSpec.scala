package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.Scalars
import graft.ext.Extensions

/** Direct coverage of the hot-bucket cap BRANCHES. The registered
  * queries never exercise these at driver SFs (headroom is asserted in
  * ExtensionsSpec precisely so the oracle never sees a capped bucket),
  * which means a regression inside the cap logic — the ordering column,
  * an off-by-one in the rank filter, a dropped anchor — would stay
  * invisible until the cap binds at production scale. Here the cap is
  * forced to bind on planted buckets and the survivor set is asserted
  * against the documented deterministic ordering, recomputed
  * independently in the test. */
class CapBindSpec extends SparkSpec {
  import spark.implicits._

  test("semantic cap=1/2 binds: hash-ordered survivors, pairs only among them") {
    // four IDENTICAL vectors → one bucket per table; cap must keep the
    // `cap` smallest by (hash60(vec_id), vec_id) — not by vec_id
    val v = Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0).toSeq
    val emb = Seq(101L, 202L, 303L, 404L).toDF("vec_id")
      .withColumn("v", typedLit(v))
    val order = emb
      .select(col("vec_id"), Scalars.hash60(col("vec_id").cast("string")).as("h"))
      .orderBy("h", "vec_id").collect().map(_.getLong(0))
    // the hash permutation must differ from natural id order for this
    // test to pin the ordering column (it does for these ids)
    assert(order.toSeq != Seq(101L, 202L, 303L, 404L),
      "planted ids hash in natural order; pick different ids")

    val capped1 = Extensions.semanticPairsFrom(emb, cap = 1).collect()
    assert(capped1.isEmpty, "cap=1 keeps one member per bucket: no pairs")

    val capped2 = Extensions.semanticPairsFrom(emb, cap = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val survivors = order.take(2)
    assert(capped2 == Set((survivors.min, survivors.max)),
      s"cap=2 survivors must be the two hash-smallest ($survivors), got $capped2")
    Extensions.releaseCaches()
  }

  test("minhash hot bucket degrades to star edges on the two xxhash-ordered anchors") {
    // five IDENTICAL texts → every band bucket holds all five, size 5 >
    // cap 2 → the hot branch emits star edges to anchors a1/a2 per
    // bucket (connectivity preserved, volume linear). Expected pairs
    // are recomputed here from the REAL banded rows with the documented
    // ordering — any drift in bandCandidates' anchor choice fails this.
    // 12 members: 4 bands × 2 anchors = at most 8 anchor slots, so ≥4
    // docs can never anchor and the star union is GUARANTEED a strict
    // subset of the 66-pair clique (with 5 docs the anchor union can —
    // and deterministically did — cover the whole clique)
    val txt = "the planted corpus sentence repeated verbatim across all twelve documents"
    val members = (1 to 12).map(_ * 11L)
    val docs = members.map(id => (id, txt)).toDF("doc_id", "text")
    val sig = Extensions.minhashSignatures(docs)
    val banded = Extensions.minhashBanded(sig)
    val w = Window.partitionBy(col("band"), col("bk"))
      .orderBy(xxhash64(col("band"), col("bk"), col("doc_id")), col("doc_id"))
    val anchors = banded.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .groupBy("band", "bk").agg(collect_list("doc_id").as("as"))
      .collect().map(_.getSeq[Long](2))
    val expected = anchors.flatMap { a =>
      a.flatMap(an => members.filter(_ != an)
        .map(m => (math.min(an, m), math.max(an, m))))
    }.toSet
    assert(expected.size < 66, "star capping must not reach the full clique")

    val got = Extensions.minhashPairsFrom(docs, cap = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"star pairs diverged: got $got expected $expected")
    // identical docs: every surviving pair confirms at est_jaccard 1.0
    val est = Extensions.minhashPairsFrom(docs, cap = 2)
      .select("est_jaccard").distinct().collect().map(_.getDouble(0)).toSet
    assert(est == Set(1.0))
    Extensions.releaseCaches()
  }

  test("HybridPerSide binds: both towers cap at exactly PerSide when candidates exceed it") {
    // 40 corpus vectors all relevant to the query on both towers:
    // dense (every cosine defined) and sparse (every doc shares the
    // query's token). Each tower must keep EXACTLY HybridPerSide rows
    // per query; dense survivors recomputed independently.
    val ps = Extensions.HybridPerSide
    val rnd = new scala.util.Random(23)
    val vecs = (1L to 40L).map(i => i -> Array.fill(64)(rnd.nextGaussian())).toMap
    val emb = vecs.toSeq.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(aggregate(zip_with(col("v"), col("v"), _ * _),
        lit(0.0), _ + _)))
    val qid = 1L
    val q = emb.filter(col("vec_id") === qid)
      .select(col("vec_id").as("query_id"), lit("shared token text").as("qtext"),
        col("v").as("qv"), col("nrm").as("qn"))
    val dense = Extensions.hybridDenseExact(emb, q).collect()
    assert(dense.length == ps, s"dense tower must cap at $ps, got ${dense.length}")
    assert(dense.map(_.getInt(2)).sorted.toSeq == (1 to ps))
    // survivors = top-PerSide by (round(cos,6) desc, doc_id asc), self excluded
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / math.sqrt(na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = vecs.keys.filter(_ != qid).toSeq
      .sortBy(id => (-cos(vecs(qid), vecs(id)), id)).take(ps).toSet
    assert(dense.map(_.getLong(1)).toSet == expect,
      "dense survivors must be the exact top-PerSide by (cos desc, id asc)")
    // sparse: every doc contains the query token -> 39 candidates > cap
    val docs = (1L to 40L).map(i => (i, s"shared filler$i token"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet("target/tmp-hybcap/documents.parquet")
    val sparse = Extensions.hybridSparseTop(spark, "target/tmp-hybcap", q).collect()
    assert(sparse.length == ps, s"sparse tower must cap at $ps, got ${sparse.length}")
    assert(sparse.map(_.getInt(2)).sorted.toSeq == (1 to ps))
    assert(!sparse.map(_.getLong(1)).contains(qid), "self must be excluded")
    Extensions.releaseCaches()
  }

  test("PQ rerank depth binds: the exact rerank only sees the ADC-top-R pool") {
    // 60 vectors, rerank=5 << corpus: the final top-k must equal the
    // independent recompute (ADC-top-5 pool by the frozen codebook,
    // then exact-cosine ordering INSIDE the pool) — and that pool must
    // genuinely alter the result vs an unbounded rerank for at least
    // one query, or the cap isn't binding.
    val rr = 5
    val rnd = new scala.util.Random(29)
    val vecs = (1L to 60L).map(i => i -> Array.fill(64)(rnd.nextGaussian())).toMap
    val emb = vecs.toSeq.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val queries = Seq(3L, 17L)
    val qdf = queries.toDF("vec_id")
    val cbs = Extensions.pqCodebooks(emb)
    val m = cbs.length; val ds = cbs(0)(0).length
    def nvOf(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    // codes per the frozen model: argmax sub-dot, FIRST index on ties
    val codes = vecs.map { case (id, v) =>
      val nv = nvOf(v)
      id -> Array.tabulate(m) { mi =>
        val sub = nv.slice(mi * ds, mi * ds + ds)
        val dots = cbs(mi).map(cw => dot(sub, cw))
        dots.indexOf(dots.max)
      }
    }
    def expectTopK(q: Long, pool: Int, k: Int): Seq[Long] = {
      val qnv = nvOf(vecs(q))
      val lut = Array.tabulate(m)(mi => {
        val sub = qnv.slice(mi * ds, mi * ds + ds)
        cbs(mi).map(cw => dot(sub, cw))
      })
      val adcPool = vecs.keys.filter(_ != q).toSeq
        .sortBy(id => (-r6((0 until m).map(mi => lut(mi)(codes(id)(mi))).sum), id))
        .take(pool)
      adcPool.sortBy(id => (-r6(dot(qnv, nvOf(vecs(id)))), id)).take(k)
    }
    val got = Extensions.pqTopK(emb, qdf, k = rr, rerank = rr)
      .orderBy("query_id", "rank").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
      }
    queries.foreach { q =>
      assert(got(q) == expectTopK(q, rr, rr),
        s"query $q: rerank pool not the ADC-top-$rr set")
    }
    // the cap must BIND: an unbounded pool gives a different answer
    // for at least one query on this seed
    val unbounded = queries.map(q => expectTopK(q, vecs.size, rr))
    assert(queries.zip(unbounded).exists { case (q, u) => got(q) != u },
      "rerank cap did not alter any result: not binding on this corpus")
  }

  test("kNN K binds: exactly AnnK tied neighbors are voted, lowest ids win") {
    // all 30 vectors IDENTICAL: every neighbor ties at cos 1.0, so the
    // audit's window must keep exactly AnnK rows per query by the
    // documented (cos desc, vec_id asc) order — the K lowest ids
    // excluding self. Votes recomputed independently per query.
    val k = Extensions.AnnK
    val n = 30
    val v = Array.tabulate(64)(j => math.cos(j + 1.0)).toSeq
    val emb = (1L to n.toLong).map(i => (i, if (i <= 15) "a" else "b", v))
      .toDF("vec_id", "label", "embedding")
    emb.write.mode("overwrite").parquet("target/tmp-knncap/embeddings.parquet")
    val got = Extensions.knnLabelAudit.fn(spark, "target/tmp-knncap").collect()
    assert(got.length == Extensions.AnnQueryCount,
      s"audit must cover the fixed query workload, got ${got.length}")
    // independent recompute: query set = AnnQueryCount hash-smallest ids
    val qids = Extensions.annQueryIds(
      graft.model.Tables.embeddings(spark, "target/tmp-knncap"))
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_.getLong(0)).toSet == qids)
    got.foreach { r =>
      val q = r.getLong(0)
      val neighbors = (1L to n.toLong).filter(_ != q).sorted.take(k)
      val va = neighbors.count(_ <= 15); val vb = k - va
      val (expLabel, expVotes) =
        if (va > vb) ("a", va) else if (vb > va) ("b", vb) else ("a", va)
      assert(r.getString(2) == expLabel && r.getLong(3) == expVotes.toLong,
        s"query $q: got (${r.getString(2)}, ${r.getLong(3)}), want ($expLabel, $expVotes)")
      val expPurity = BigDecimal(
        (if (r.getString(1) == "a") va else vb).toDouble / k)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(5) == expPurity, s"query $q purity")
    }
    Extensions.releaseCaches()
  }

  test("ivfpq cell cap binds: hash-ordered survivors per cell, batch rows intact") {
    // four IDENTICAL vectors → one IVF cell; the combined-index cap
    // must keep the `cap` smallest by (hash60(cell:corpus_id),
    // corpus_id) — the salted ordering, not natural id order
    val v = Array.tabulate(64)(i => if (i == 1) 1.0 else 0.0).toSeq
    val emb = Seq(101L, 202L, 303L, 404L).toDF("vec_id")
      .withColumn("v", typedLit(v))
    val cbs = Extensions.pqCodebooks(emb)
    val cs = Extensions.ivfCentroids(emb)
    val full = Extensions.ivfpqCellCodes(emb, cbs, cs, None).collect()
    assert(full.length == 4, "uncapped combined index must carry every vector")
    val cell = full.head.getInt(0)
    assert(full.forall(_.getInt(0) == cell), "identical vectors must share one cell")
    val order = emb.select(col("vec_id"),
        Scalars.hash60(concat_ws(":", lit(cell), col("vec_id").cast("string"))).as("h"))
      .orderBy("h", "vec_id").collect().map(_.getLong(0))
    assert(order.toSeq != Seq(101L, 202L, 303L, 404L),
      "planted ids hash in natural order; pick different ids")
    val capped1 = Extensions.ivfpqCellCodes(emb, cbs, cs, None, cellCap = 1)
      .collect().map(_.getLong(1))
    assert(capped1.toSeq == Seq(order.head),
      s"cap=1 survivor must be the hash-min ${order.head}, got ${capped1.toSeq}")
    val capped2 = Extensions.ivfpqCellCodes(emb, cbs, cs, None, cellCap = 2)
      .collect().map(_.getLong(1)).toSet
    assert(capped2 == order.take(2).toSet,
      s"cap=2 survivors must be the two hash-smallest ${order.take(2).toSet}, got $capped2")
  }

  test("compaction re-cap binds: source-blind hash-ordered survivors; idempotent fold") {
    // the E45/E48/E50 fold must pick survivors from base ∪ batch
    // JOINTLY by the salted order (a later batch row can displace a
    // base row — the fold is source-blind by construction) and
    // re-applying it must be a no-op. The relative cap carries a 4096
    // absolute floor, so binding needs a >4096-row cell — never seen
    // at driver SFs, which is why this branch gets direct coverage
    val merged = spark.range(5000).select(lit(7).as("cell"),
      col("id").as("corpus_id"), array(lit(0), lit(1)).as("code"))
    val recapped = Extensions.recapCellCodes(merged, nCells = 16)
    val got = recapped.collect().map(_.getLong(1)).toSet
    assert(got.size == 4096,
      s"the 4096 cap floor must bind on a 5000-row cell, kept ${got.size}")
    val expected = merged.select(col("corpus_id"),
        Scalars.hash60(concat_ws(":", col("cell"),
          col("corpus_id").cast("string"))).as("h"))
      .orderBy("h", "corpus_id").limit(4096).collect().map(_.getLong(0)).toSet
    assert(got == expected,
      "survivors must be the 4096 salted-hash-smallest over the MERGED rows")
    val again = Extensions.recapCellCodes(recapped, nCells = 16)
    assert(again.exceptAll(recapped).count() == 0 &&
      recapped.exceptAll(again).count() == 0,
      "the fold must be idempotent on its own output")
  }

  test("compaction re-cap derives the cap from the UNCAPPED logical rows when supplied") {
    // round-10 ADVICE: merged.count() re-derives the cap from a base
    // that was already capped, so repeated arrive→compact cycles could
    // ratchet the cap below the monolithic build's. With the true
    // ingested-row count supplied, the cap matches what a monolithic
    // build over the same logical rows would have resolved.
    val merged = spark.range(5000).select(lit(3).as("cell"),
      col("id").as("corpus_id"), array(lit(0), lit(1)).as("code"))
    // nCells=9: merged-count cap = max(4096, 8·5000/9) = 4444 → binds
    val fromMerged = Extensions.recapCellCodes(merged, nCells = 9).count()
    assert(fromMerged == 4444L,
      s"merged-count cap must keep 4444 rows, kept $fromMerged")
    // the same fold told the true logical total (9000 ingested rows —
    // as if 4000 base rows had been capped away upstream) must resolve
    // cap = 8·9000/9 = 8000 and keep everything
    val fromTotal = Extensions.recapCellCodes(merged, nCells = 9,
      totalRows = Some(9000L)).count()
    assert(fromTotal == 5000L,
      s"uncapped-total cap must keep all 5000 rows, kept $fromTotal")
  }

  test("ivfpq nProbe binds: candidates come only from the probed cells") {
    // four orthogonal clusters, ids interleaved so the 4 seed vectors
    // cover all clusters and Lloyd separates them. With nProbe=1 and
    // k > cluster size, the result MUST stop at the probed cell's
    // membership (minus self) — members of unprobed cells are excluded
    // even though k has room; nProbe=nCells restores the full top-k.
    val rnd = new scala.util.Random(31)
    def member(cluster: Int): Array[Double] = {
      val a = Array.fill(64)(0.02 * rnd.nextGaussian())
      a(16 * cluster) += 1.0; a
    }
    val rows = (0 until 40).map(i => (i.toLong + 1L, member(i % 4).toSeq))
    val emb = rows.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val cs = Extensions.ivfCentroids(emb, nCells = 4)
    assert(cs.length == 4)
    // the index's OWN cell assignment, and the query's nearest cell
    val cellOf = Extensions.ivfEncodeWithError(emb, cs).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cellOf.values.toSet.size == 4, "Lloyd failed to separate the clusters")
    val qid = 1L
    val routed = Extensions.ivfpqTopK(emb, Seq(qid).toDF("vec_id"),
        k = 20, nProbe = 1, rerank = 100, nCells = 4)
      .collect().map(_.getLong(1))
    val probedCell = cellOf(qid) // query sits at its cluster's core
    val probedMembers = cellOf.filter(_._2 == probedCell).keySet - qid
    assert(routed.toSet.subsetOf(probedMembers),
      s"nProbe=1 leaked candidates outside cell $probedCell: ${routed.toSet -- probedMembers}")
    assert(routed.length == probedMembers.size,
      s"nProbe=1 must return the whole probed cell (${probedMembers.size}), got ${routed.length}")
    assert(routed.length < 20, "cap must bind: probed cell smaller than k")
    val all = Extensions.ivfpqTopK(emb, Seq(qid).toDF("vec_id"),
        k = 20, nProbe = 4, rerank = 100, nCells = 4)
      .collect().map(_.getLong(1))
    assert(all.length == 20, s"nProbe=nCells must fill k, got ${all.length}")
  }

  test("incremental index cap=1 keeps exactly the xxhash-min doc per bucket") {
    val txt = "incremental corpus planted duplicate text shared by every corpus document"
    val corpus = Seq(7L, 8L, 9L).map(id => (id, txt)).toDF("doc_id", "text")
    val sig = Extensions.minhashSignatures(corpus)
    val w = Window.partitionBy(col("band"), col("bk"))
      .orderBy(xxhash64(col("band"), col("bk"), col("doc_id")), col("doc_id"))
    val expected = Extensions.minhashBanded(sig)
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select("band", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    val got = Extensions.cappedBandIndex(sig, cap = 1)
      .select("band", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == expected)
    // one survivor per (band, bk): identical docs share every bucket,
    // so the index must shrink to exactly one row per band
    assert(got.size == Extensions.cappedBandIndex(sig, cap = 1)
      .select("band", "bk").distinct().count())
    Extensions.releaseCaches()
  }

  test("IMI odd-dim lock: dim-63 tail component decides assignment; imi == imipq routing end-to-end") {
    // Locks the round-10 odd-dimension fix (`size(nv) - hd` tail
    // slices in imiHalves, imipqEncodeAssign, and imipqTopK's query
    // side): at dim 63 the halves split 31/32, and a regression back
    // to a floor(dim/2)-length tail slice drops the LAST component
    // from assignment and routing. The plant makes that component
    // DECISIVE, not tie-breaking: every vector's h1 carries a weak
    // +0.3 on its first h1 dim (dim 31) and a strong ±1 on its last
    // dim (dim 62); the half-1 centroids are e_dim31 and e_dim62, so
    // the full dot picks the cell by the ±1 tail while a truncated
    // slice would flip every +1 vector to the weak-signal cell.
    // Cells matching the full-63-dim argmax reference is exactly the
    // "half dots sum to the full dot" invariant: the halves the code
    // sliced must concatenate back to the whole vector.
    val dim = 63
    val hd = dim / 2 // 31; tail half carries dim - hd = 32 components
    def vec(jit: Double, s: Double): Seq[Double] =
      Seq.tabulate(dim) {
        case 0 => 1.0
        case 1 => jit
        case 31 => 0.3
        case 62 => s
        case _ => 0.0
      }
    // group A (+1 tail) → half-1 cell 1; group B (−1 tail) → cell 0
    val rows = Seq(
      (1L, vec(0.01, 1.0)), (2L, vec(0.02, 1.0)), (3L, vec(0.03, 1.0)),
      (4L, vec(0.01, -1.0)), (5L, vec(0.02, -1.0)), (6L, vec(0.03, -1.0)))
    val emb = rows.toDF("vec_id", "v")
    def unit(i: Int, d: Int): Array[Double] =
      Array.tabulate(d)(j => if (j == i) 1.0 else 0.0)
    val cs0 = Array(unit(0, hd), unit(1, hd))            // all pick c0 = 0
    val cs1 = Array(unit(0, dim - hd), unit(31, dim - hd)) // e_dim31, e_dim62
    // reference: argmax dot over the FULL 63-dim vector halves
    // (normalization rescales both dots equally — argmax invariant)
    def refCell(v: Seq[Double]): Int = {
      def am(h: Seq[Double], cs: Array[Array[Double]]): Int =
        cs.map(c => h.zip(c).map { case (a, b) => a * b }.sum)
          .zipWithIndex.maxBy { case (d, i) => (d, -i) }._2
      am(v.take(hd), cs0) * cs1.length + am(v.drop(hd), cs1)
    }
    val expected = rows.map { case (id, v) => id -> refCell(v) }.toMap
    assert(expected.values.toSet == Set(0, 1),
      "plant must separate the groups for the lock to bite")

    val imiCells = Extensions.imiCellTable(emb, cs0, cs1, None)
      .select("corpus_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(imiCells == expected,
      s"imiCellTable dropped or misread the dim-63 tail: $imiCells vs $expected")

    val cbs = Extensions.pqCodebooks(emb, m = 7, kw = 4) // 63 = 7 × 9
    val encCells = Extensions.imipqEncodeAssign(emb, cbs, cs0, cs1)
      .select("corpus_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(encCells == expected,
      s"imipqEncodeAssign diverged from imiCellTable on odd dims: $encCells")

    // end-to-end query routing (imipqTopK's own inline slice): with
    // nProbe=1/probeA=1 a group-A query probes exactly its own product
    // cell — a truncated query slice would route it to the group-B
    // cell and return only group-B neighbors
    val hits = Extensions.imipqTopK(emb,
        Seq(1L).toDF("vec_id"), k = 2, kPerHalf = 2,
        nProbe = 1, probeA = 1, rerank = 4,
        cbs0 = Some(cbs), csH0 = Some(cs0), csH1 = Some(cs1))
      .select("corpus_id").collect().map(_.getLong(0)).toSet
    assert(hits.nonEmpty && hits.subsetOf(Set(2L, 3L)),
      s"odd-dim query routing left group A: probed the wrong cell ($hits)")
    Extensions.releaseCaches()
  }
}
