package graft

import org.apache.spark.sql.functions._
import graft.ext.Extensions

/** Adversarial FORMULA tests for the pre-round-10 numeric operators —
  * DESIGN.md's round-10 lesson applied: an equality-to-twin test
  * verifies the TRANSLATION (Spark vs DuckDB computing the same
  * thing), not the FORMULA (that the thing computed is the paper's).
  * Each case here is constructed FROM the source formula's edge
  * semantics and recomputed in plain Scala from the paper's
  * definition, never from the implementation's own expressions.
  * (The MMR 0-clamp bug both engines agreed on is the motivating
  * counterexample — see DESIGN.md round 10, part 10.)
  */
class FormulaEdgeSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String, rows: Seq[(Long, String, String, String)]): String = {
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("KL divergence: identical distributions give exactly 0; asymmetric case matches Σ p·ln(p/q)") {
    // Gibbs' inequality edge: KL(p‖q) = 0 iff p = q. Two sources with
    // IDENTICAL empirical distributions make every p_source equal
    // p_corpus, so both rows must report exactly 0.0 — any smoothing,
    // off-by-one in the totals, or q-side mixup shows up as a nonzero.
    val dirEq = writeDocs("target/tmp-kleq",
      Seq((1L, "aa aa bb", "en", "A"), (2L, "aa aa bb", "en", "B")))
    val eq = Extensions.domainKl.fn(spark, dirEq).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(eq == Map("A" -> 0.0, "B" -> 0.0),
      s"identical source/corpus distributions must give KL exactly 0, got $eq")

    // asymmetric case, recomputed from the definition KL = Σ_t
    // p(t)·ln(p(t)/q(t)) with p the source MLE and q the corpus MLE:
    // A = {aa:2, bb:1}, B = {aa:1, bb:2, cc:1} → corpus {aa:3, bb:3, cc:1}
    val dir = writeDocs("target/tmp-klasym",
      Seq((1L, "aa aa bb", "en", "A"), (2L, "aa bb bb cc", "en", "B")))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val q = Map("aa" -> 3.0 / 7, "bb" -> 3.0 / 7, "cc" -> 1.0 / 7)
    def kl(p: Map[String, Double]): Double =
      p.map { case (t, pt) => pt * math.log(pt / q(t)) }.sum
    val expA = r6(kl(Map("aa" -> 2.0 / 3, "bb" -> 1.0 / 3)))
    val expB = r6(kl(Map("aa" -> 1.0 / 4, "bb" -> 2.0 / 4, "cc" -> 1.0 / 4)))
    val got = Extensions.domainKl.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("A") == expA && got("B") == expB,
      s"KL diverged from the hand formula: got $got, want A=$expA B=$expB")
    // and Gibbs: both strictly positive (p ≠ q here)
    assert(got("A") > 0 && got("B") > 0)
  }

  test("DSIR: absent-from-target features stay finite via add-one smoothing and rank strictly last") {
    // Xie et al. 2023 edge: a document whose hashed features never
    // occur in the target domain. Unsmoothed, ln p̂_target = ln 0 =
    // -∞; the paper's add-one smoothing over the B buckets must keep
    // the weight finite AND strictly below any document sharing the
    // target's features. Expected weights recomputed from the paper's
    // smoothed ratio avg[ln((ct+1)/(tt+B)) − ln((cr+1)/(tr+B))]
    // (feature extraction — the hash — is input prep, not the formula
    // under test, so reusing hash60 for it is fair).
    val docs = Seq(
      (1L, "aa aa bb", "en", "s"),   // the target slice
      (2L, "aa aa bb", "xx", "s"),   // same features as the target
      (3L, "zz zz zz", "xx", "s"))   // features absent from the target
    val dir = writeDocs("target/tmp-dsir", docs)
    val B = Extensions.DsirBuckets
    def feat(t: String): Long = {
      val h = Seq(t).toDF("t")
        .select(pmod(graft.expr.Scalars.hash60(col("t")), lit(B.toLong)))
        .collect()(0).getLong(0)
      h
    }
    val toks = docs.flatMap { case (id, text, lang, _) =>
      text.split(" ").map(t => (id, feat(t), lang))
    }
    val cr = toks.groupBy(_._2).map { case (f, xs) => f -> xs.size.toDouble }
    val ct = toks.filter(_._3 == "en").groupBy(_._2)
      .map { case (f, xs) => f -> xs.size.toDouble }
    val (tr, tt) = (cr.values.sum, ct.values.sum)
    def lr(f: Long): Double =
      math.log((ct.getOrElse(f, 0.0) + 1.0) / (tt + B)) -
        math.log((cr(f) + 1.0) / (tr + B))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = docs.map { case (id, text, _, _) =>
      id -> r4(text.split(" ").map(t => lr(feat(t))).sum / text.split(" ").length)
    }.toMap
    val got = Extensions.importanceResample.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == expected,
      s"DSIR weights diverged from the paper's smoothed formula: got $got want $expected")
    assert(!got.values.exists(_.isInfinite),
      "absent-from-target features must stay finite under add-one smoothing")
    assert(got(3L) < got(2L) && got(3L) < got(1L),
      "the all-absent-features doc must rank strictly below target-like docs")
    assert(got(1L) == got(2L),
      "identical feature bags must weigh identically regardless of language")
  }

  test("HITS: 2-iteration scores equal the hand-run A·Aᵀ recurrence; dense component absorbs mass") {
    // Kleinberg's mutual reinforcement, hand-run from the definition
    // (auth ← Σ hubs of in-neighbors, hub ← Σ auths of out-neighbors,
    // ONE L1 normalization at the end): edges s1→{c1,c2}, s2→{c1},
    // s3→{c3}. Raw after 2 iterations: hubs (8, 5, 1), auths
    // (5, 3, 1). The edge semantic: the isolated s3–c3 pair starts
    // with 1/3 of the hub mass and decays to 1/14 — mass concentrates
    // in the denser component, the core HITS claim a plain degree
    // count would not reproduce (s2 and s3 have equal out-degree yet
    // 5/14 vs 1/14).
    val dir = "target/tmp-hits"
    Seq((1L, 11L), (2L, 11L), (3L, 12L), (4L, 13L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 21L), (2L, 22L), (3L, 21L), (4L, 23L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // edges: s11→{c21,c22}, s12→{c21}, s13→{c23}
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = Map(
      ("s", 11L) -> r6(8.0 / 14), ("s", 12L) -> r6(5.0 / 14),
      ("s", 13L) -> r6(1.0 / 14),
      ("c", 21L) -> r6(5.0 / 9), ("c", 22L) -> r6(3.0 / 9),
      ("c", 23L) -> r6(1.0 / 9))
    val got = Extensions.hits.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == expected, s"HITS diverged from the hand-run recurrence: $got")
    Extensions.releaseCaches()
  }

  test("NB classifier: log-odds match the hand formula; the prior flips a positive-evidence doc") {
    // Multinomial NB with add-one smoothing (Brown et al. 2020 §A
    // shape): log_odds = Σ_t tf·[ln((c_pos+1)/(tot_pos+V)) −
    // ln((c_neg+1)/(tot_neg+V))] + ln((n_pos+1)/(n_neg+1)). The edge
    // the equality twin cannot see: a doc whose token evidence s is
    // POSITIVE but whose log-odds sign flips at the class prior —
    // getting the prior's placement (outside the per-token sum, doc-
    // counted not token-counted, add-one clamped) wrong would misflag
    // exactly this doc. Weak labels derive from the quality heuristic
    // (input prep, not the formula under test).
    val longGood = (1 to 25).map(_ => "the good data helps").mkString(" ")
    val docs = Seq(
      (1L, longGood, "en", "s"),          // high quality → y=1
      (2L, "good good good z1", "xx", "s"), // the flip candidate: 3×
      // positive-evidence "good" barely outweighs the one neg-only
      // token (s ≈ +0.05), and the ln(2/5) prior flips the sign
      (3L, "z2 z3 z4 !!! ###", "xx", "s"),
      (4L, "z2 z4 z5 %%% @@@", "xx", "s"),
      (5L, "z3 z5 z2 ^^^ &&&", "xx", "s"))
    val dir = writeDocs("target/tmp-nbprior", docs)
    // weak labels via the heuristic (the classifier's INPUT)
    val y = docs.map { case (id, text, _, _) =>
      id -> (if (Seq(text).toDF("text")
        .select((Extensions.qualityExpr(col("text")) >= 0.6).cast("long"))
        .collect()(0).getLong(0) == 1L) 1 else 0)
    }.toMap
    assert(y(1L) == 1 && (2L to 5L).forall(i => y(i) == 0),
      s"planted quality labels drifted: $y — rebuild the corpus")
    // hand NB from the formula
    def toks(t: String) = t.toLowerCase.trim.split("\\s+").toSeq
    val byClass = docs.flatMap { case (id, text, _, _) =>
      toks(text).map(t => (t, y(id)))
    }
    val vocab = byClass.map(_._1).distinct
    val cPos = vocab.map(t => t -> byClass.count(x => x == (t, 1)).toDouble).toMap
    val cNeg = vocab.map(t => t -> byClass.count(x => x == (t, 0)).toDouble).toMap
    val (totPos, totNeg, v) = (cPos.values.sum, cNeg.values.sum, vocab.size.toDouble)
    def llr(t: String) = math.log((cPos(t) + 1) / (totPos + v)) -
      math.log((cNeg(t) + 1) / (totNeg + v))
    val (nPos, nNeg) = (y.values.count(_ == 1).toDouble, y.values.count(_ == 0).toDouble)
    val prior = math.log((nPos + 1) / (nNeg + 1))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s2 = toks(docs(1)._2).map(llr).sum
    assert(s2 > 0 && r4(s2 + prior) < 0,
      f"flip premise broke: doc 2 evidence s=$s2%.4f prior=$prior%.4f — rebuild the corpus")
    val expected = docs.map { case (id, text, _, _) =>
      id -> r4(toks(text).map(llr).sum + prior)
    }.toMap
    val got = Extensions.qualityClassifier.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getLong(3)))).toMap
    expected.foreach { case (id, exp) =>
      assert(got(id)._1 == exp,
        s"doc $id log-odds ${got(id)._1} != hand formula $exp")
    }
    assert(got(2L)._2 == 0L,
      "the prior-flipped doc must be NB-labeled 0 despite positive token evidence")
  }
}
