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
}
