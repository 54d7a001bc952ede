package graft

import org.apache.spark.sql.functions._
import graft.pipeline.SyncJob

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("joinTiered: tier precedence id > chart > email") {
    val df = ops.Relational.joinTiered.fn(spark, sf0001)
    val byTier = df.groupBy("tier").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // every tier must actually occur in the fixture, or the test is vacuous
    assert(byTier.keySet == Set(0, 1, 2, 3), s"tiers seen: $byTier")
    // a row with a tier-1 hit must carry the tier-1 id (HS- prefix)
    val t1 = df.filter(col("tier") === 1).select("hubspot_id").collect()
    assert(t1.nonEmpty && t1.forall(_.getString(0).startsWith("HS-")))
    // tier-2 ids come from the chart-keyed entries (HSC- prefix)
    val t2 = df.filter(col("tier") === 2).select("hubspot_id").collect()
    assert(t2.nonEmpty && t2.forall(_.getString(0).startsWith("HSC-")))
  }

  test("joinEmailAmbiguity: all three branches occur; ambiguous has no id") {
    // duplicate fixture emails need custkey pairs 194 apart -> sf0.01
    val df = ops.Relational.joinEmailAmbiguity.fn(spark, "/root/testdata/sf0.01")
    val branches = df.select("branch").distinct().collect().map(_.getString(0)).toSet
    assert(branches == Set("matched", "ambiguous", "nomatch"), s"got $branches")
    assert(df.filter(col("branch") === "ambiguous" && col("matched_id").isNotNull).count() == 0)
    assert(df.filter(col("branch") === "matched" && col("matched_id").isNull).count() == 0)
  }

  test("mergeIdMap is last-writer-wins and idempotent (J5 property)") {
    val old = Seq(
      ("contacts", "k1", "OLD-1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      ("contacts", "k2", "OLD-2", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("hubspot_object_type", "natural_key", "hubspot_id", "updated_at")
    val upd = Seq(
      ("contacts", "k1", "NEW-1", java.sql.Timestamp.valueOf("2024-06-01 00:00:00")),
      ("contacts", "k3", "NEW-3", java.sql.Timestamp.valueOf("2024-06-01 00:00:00")))
      .toDF("hubspot_object_type", "natural_key", "hubspot_id", "updated_at")
    val once = SyncJob.mergeIdMap(old, upd)
    val got = once.collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(got == Map("k1" -> "NEW-1", "k2" -> "OLD-2", "k3" -> "NEW-3"))
    // applying the same batch again must not change anything
    val twice = SyncJob.mergeIdMap(once, upd)
    assert(twice.collect().map(r => r.getString(1) -> r.getString(2)).toMap == got)
    // older update must NOT win
    val stale = Seq(("contacts", "k1", "STALE", java.sql.Timestamp.valueOf("2023-01-01 00:00:00")))
      .toDF("hubspot_object_type", "natural_key", "hubspot_id", "updated_at")
    val after = SyncJob.mergeIdMap(once, stale)
    assert(after.filter(col("natural_key") === "k1").collect()(0).getString(2) == "NEW-1")
  }

  test("projectLocked: locked rows null out protected fields (F5)") {
    val df = ops.Relational.projectLocked.fn(spark, sf0001)
    assert(df.filter(col("locked") && col("patient_id_out").isNotNull).count() == 0)
    assert(df.filter(col("locked")).count() > 0) // matrix actually exercised
    assert(df.filter(!col("locked") && col("patient_id_out").isNotNull).count() > 0)
  }

  test("joinAntiOrphans ∪ matched = all rois (J6 partition property)") {
    val rois = model.Fixtures.rois(spark, sf0001)
    val orphans = ops.Relational.joinAntiOrphans.fn(spark, sf0001)
    val pk = model.Fixtures.patients(spark, sf0001)
      .filter(col("patient_id").isNotNull).select("patient_id")
    val matched = rois.join(pk, rois("roi_patient_id") === pk("patient_id"), "left_semi")
    assert(orphans.count() + matched.count() == rois.count())
  }

  test("watermark read picks latest successful run only (A1)") {
    val ledger = Seq(
      ("r1", ts("2024-01-01 01:00:00"), ts("2024-01-01 02:00:00"), "patients", ts("2024-01-01 00:00:00"), "success"),
      ("r2", ts("2024-01-02 01:00:00"), ts("2024-01-02 02:00:00"), "patients", ts("2024-01-02 00:00:00"), "failed"),
      ("r3", ts("2024-01-03 01:00:00"), ts("2024-01-03 02:00:00"), "rois", ts("2024-01-03 00:00:00"), "success"))
      .toDF("run_id", "started_at", "finished_at", "job_type", "high_watermark", "status")
    val wm = SyncJob.readHighWatermark(ledger, "patients")
    assert(wm.contains(ts("2024-01-01 00:00:00"))) // not the failed r2, not the rois r3
    assert(SyncJob.readHighWatermark(ledger.filter(col("status") === "nope"), "patients").isEmpty)
  }

  test("scd2 history: intervals tile exactly, one current row per user") {
    val df = ops.Relational.windowScd2History.fn(spark, sf0001).cache()
    // exactly one open-ended (current) version per user
    val cur = df.filter(col("is_current")).groupBy("user_id").count()
    assert(cur.collect().forall(_.getLong(1) == 1))
    // valid_to of version k equals valid_from of version k+1 — no gaps,
    // no overlaps
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    val holes = df
      .withColumn("next_from", lead(col("valid_from_ms"), 1).over(w))
      .filter(col("next_from").isNotNull && col("valid_to_ms") =!= col("next_from"))
    assert(holes.count() == 0)
    // versions are dense from 1
    val dense = df.groupBy("user_id")
      .agg(min("version").as("lo"), max("version").as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n"))
    assert(dense.count() == 0)
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
}
