package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.{StreamingSync, SyncJob}

class StreamingSyncSpec extends SparkSpec {
  import spark.implicits._

  private case object Fixture {
    def row(k: String, ts: String) = (k, java.sql.Timestamp.valueOf(ts))
  }

  test("micro-batches run the full sync lifecycle; id map accumulates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val ctl = Files.createTempDirectory("graft-ss-ctl-").toString
    val ckpt = Files.createTempDirectory("graft-ss-ckpt-").toString
    val ms = MemoryStream[(String, java.sql.Timestamp)]
    val stream = ms.toDF().toDF("natural_key", "updated_at")
      .withColumn("props", map(lit("k"), lit("v")))
    val cfg = SyncJob.Config("patients", "contacts", nowMs = 1750000000000L)
    val q = StreamingSync.start(spark, stream, cfg, ctl, new StubTransport, ckpt)
    try {
      ms.addData(Fixture.row("A", "2024-01-01 00:00:00"),
        Fixture.row("B", "2024-01-02 00:00:00"))
      q.processAllAvailable()
      // batch 2: one update (A again) + one new + one OLDER-than-batch-1
      // row — streaming must NOT drop it (checkpoint owns progress, not
      // the updated_at watermark)
      ms.addData(Fixture.row("A", "2024-02-01 00:00:00"),
        Fixture.row("C", "2024-02-02 00:00:00"),
        Fixture.row("LATE", "2023-12-01 00:00:00"))
      q.processAllAvailable()
    } finally q.stop()

    val idMap = spark.read.parquet(s"$ctl/id_map")
    val ids = idMap.collect().map(r => r.getString(1)).toSet
    assert(ids == Set("A", "B", "C", "LATE")) // LATE survived
    // one row per key even though A was upserted twice
    assert(idMap.groupBy("natural_key").count().filter(col("count") > 1).count() == 0)

    val ledger = spark.read.parquet(s"$ctl/ledger").orderBy("run_id").collect()
    assert(ledger.length == 2) // one run row per micro-batch
    assert(ledger.map(_.getAs[String]("status")).forall(_ == "success"))
    val counts = ledger.map(r => r.getAs[Long]("read_count")).sorted
    assert(counts.sameElements(Array(2L, 3L)))
  }

  test("a crashed micro-batch fails the query — the checkpoint must not advance") {
    implicit val sqlCtx = spark.sqlContext
    val ctl = Files.createTempDirectory("graft-ss-ctl-").toString
    val ckpt = Files.createTempDirectory("graft-ss-ckpt-").toString
    val ms = MemoryStream[(String, java.sql.Timestamp)]
    val stream = ms.toDF().toDF("natural_key", "updated_at")
      .withColumn("props", map(lit("k"), lit("v")))
    val boom = new graft.sink.UpsertTransport {
      override def send(objectType: String, batch: Seq[graft.sink.UpsertRecord]) =
        throw new RuntimeException("connection pool exploded")
    }
    val cfg = SyncJob.Config("patients", "contacts", nowMs = 1750000000000L)
    val q = StreamingSync.start(spark, stream, cfg, ctl, boom, ckpt)
    try {
      ms.addData(Fixture.row("A", "2024-01-01 00:00:00"))
      // the crash must surface as a query failure (checkpoint held for
      // replay), NOT be swallowed as a completed batch
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(q.exception.isDefined)
    } finally q.stop()
    // the crash is still auditable: a failed ledger row was recorded
    val ledger = spark.read.parquet(s"$ctl/ledger")
    assert(ledger.filter(col("status") === "failed").count() >= 1)
  }
}
