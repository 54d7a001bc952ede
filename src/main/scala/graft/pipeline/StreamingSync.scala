package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sink.UpsertTransport

/** Continuous reverse-ETL: the reference's nightly batch (README.md:98)
  * lifted onto Structured Streaming via foreachBatch.
  *
  * Each micro-batch runs the SAME SyncJob lifecycle (match → batched
  * upsert → id-map merge → DLQ → ledger row), with two streaming-native
  * substitutions:
  *  - progress tracking: the stream's checkpoint replaces the ledger
  *    watermark (useWatermark=false) — offsets are exactly-once per
  *    batch, so re-filtering by updated_at would wrongly drop
  *    out-of-order rows that the source already deduplicated;
  *  - idempotency stays with the natural-key id map, which also absorbs
  *    foreachBatch's at-least-once replay after a crash (T3).
  *
  * The ledger gains one row per micro-batch (run_id = jobType-batchId),
  * preserving the reference's auditability.
  */
object StreamingSync {

  /** @param stream streaming DataFrame with the SyncJob source contract:
    *               natural_key, updated_at, props(map<string,string>) */
  def start(spark: SparkSession, stream: DataFrame, cfg: SyncJob.Config,
            controlDir: String, transport: UpsertTransport,
            checkpointDir: String): StreamingQuery = {
    val handler: (Dataset[Row], Long) => Unit = (batch, batchId) => {
      if (!batch.isEmpty) {
        val s = SyncJob.run(spark, batch,
          cfg.copy(nowMs = cfg.nowMs + batchId, useWatermark = false),
          controlDir, transport)
        // A "failed" status means run() caught a CRASH (nothing reached
        // the sink or DLQ) — swallowing it here would let foreachBatch
        // commit the checkpoint and lose the batch forever, since the
        // stream has no ledger watermark to re-read from. Fail the query
        // so the checkpoint holds and replay re-delivers the batch (T3:
        // the id map absorbs the duplicates). "partial" (HTTP-level
        // failures, recorded in the DLQ with retry counting) does NOT
        // fail the query — that is the DLQ's job.
        if (s.status == "failed")
          throw new IllegalStateException(
            s"micro-batch $batchId crashed (run ${s.runId}); failing the " +
              "query so the checkpoint does not advance past unprocessed data")
      }
      ()
    }
    stream.writeStream
      .queryName(s"graft-sync-${cfg.jobType}")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(handler)
      .start()
  }
}
