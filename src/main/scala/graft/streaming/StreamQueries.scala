package graft.streaming

import org.apache.spark.sql.functions._

import graft.Q
import graft.model.Tables
import graft.pipeline.{StreamingSync, SyncJob}
import graft.sink.{TransportStatus, UpsertRecord, UpsertTransport}

/** Registered STREAMING queries — bounded end-to-end runs of the
  * Structured Streaming surfaces, so the per-round bench trend covers
  * the foreachBatch lifecycle, not just the batch operators. (The
  * unbounded forms live in [[EventStreams]] / [[graft.pipeline.StreamingSync]]
  * and are spec-tested; a registered query must terminate.)
  */
object StreamQueries {

  /** Deterministic loopback transport: every record succeeds as
    * "created" with an id derived from its natural key. Everything on
    * the Spark side of the wire — batch-50 grouping, the retry
    * wrapper, the durable results parquet, id-map merge, DLQ + ledger
    * appends — runs for real; only the HTTP socket is stubbed, so the
    * timing the bench records is the engine's own lifecycle cost. */
  private final class LoopbackTransport extends UpsertTransport {
    override def send(objectType: String,
                      batch: Seq[UpsertRecord]): Seq[TransportStatus] =
      batch.map(r => TransportStatus(200, Some("hs-" + r.naturalKey), ""))
  }

  /** End-to-end StreamingSync micro-batch run over the orders table
    * read as a file-source stream (the nightly reverse-ETL batch,
    * lifted to foreachBatch — reference README.md:98). Fresh temp
    * control/checkpoint dirs per invocation keep runs independent;
    * the injected clock keeps run ids deterministic. Returns the
    * ledger rolled up by (job_type, status) — row content is a pure
    * function of the input table, so the driver's rows-only check is
    * stable run to run. */
  val streamSyncMicrobatch: Q = Q("stream_sync_microbatch",
    (spark, sfDir) => {
      val base = java.nio.file.Files.createTempDirectory("graft-sbench-")
      // the returned frame lazily reads the ledger under `base`, so the
      // tree must outlive this call — reclaim it at JVM exit instead
      // (bench/verify/spec runs would otherwise leave one full sync
      // output per invocation in /tmp)
      sys.addShutdownHook {
        try org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
        catch { case _: Exception => () }
      }
      val ctl = s"$base/ctl"
      val ckpt = s"$base/ckpt"
      val batchSchema = Tables.orders(spark, sfDir).schema
      // the table is a single parquet FILE and the file-stream source
      // only accepts directories — expose it through a temp dir of
      // symlinks (zero copy; also where a multi-file table would
      // naturally split into multiple micro-batches)
      val in = java.nio.file.Files.createDirectory(base.resolve("in"))
      java.nio.file.Files.createSymbolicLink(
        in.resolve("orders.parquet"),
        java.nio.file.Paths.get(Tables.path(sfDir, "orders")))
      val src = spark.readStream.schema(batchSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in.toString)
      val stream = src.select(
        col("o_orderkey").cast("string").as("natural_key"),
        // parquet writes the date as TIMESTAMP(isAdjustedToUTC=false) →
        // Spark 4 reads TIMESTAMP_NTZ; SyncJob's watermark agg expects
        // an instant-typed column (java.sql.Timestamp externally)
        col("o_orderdate").cast("timestamp").as("updated_at"),
        map(lit("status"), col("o_orderstatus"),
          lit("total"), col("o_totalprice").cast("string")).as("props"))
      val cfg = SyncJob.Config("orders_stream", "deals", nowMs = 1750000000000L)
      val q = StreamingSync.start(spark, stream, cfg, ctl,
        new LoopbackTransport, ckpt)
      try q.processAllAvailable() finally q.stop()
      // an EMPTY source table fires zero micro-batches, so foreachBatch
      // never runs and no ledger exists — a normal input, not an error:
      // roll up an empty ledger of the same schema instead of failing
      // the read
      val ledgerPath = new org.apache.hadoop.fs.Path(s"$ctl/ledger")
      val fs = ledgerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val ledger =
        if (fs.exists(ledgerPath)) spark.read.parquet(s"$ctl/ledger")
        else {
          import org.apache.spark.sql.types._
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq(StructField("job_type", StringType),
              StructField("status", StringType),
              StructField("read_count", LongType),
              StructField("created_count", LongType),
              StructField("error_count", LongType))))
        }
      ledger
        .groupBy("job_type", "status")
        .agg(count(lit(1)).as("n_batches"),
          sum("read_count").cast("long").as("rows_read"),
          sum("created_count").cast("long").as("rows_created"),
          sum("error_count").cast("long").as("rows_failed"))
        .orderBy("job_type", "status")
    },
    None)

  val all: Seq[Q] = Seq(streamSyncMicrobatch)
}
