package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the batch index-arrival contract (E35): documents
  * arrive on a stream, each micro-batch is tokenized ONCE (the same
  * postings scan `ext_bm25_incremental` pays per batch) and APPENDED
  * to the stored postings layout. Progress is checkpoint-owned —
  * exactly-once offsets per micro-batch — and the append itself is
  * made IDEMPOTENT against foreachBatch's at-least-once replay by
  * writing each batch to a deterministic `batch=<id>` partition with
  * overwrite semantics: a crash-replayed batch rewrites its own
  * partition byte-identically instead of double-appending (the same
  * discipline StreamingSync delegates to the id map). Readers take
  * `spark.read.parquet(indexDir)` — the merged postings table — and
  * feed it to bm25From exactly like the batch union does; at 100 TB
  * the partitioned layout doubles as the compaction unit.
  */
object IndexMaintenanceStream {

  /** One micro-batch's append: tokenize + write to the batch-keyed
    * partition. Exposed for the idempotence test — calling it twice
    * with the same batchId must leave the index unchanged. */
  def appendPostingsBatch(batch: DataFrame, indexDir: String,
                          batchId: Long): Unit =
    graft.ext.Extensions.postingsOf(batch)
      .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")

  /** Start the maintenance stream: `docs` must carry (doc_id, text). */
  def startPostingsAppend(docs: DataFrame, indexDir: String,
                          checkpointDir: String): StreamingQuery =
    docs.writeStream
      .queryName("graft-postings-append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) appendPostingsBatch(batch.toDF(), indexDir, batchId)
        ()
      }
      .start()

  /** The merged postings table the searches read — every appended
    * batch partition, batch column dropped. */
  def mergedPostings(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(indexDir).select("doc_id", "term", "tf", "dl")

  // ---------------------------------------------------------------------
  // The VECTOR-index twin (E43's streaming form): embeddings arrive on
  // a stream, each micro-batch is encoded + product-cell-assigned ONCE
  // against the FROZEN models (the same one-scan projection
  // ext_imipq_incremental pays per batch — imipqEncodeAssign) and
  // appended to the stored combined-index layout. Same idempotence
  // discipline: a deterministic batch=<id> partition with overwrite
  // semantics, so an at-least-once replay rewrites byte-identically.
  // Frozen models are exactly the contract's premise — retrain (the
  // drift rule) is a batch-side event that restarts the stream against
  // the new model fixtures and a fresh index dir.
  // ---------------------------------------------------------------------

  /** One micro-batch's append: encode+assign + write to the batch-keyed
    * partition. `batch` carries (vec_id, v). Exposed for the
    * idempotence test. */
  def appendImipqBatch(batch: DataFrame,
                       cbs: Array[Array[Array[Double]]],
                       cs0: Array[Array[Double]],
                       cs1: Array[Array[Double]],
                       indexDir: String, batchId: Long): Unit =
    graft.ext.Extensions.imipqEncodeAssign(batch, cbs, cs0, cs1)
      .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")

  /** Start the vector-index maintenance stream: `vecs` must carry
    * (vec_id, v) with v the embedding array. */
  def startImipqAppend(vecs: DataFrame,
                       cbs: Array[Array[Array[Double]]],
                       cs0: Array[Array[Double]],
                       cs1: Array[Array[Double]],
                       indexDir: String,
                       checkpointDir: String): StreamingQuery =
    vecs.writeStream
      .queryName("graft-imipq-append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty)
          appendImipqBatch(batch.toDF(), cbs, cs0, cs1, indexDir, batchId)
        ()
      }
      .start()

  /** The merged combined-index table the searches read (the `codes0`
    * input of imipqTopK), batch column dropped. */
  def mergedImipqCodes(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(indexDir).select("cell", "corpus_id", "code")
}
