package graft

import org.apache.spark.sql.functions._

/** Degenerate-input audit: every documents/embeddings extension query
  * must handle an EMPTY corpus — return zero (or a well-defined
  * handful of) rows, never throw. A library user hits this on day one
  * (an empty date partition, a fresh tenant); "works at 100 TB" also
  * means "works at 0 bytes". */
class EmptyCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "target/tmp-empty"

  private def writeEmpty(): Unit = {
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("every ext query survives an empty corpus") {
    writeEmpty()
    val failures = ext.Extensions.all.flatMap { q =>
      try {
        q.fn(spark, dir).collect() // rows may be 0 or a stats handful
        None
      } catch {
        case e: Throwable =>
          Some(s"${q.name}: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(120)}")
      } finally spark.sqlContext.clearCache()
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
