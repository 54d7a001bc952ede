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
    // ext_pagerank's graph comes from the transaction tables
    Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
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

  test("the FULL registry survives an all-empty dataset (every table zero rows)") {
    // schema-preserving empty copies of every sf0.001 table (limit(0)
    // keeps the exact parquet types, incl. events' TIMESTAMP(NANOS))
    val allDir = "target/tmp-empty-all"
    val src = new java.io.File(sf0001)
    // events carries TIMESTAMP(NANOS), unreadable without the legacy
    // flag; the empty copy then holds a plain INT64 ts, which
    // Tables.events' LongType branch handles identically. The session
    // is shared across suites — restore the flag afterwards or every
    // later suite reads TIMESTAMP(NANOS) parquet as INT64.
    withNanosAsLong {
      for (f <- src.listFiles() if f.getName.endsWith(".parquet"))
        spark.read.parquet(f.getPath).limit(0)
          .write.mode("overwrite").parquet(s"$allDir/${f.getName}")
    }
    val failures = SparkEntry.registry.flatMap { q =>
      try { q.fn(spark, allDir).collect(); None }
      catch {
        case e: Throwable =>
          Some(s"${q.name}: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(120)}")
      } finally spark.sqlContext.clearCache()
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  private def withNanosAsLong[A](body: => A): A = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("the FULL registry survives a single-row dataset (n=1 edges: windows, averages, samples)") {
    // limit(1) copies: rows may not join across tables — the contract
    // here is crash-freedom on the n=1 degenerate shape, not output
    val oneDir = "target/tmp-one-all"
    withNanosAsLong {
      for (f <- new java.io.File(sf0001).listFiles() if f.getName.endsWith(".parquet"))
        spark.read.parquet(f.getPath).limit(1)
          .write.mode("overwrite").parquet(s"$oneDir/${f.getName}")
    }
    val failures = SparkEntry.registry.flatMap { q =>
      try { q.fn(spark, oneDir).collect(); None }
      catch {
        case e: Throwable =>
          Some(s"${q.name}: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(120)}")
      } finally spark.sqlContext.clearCache()
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
