package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-applied readers/writers beyond parquet.
  *
  * The reference reads exactly one source (BigQuery SQL, main.py:534-549)
  * and writes JSON rows back (main.py:347-352). A user switching to this
  * library keeps the same data through whichever container format their
  * lake uses; these helpers pin an explicit schema so ingestion is
  * deterministic (no inference pass — at 100 TB a schema-inference scan
  * is a full extra read of the data).
  */
object Sources {

  /** CSV with explicit schema; malformed rows quarantined, not dropped
    * (the DLQ philosophy of the reference applied at ingest). */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true): DataFrame =
    spark.read
      .schema(addCorruptColumn(schema))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** JSON-lines with explicit schema (same quarantine contract). */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(addCorruptColumn(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  def orc(spark: SparkSession, path: String): DataFrame = spark.read.orc(path)

  val CorruptCol = "_corrupt_record"

  private def addCorruptColumn(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, org.apache.spark.sql.types.StringType, nullable = true)

  /** Split a permissive read into (clean, quarantined). */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val cached = df.cache()
    (cached.filter(col(CorruptCol).isNull).drop(CorruptCol),
     cached.filter(col(CorruptCol).isNotNull))
  }

  /** Align a (possibly drifted) frame to an expected schema — the
    * schema-on-read posture of the reference (`row.get(...)` tolerates
    * absence, main.py:560-604) made explicit for a data lake:
    *
    *  - expected columns missing from the data → added as typed nulls;
    *  - present columns → cast to the expected type (Spark rules;
    *    incompatible casts fail analysis loudly rather than corrupt);
    *  - unexpected extra columns → dropped (or kept with keepExtra).
    *
    * Output column order follows the expected schema, so unioning
    * across heterogeneous historical partitions just works. */
  def alignToSchema(df: DataFrame, expected: StructType,
                    keepExtra: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val present = df.schema.fieldNames.toSet
    val aligned = expected.fields.toSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    val extras =
      if (keepExtra)
        df.schema.fieldNames.toSeq.filterNot(expected.fieldNames.contains).map(col)
      else Seq.empty
    df.select(aligned ++ extras: _*)
  }

  /** Generic JDBC warehouse read — the reference's one true source is a
    * warehouse SQL query (BigQuery, main.py:534-549: `SELECT * FROM t
    * [WHERE updated >= @wm]`, all rows pulled to the client). This is
    * that source class re-expressed for Spark:
    *
    *  - the WHERE clause is NOT baked into a query string — it's a
    *    DataFrame `.filter`, and Spark's JDBC relation compiles it back
    *    to SQL on the database side (PushedFilters in the scan), so the
    *    warehouse ships only matching rows, same as the reference's
    *    parameterized query;
    *  - `partitionCol`/bounds split the read into `numPartitions`
    *    range-disjoint queries executed by separate tasks — the
    *    reference's single-client `job.result()` materialization
    *    (main.py:544) is the one-reader bottleneck this removes; at
    *    100 TB the table arrives through N connections in parallel;
    *  - `fetchSize` keeps each connection streaming (driver-dependent
    *    default can be row-at-a-time or whole-result);
    *  - `sessionInitStatement` runs once per connection before the first
    *    read — warehouse session knobs (search_path, time zone, query
    *    tags, result-cache off) without a custom driver;
    *  - `quoteTable = true` quotes each dot-separated part of `table`
    *    with the URL's JDBC dialect quoting rules, for reserved-word or
    *    case-sensitive warehouse identifiers (pass `partitionCol`
    *    pre-quoted if it needs the same treatment — it lands in
    *    generated WHERE clauses verbatim).
    *
    * Bounds are caller-supplied, not auto-discovered: a min/max probe
    * query on a 100 TB table is a full scan on some warehouses; callers
    * that want auto-bounds run their own cheap stats query first. */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitionCol: Option[String] = None,
           lowerBound: Long = 0L, upperBound: Long = 0L,
           numPartitions: Int = 1,
           fetchSize: Int = 10000,
           sessionInitStatement: Option[String] = None,
           quoteTable: Boolean = false,
           props: java.util.Properties = new java.util.Properties()): DataFrame = {
    val tableRef =
      if (quoteTable) {
        val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
        table.split("\\.").map(dialect.quoteIdentifier).mkString(".")
      } else table
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", tableRef)
      .option("fetchsize", fetchSize.toString)
    val reader = sessionInitStatement
      .fold(base)(s => base.option("sessionInitStatement", s))
    val partitioned = partitionCol match {
      case Some(c) =>
        require(upperBound > lowerBound, "partitioned jdbc read needs bounds")
        reader.option("partitionColumn", c)
          .option("lowerBound", lowerBound.toString)
          .option("upperBound", upperBound.toString)
          .option("numPartitions", numPartitions.toString)
      case None => reader
    }
    props.stringPropertyNames().forEach { k =>
      partitioned.option(k, props.getProperty(k)); ()
    }
    partitioned.load()
  }

  /** Hive-style partitioned parquet layout — the 100 TB contract for any
    * time-series table: queries that filter on the partition columns
    * prune whole directories (PartitionFilters in the scan) instead of
    * reading footers of every file.
    *
    * `filesPerPartition` bounds the small-files problem: data is
    * repartitioned on the partition columns (plus a bounded salt) before
    * the write, so each Hive partition gets at most that many files
    * instead of one per upstream task. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                      filesPerPartition: Int = 1): Unit = {
    import org.apache.spark.sql.functions._
    val keys = partitionCols.map(col)
    val distributed =
      if (filesPerPartition <= 1) df.repartition(keys: _*)
      else df.repartition(keys :+ pmod(spark_partition_id(), lit(filesPerPartition)): _*)
    distributed.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
