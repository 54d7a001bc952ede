package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle query over the
  * same parquet tables. Column names/order must agree between the two —
  * the driver hash-compares after sorting columns by name. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
