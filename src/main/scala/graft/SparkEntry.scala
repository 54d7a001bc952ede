package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every registered query (core relational + scalar fns + extensions). */
  def registry: Seq[Q] =
    ops.Relational.all ++ ops.ScalarQueries.all ++ ops.SetAggQueries.all ++
      ext.Extensions.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The patients pipeline slice: projection + tiered id-map match. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.joinTiered.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
