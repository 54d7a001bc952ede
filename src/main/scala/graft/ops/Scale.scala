package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques the 100 TB deployment leans on (SURVEY.md §4 /
  * builder contract): bucketed co-located joins (no exchange on either
  * side) and salted joins for skewed keys. These are library helpers so
  * pipelines opt in where profiling shows the shuffle is the bottleneck;
  * AQE's skew-join handling remains the default for everything else.
  */
object Scale {

  /** Write both sides bucketed on the join key, so subsequent joins are
    * exchange-free (each bucket pair joins locally). The ~metastore
    * tables live under the session's warehouse dir.
    *
    * At 100 TB this is the difference between re-shuffling the fact
    * table on every join and shuffling it once at write time. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a stale location from a previous session is invisible to a fresh
    // catalog but still blocks CREATE — clear it
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — planner emits a
    * SortMergeJoin with NO Exchange when bucket counts match. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)

  /** Salted join for skewed build keys: the skewed (left) side gets a
    * deterministic salt in [0, salt); the right side is replicated
    * `salt` times. Equi-join on (key, salt) spreads each hot key over
    * `salt` reducers. Deterministic (hash-based, not rand()) so results
    * are reproducible and retryable.
    *
    * Use when a handful of keys dominate (AQE skew handling splits
    * partitions, but pre-salting also fixes the single-hot-key case
    * AQE cannot split below one key). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0)
    val saltCol = "__graft_salt"
    // deterministic spread: hash ALL row content — stable under
    // repartitioning/AQE/task retries, unlike monotonically_increasing_id
    // or rand() (whose partition-dependence re-exposes shuffle-retry
    // row loss/duplication)
    val l = left.withColumn(saltCol,
      pmod(hash(left.columns.map(col): _*), lit(salt)))
    val r = right.withColumn(saltCol,
      explode(array((0 until salt).map(lit): _*)))
    l.join(r, Seq(key, saltCol), joinType).drop(saltCol)
  }
}
