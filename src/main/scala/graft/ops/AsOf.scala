package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the most recent right
  * row with the same key and `rightTs <= leftTs`.
  *
  * Spark has no native ASOF join. Preference order (builder contract)
  * says compose built-ins when semantics allow, and they do: tag both
  * sides, union, and carry the latest right payload forward with a
  * running `last(_, ignoreNulls)` window. ONE shuffle on (key), no
  * per-key row explosion (contrast a range-join: key-equal pairs ×
  * filter). Right rows sort before left rows at equal timestamps, so
  * `<=` semantics hold. At 100 TB this is a single sort-merge pass —
  * the same shape Spark plans for any window — and skewed keys can be
  * pre-salted with Scale.saltedJoin semantics if one entity dominates.
  *
  * Contract: `right` must be unique per (key, ts) — dedupe first
  * (last-writer-wins) or results are nondeterministic.
  */
object AsOf {

  /** @param left        probe side
    * @param right       build side, unique per (key, ts)
    * @param key         equi-key column name present on both sides
    * @param leftTs      event-time column on left (TimestampType or numeric)
    * @param rightTs     event-time column on right (same type)
    * @param rightPayload columns of `right` to carry (others dropped)
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           rightPayload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    // the payload travels as ONE struct per right row (never per-column
    // windows): a right row whose payload columns are null still
    // produces a non-null struct, so the carried match is always the
    // single most-recent right ROW — not a chimera of the last non-null
    // value of each column from different rows
    val payloadStruct = struct(rightPayload.map(col): _*)
    val payloadType = {
      import org.apache.spark.sql.types.{StructField, StructType}
      StructType(rightPayload.map(c => StructField(c, right.schema(c).dataType,
        nullable = true)))
    }
    val tagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select((lCols.map(col) :+ col("__ts") :+ col("__side")) :+
        lit(null).cast(payloadType).as("__r"): _*)
    val rTagged = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select((lCols.map(c => if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("__ts") :+ col("__side")) :+
        payloadStruct.as("__r"): _*)
    // right rows (side=0) sort before left rows (side=1) at equal ts → `<=`
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = tagged.unionByName(rTagged)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(lCols.map(col) ++
        rightPayload.map(c => col("__c").getField(c).as(s"asof_$c")): _*)
  }

  /** Interval containment join, composed: events against [start, end)
    * validity windows. Equi-join on key bounds the pair set; the range
    * predicate filters inside the join — Spark pushes it into the join
    * condition (no cartesian). For unkeyed range joins, bucket the time
    * axis first (bin = floor(ts / width)) to stay linear. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, start: String, end: String): DataFrame =
    left.join(right,
      left(key) === right(key) &&
        left(leftTs) >= right(start) && left(leftTs) < right(end))
}
