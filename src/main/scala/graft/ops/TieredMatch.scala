package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tiered (coalescing) entity match — J4 (main.py:613-633,
  * README.md:38-42) — in its two scale regimes (SURVEY.md §4):
  *
  *  - broadcastable match table → three broadcast probes + coalesce
  *    (`ops.Relational.joinTiered`): zero shuffles of the probe side.
  *  - match table too large to broadcast → the three probe joins become
  *    three full shuffles of the (huge) probe side. `melt` replaces
  *    them with ONE shuffle: un-pivot the probe keys to
  *    (row, key, tier) rows, a single equi-join against the match
  *    table, then keep the best (lowest) tier per row.
  *
  * Both produce identical results; `TieredMatchSpec` asserts it.
  */
object TieredMatch {

  /** @param probe    left side, one row per entity
    * @param rowKey   unique row id column on `probe`
    * @param tiers    ordered (tierKeyColumn on probe) — tier 1 first
    * @param matchTbl (natural_key, hubspot_id)
    */
  def melt(probe: DataFrame, rowKey: String, tiers: Seq[Column],
           matchTbl: DataFrame): DataFrame = {
    // un-pivot: one row per (entity, non-null tier key)
    val keyStructs = tiers.zipWithIndex.map { case (c, i) =>
      struct(lit(i + 1).as("tier"), c.cast("string").as("k"))
    }
    val melted = probe
      .select(col(rowKey), explode(array(keyStructs: _*)).as("tk"))
      .select(col(rowKey), col("tk.tier").as("tier"), col("tk.k").as("k"))
      .filter(col("k").isNotNull)
    // ONE join (Catalyst picks broadcast vs shuffle from stats)
    val joined = melted.join(matchTbl,
      melted("k") === matchTbl("natural_key"), "inner")
    // best (lowest) tier wins per entity — map-side partial min first
    val best = joined
      .groupBy(col(rowKey))
      .agg(min(struct(col("tier"), col("hubspot_id"))).as("m"))
      .select(col(rowKey), col("m.hubspot_id").as("hubspot_id"),
        col("m.tier").as("tier"))
    // left join back so unmatched entities survive with tier 0
    probe.select(col(rowKey))
      .join(best, Seq(rowKey), "left")
      .select(col(rowKey), col("hubspot_id"),
        coalesce(col("tier"), lit(0)).as("tier"))
  }
}
