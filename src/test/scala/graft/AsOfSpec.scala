package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private val right = Seq(
    (1L, 100L, "r100"), (1L, 200L, "r200"), (2L, 150L, "r150"))
    .toDF("k", "rts", "payload")

  private def run(leftRows: (Long, Long)*) = {
    val left = leftRows.toDF("k", "lts")
    AsOf.join(left, right, "k", "lts", "rts", Seq("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
  }

  test("picks the most recent right row at-or-before the left timestamp") {
    assert(run((1L, 250L)) == Set((1L, 250L, "r200")))
    assert(run((1L, 150L)) == Set((1L, 150L, "r100")))
  }

  test("equal timestamps match (<= semantics)") {
    assert(run((1L, 200L)) == Set((1L, 200L, "r200")))
  }

  test("left row before any right row gets null (left-outer)") {
    assert(run((1L, 50L)) == Set((1L, 50L, null)))
    assert(run((9L, 500L)) == Set((9L, 500L, null))) // unseen key
  }

  test("multiple left rows at the same key/ts don't interfere") {
    assert(run((1L, 250L), (1L, 250L), (1L, 120L)) ==
      Set((1L, 250L, "r200"), (1L, 120L, "r100")))
  }

  test("matched right row with NULL payload yields NULL, not an older value") {
    // true as-of semantics (and DuckDB ASOF): the most recent row wins
    // even when its payload is null — no reaching back to older rows
    val r = Seq((1L, 100L, Some("old")), (1L, 200L, None))
      .toDF("k", "rts", "payload")
    val left = Seq((1L, 250L)).toDF("k", "lts")
    val out = AsOf.join(left, r, "k", "lts", "rts", Seq("payload")).collect()(0)
    assert(out.isNullAt(2), s"expected null payload, got ${out.get(2)}")
  }

  test("intervalJoin: containment, half-open [start, end)") {
    val l = Seq((1L, 10L), (1L, 20L), (1L, 30L)).toDF("k", "ts")
    val r = Seq((1L, 10L, 20L, "w1"), (1L, 20L, 30L, "w2")).toDF("k", "s", "e", "win")
    val out = AsOf.intervalJoin(l, r, "k", "ts", "s", "e")
      .select(l("ts"), col("win")).collect()
      .map(x => (x.getLong(0), x.getString(1))).toSet
    assert(out == Set((10L, "w1"), (20L, "w2"))) // 30 falls outside both
  }
}
