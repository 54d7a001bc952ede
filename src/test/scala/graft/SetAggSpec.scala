package graft

import org.apache.spark.sql.functions._

class SetAggSpec extends SparkSpec {

  test("approx_count_distinct stays within its error bound vs exact") {
    val approx = ops.SetAggQueries.aggApproxDistinct.fn(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = model.Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, d) =>
      val a = approx(k)
      assert(math.abs(a - d).toDouble / d < 0.05,
        s"flag $k: approx $a vs exact $d drifts >5%")
    }
  }

  test("approx_percentile stays within a value-error bound vs exact percentile") {
    // the sketch guarantees a RANK error <= 1/accuracy; on lineitem's
    // smooth price distribution that translates to a small value error,
    // gated here at 5% like the HLL bound (sf0.001 groups are ~2k rows,
    // so accuracy=1000 keeps the rank error within ~2 positions)
    val approx = ops.SetAggQueries.aggApproxPercentile.fn(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = ops.SetAggQueries.aggPercentile.fn(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (e50, e95)) =>
      val (a50, a95) = approx(k)
      assert(math.abs(a50 - e50) / e50 < 0.05, s"flag $k p50: approx $a50 vs exact $e50")
      assert(math.abs(a95 - e95) / e95 < 0.05, s"flag $k p95: approx $a95 vs exact $e95")
    }
  }

  test("rollup emits per-group, subtotal, and grand-total grains") {
    val df = ops.SetAggQueries.aggRollup.fn(spark, sf0001)
    assert(df.filter(col("l_returnflag").isNull && col("l_linestatus").isNull).count() == 1)
    val subtotals = df.filter(col("l_returnflag").isNotNull && col("l_linestatus").isNull)
    assert(subtotals.count() == 3) // A, N, R
    // grand total row equals the table count
    val total = df.filter(col("l_returnflag").isNull).select("n").collect()(0).getLong(0)
    assert(total == model.Tables.lineitem(spark, sf0001).count())
  }

  test("setop_except: result keys are exactly the unmapped patient ids") {
    val out = ops.SetAggQueries.setopExcept.fn(spark, sf0001)
      .collect().map(_.getString(0)).toSet
    // fixture: id_map tier-1 holds custkey % 3 != 0; patients have
    // patient_id when custkey % 10 != 3 → unmapped = %3==0 and %10!=3
    val expect = (0 until 150)
      .filter(k => k % 10 != 3 && k % 3 == 0).map(_.toString).toSet
    assert(out == expect)
  }
}
