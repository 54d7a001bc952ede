package graft

import org.apache.spark.sql.functions._
import graft.ops.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plans with no shuffle Exchange on either side") {
    Scale.writeBucketed(model.Tables.orders(spark, sf0001), "b_orders", "o_custkey", 8)
    Scale.writeBucketed(
      model.Tables.customer(spark, sf0001).withColumnRenamed("c_custkey", "o_custkey"),
      "b_customer", "o_custkey", 8)
    // force the sort-merge path: at real scale neither side broadcasts,
    // which is exactly when bucketing pays
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "b_orders", "b_customer", "o_custkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketing unused:\n$plan")
      // correctness: same result as the plain join
      val plain = model.Tables.orders(spark, sf0001).join(
        model.Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      assert(joined.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("saltedJoin returns exactly the same rows as the plain join") {
    val left = model.Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey").as("k"))
    val right = model.Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    val plain = left.join(right, Seq("k")).select("o_orderkey", "c_mktsegment")
    val salted = Scale.saltedJoin(left, right, "k", salt = 7)
      .select("o_orderkey", "c_mktsegment")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin preserves left-outer semantics") {
    val left = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val right = Seq((1, "X")).toDF("k", "w")
    val out = Scale.saltedJoin(left, right, "k", salt = 4, joinType = "left")
    assert(out.count() == 3)
    assert(out.filter(col("w").isNull).count() == 2)
  }
}
