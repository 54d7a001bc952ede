package graft

import org.apache.spark.sql.functions._
import graft.expr.Scalars
import graft.model.Fixtures
import graft.ops.TieredMatch

class TieredMatchSpec extends SparkSpec {

  test("melt form ≡ three-broadcast form on the full fixture (both tiers + email)") {
    // replicate joinTiered's semantics through the melt path
    val p = Fixtures.patients(spark, sf0001)
      .withColumn("email", Scalars.emailNorm(col("email_raw")))
    val im = Fixtures.idMap(spark, sf0001)
      .filter(col("hubspot_object_type") === "contacts")
      .select(col("natural_key"), col("hubspot_id"))
    val t3 = Fixtures.targetState(spark, sf0001)
      .filter(col("email").isNotNull)
      .groupBy(col("email"))
      .agg(min(col("hubspot_id")).as("hubspot_id"), count(lit(1)).as("n"))
      .filter(col("n") === 1)
      .select(col("email").as("natural_key"), col("hubspot_id"))
    // tier-3 uses a different match table, so melt runs over the union
    // with tier-namespaced keys (the general form of "N tiers, N tables")
    val matchTbl = im.select(concat(lit("id:"), col("natural_key")).as("natural_key"), col("hubspot_id"))
      .unionByName(im.select(concat(lit("ch:"), col("natural_key")).as("natural_key"), col("hubspot_id")))
      .unionByName(t3.select(concat(lit("em:"), col("natural_key")).as("natural_key"), col("hubspot_id")))
    val melted = TieredMatch.melt(p, "c_custkey",
      Seq(concat(lit("id:"), col("patient_id")),
        concat(lit("ch:"), col("patient_chart")),
        concat(lit("em:"), col("email"))),
      matchTbl)
    val reference = ops.Relational.joinTiered.fn(spark, sf0001)
      .select(col("c_custkey"), col("hubspot_id"), col("tier"))
    val a = melted.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val b = reference.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(a == b, {
      val onlyA = a -- b; val onlyB = b -- a
      s"melt-only: ${onlyA.take(5)}; broadcast-only: ${onlyB.take(5)}"
    })
  }

  test("melt is a single join + single aggregation (plan shape)") {
    import org.apache.spark.sql.functions.{col => c}
    val p = Fixtures.patients(spark, sf0001)
    val im = Fixtures.idMap(spark, sf0001)
      .filter(c("hubspot_object_type") === "contacts")
      .select(c("natural_key"), c("hubspot_id"))
    val out = TieredMatch.melt(p, "c_custkey",
      Seq(c("patient_id"), c("patient_chart")), im)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // exactly the probe-side joins we expect: match join + add-back join
    assert("Join".r.findAllIn(plan).size <= 4, s"too many joins:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
