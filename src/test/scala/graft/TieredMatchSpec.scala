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

  test("README.md:38-42 tier spec: email → (first,last,DOB) composite → address") {
    import spark.implicits._
    // target-side records with all three key shapes
    val state = Seq(
      ("jo@x.com", "jo|smith|1990-01-01", "12 main st", "HS-1"),
      (null, "al|jones|1985-05-05", "99 oak ave", "HS-2"),
      (null, null, "7 pine rd", "HS-3"))
      .toDF("email", "name_dob", "address", "hubspot_id")
    val matchTbl = state.selectExpr("concat('em:', email) AS natural_key", "hubspot_id")
      .where("email IS NOT NULL")
      .unionByName(state.selectExpr("concat('nd:', name_dob) AS natural_key", "hubspot_id")
        .where("name_dob IS NOT NULL"))
      .unionByName(state.selectExpr("concat('ad:', address) AS natural_key", "hubspot_id"))
    val probe = Seq(
      (1L, "jo@x.com", "jo", "smith", "1990-01-01", "wrong addr"), // tier 1: email
      (2L, null, "al", "jones", "1985-05-05", "wrong addr"),       // tier 2: composite
      (3L, null, "zz", "top", "2000-01-01", "7 pine rd"),          // tier 3: address
      (4L, null, "no", "body", "1999-09-09", "nowhere"))           // no match
      .toDF("row_id", "email", "first", "last", "dob", "address")
    val out = TieredMatch.melt(probe, "row_id",
      Seq(concat(lit("em:"), col("email")),
        concat(lit("nd:"), lower(col("first")), lit("|"), lower(col("last")),
          lit("|"), col("dob")),
        concat(lit("ad:"), col("address"))),
      matchTbl)
      .collect().map(r => r.getLong(0) -> (Option(r.getString(1)), r.getInt(2))).toMap
    assert(out(1L) == (Some("HS-1"), 1))
    assert(out(2L) == (Some("HS-2"), 2))
    assert(out(3L) == (Some("HS-3"), 3))
    assert(out(4L) == (None, 0))
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
