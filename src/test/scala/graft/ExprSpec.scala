package graft

import org.apache.spark.sql.functions._
import graft.expr.{ColumnOps, GraftFunctions, NextBirthdayUtil, Scalars}

class ExprSpec extends SparkSpec {
  import spark.implicits._

  test("DotProduct matches the HOF form bit-for-bit on real embeddings") {
    val e = model.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val hof = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val diff = e.select(ColumnOps.dotProduct(col("v"), col("v")).as("a"), hof.as("b"))
      .filter(col("a") =!= col("b")) // bitwise-equal doubles compare equal
    assert(diff.count() == 0)
  }

  test("DotProduct: nulls and length mismatch") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(2.0, 3.0))).toDF("a", "b")
    assert(df.select(ColumnOps.dotProduct(col("a"), col("b"))).collect()(0)
      .getDouble(0) == 8.0) // min-length semantics
    val withNull = df.select(ColumnOps.dotProduct(lit(null).cast("array<double>"),
      col("b"))).collect()(0)
    assert(withNull.isNullAt(0))
  }

  test("NextBirthday expression agrees with the composed-Column fallback") {
    val today = lit("2026-08-12").cast("date")
    val df = model.Tables.customer(spark, sf0001)
      .select(make_date(lit(1940) + (col("c_custkey") % 60).cast("int"),
        lit(1) + (col("c_custkey") % 12).cast("int"),
        lit(1) + (col("c_custkey") % 28).cast("int")).as("dob"))
    val diff = df.select(
      ColumnOps.nextBirthday(col("dob"), today).as("a"),
      Scalars.nextBirthday(col("dob"), today).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
  }

  test("NextBirthdayUtil kernel: Feb-29 policy at the int-days level") {
    def d(s: String) = java.time.LocalDate.parse(s).toEpochDay.toInt
    assert(NextBirthdayUtil.compute(d("1992-02-29"), d("2026-08-12")) == d("2027-03-01"))
    assert(NextBirthdayUtil.compute(d("1992-02-29"), d("2028-01-15")) == d("2028-02-29"))
    assert(NextBirthdayUtil.compute(d("1990-08-12"), d("2026-08-12")) == d("2026-08-12"))
  }

  test("SQL surface works after registration (temp function + extensions path)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT next_birthday(DATE '1990-05-01', DATE '2026-08-12') AS nb, " +
      "dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp").collect()(0)
    assert(r.getDate(0).toString == "2027-05-01")
    assert(r.getDouble(1) == 11.0)
  }

  test("codegen and interpreted paths agree (wholestage on/off)") {
    val q = model.Tables.embeddings(spark, sf0001)
      .select(ColumnOps.dotProduct(col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>")).as("d"))
    val on = q.agg(sum("d")).collect()(0).getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = q.agg(sum("d")).collect()(0).getDouble(0)
      assert(on == off)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
