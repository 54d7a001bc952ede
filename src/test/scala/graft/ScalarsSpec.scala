package graft

import org.apache.spark.sql.functions._
import graft.expr.Scalars

class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).get(0)

  test("tolerantBool full matrix (main.py:114-132 semantics)") {
    val cases = Seq(
      "true" -> "true", "TRUE" -> "true", " 1 " -> "true", "y" -> "true",
      "YES" -> "true", "t" -> "true", "2" -> "true", "-1" -> "true",
      " 2.5 " -> "true",
      "false" -> "false", "0" -> "false", "n" -> "false", "NO" -> "false",
      "F" -> "false", "0.0" -> "false",
      "" -> null, "   " -> null,
      "garbage" -> "garbage", " MiXeD " -> "mixed")
    val df = cases.map(_._1).toDF("raw")
      .select(col("raw"), Scalars.tolerantBool(col("raw")).as("parsed"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"input '$in'")
    }
  }

  test("formatIdentifier canonicalization (main.py:205-221)") {
    val cases = Seq(
      "10.500" -> "10.5", "7" -> "7", "7.0" -> "7", " 42 " -> "42",
      "" -> null, "00.120" -> "0.12", "-5.0" -> "-5", "abc" -> "abc",
      "3.14" -> "3.14", "000" -> "0", "0" -> "0", "  x y  " -> "x y")
    val df = cases.map(_._1).toDF("raw")
      .select(col("raw"), Scalars.formatIdentifier(col("raw")).as("f"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) == want, s"input '$in'") }
  }

  test("nextBirthday: anniversary >= today; Feb-29 → Mar-1 policy") {
    val today = lit("2026-08-12").cast("date")
    def nb(dob: String): String =
      one(Scalars.nextBirthday(lit(dob).cast("date"), today)).toString
    assert(nb("1990-08-12") == "2026-08-12") // today counts
    assert(nb("1990-08-11") == "2027-08-11") // just passed → next year
    assert(nb("1990-12-31") == "2026-12-31")
    assert(nb("1990-01-01") == "2027-01-01")
    assert(nb("1992-02-29") == "2027-03-01") // 2027 non-leap → Mar-1
  }

  test("nextBirthday Feb-29 lands on Feb-29 in leap target year") {
    val today = lit("2028-01-15").cast("date")
    assert(one(Scalars.nextBirthday(lit("1992-02-29").cast("date"), today)).toString
      == "2028-02-29")
  }

  test("hash8 is first 8 hex of sha256") {
    assert(one(Scalars.hash8(lit("abc"))) == "ba7816bf")
  }

  test("emailNorm trims, lowercases, blanks to null") {
    assert(one(Scalars.emailNorm(lit(" A@B.Com "))) == "a@b.com")
    assert(one(Scalars.emailNorm(lit("  "))) == null)
  }

  test("epochMillisFromIsoUtc handles Z suffix") {
    assert(one(Scalars.epochMillisFromIsoUtc(lit("2024-01-01T00:00:00Z"))) == 1704067200000L)
  }

  test("epochMillisFromEasternDate: naive date treated as Eastern (main.py:155)") {
    // 1997-01-15 00:00 Eastern (EST, -05) = 05:00 UTC
    assert(one(Scalars.epochMillisFromEasternDate(lit("1997-01-15"))) == 853304400000L)
  }

  test("easternWall renders DST correctly") {
    val df = Seq("2024-07-01 12:00:00", "2024-01-01 12:00:00").toDF("s")
      .select(Scalars.easternWall(col("s").cast("timestamp")).as("r"))
    val got = df.collect().map(_.getString(0))
    assert(got.sameElements(Array("2024-07-01 08:00:00", "2024-01-01 07:00:00")))
  }

  test("cleanTimestampIso renders Eastern with UTC offset (X1 full form)") {
    val df = Seq("2024-07-01 12:00:00", "2024-01-01 12:00:00").toDF("s")
      .select(Scalars.cleanTimestampIso(col("s").cast("timestamp")).as("r"))
    val got = df.collect().map(_.getString(0))
    assert(got.sameElements(Array(
      "2024-07-01T08:00:00-04:00",  // EDT
      "2024-01-01T07:00:00-05:00"))) // EST
  }

  test("coalesceBlankFalsy skips empty strings like python `or` (X9)") {
    assert(one(Scalars.coalesceBlankFalsy(lit(""), lit("b"))) == "b")
    assert(one(Scalars.coalesceBlankFalsy(lit("a"), lit("b"))) == "a")
  }

  test("redactProjection masks PHI-named columns only") {
    val df = Seq(("Jo", "jo@x.com", "M", "seg")).toDF("first_name", "email", "gender", "segment")
    val red = Scalars.redactProjection(df).collect()(0)
    assert(red.getString(0) != "Jo" && red.getString(0).length == 8)
    assert(red.getString(1) != "jo@x.com")
    assert(red.getString(2) != "M")
    assert(red.getString(3) == "seg") // non-PHI passes through
  }
}
