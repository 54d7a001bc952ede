package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function library — SURVEY.md §2g (X1–X12).
  *
  * Every function is a pure `Column => Column` built from
  * `org.apache.spark.sql.functions` so Catalyst sees through it
  * (constant folding, null propagation, whole-stage codegen). No UDFs.
  *
  * Reference semantics (studied, not copied) cited per function as
  * /root/reference/main.py line ranges.
  */
object Scalars {

  val EasternTz = "America/New_York"

  /** PRECONDITION for the wall-clock helpers below (easternWall,
    * easternDateString, epochMillisFromEasternDate, cleanTimestampIso):
    * spark.sql.session.timeZone must be UTC — `to_timestamp` parses and
    * `date_format` renders in the SESSION zone, so a non-UTC session
    * silently shifts results. Call this at pipeline entry; the repo's
    * mains all set UTC. (epochMillisFromIsoUtc is session-independent:
    * its pattern carries an explicit offset.) */
  def requireUtcSession(spark: org.apache.spark.sql.SparkSession): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"graft's timezone-rendering helpers need spark.sql.session.timeZone=UTC (got '$tz')")
  }

  // ---- X1: clean_value (main.py:103-112) ------------------------------
  /** Timestamp → Eastern-rendered ISO string with offset (engine policy:
    * UTC storage, Eastern render — SURVEY.md §1).
    *
    * The offset is derived from the actual shift (DST-aware): a plain
    * date_format(..., "XXX") would render the SESSION timezone's offset
    * ('Z' under UTC), not Eastern's. */
  def cleanTimestampIso(c: Column): Column = {
    val shifted = from_utc_timestamp(c, EasternTz)
    val offSec = unix_seconds(shifted) - unix_seconds(c)
    val sign = when(offSec < 0, lit("-")).otherwise(lit("+"))
    val absSec = abs(offSec)
    val hh = lpad((absSec / 3600).cast("int").cast("string"), 2, "0")
    val mm = lpad(((absSec % 3600) / 60).cast("int").cast("string"), 2, "0")
    concat(date_format(shifted, "yyyy-MM-dd'T'HH:mm:ss"), sign, hh, lit(":"), mm)
  }

  /** Timestamp → Eastern wall-clock string without offset (oracle-safe). */
  def easternWall(c: Column): Column =
    date_format(from_utc_timestamp(c, EasternTz), "yyyy-MM-dd HH:mm:ss")

  /** Decimal/number → double (BigQuery NUMERIC → float, main.py:104-105). */
  def cleanNumeric(c: Column): Column = c.cast("double")

  // ---- X2: to_hubspot_bool (main.py:114-132) --------------------------
  /** Tolerant boolean parse. Returns a *string* column:
    * 'true' / 'false' / lowercased passthrough / null — mirroring the
    * reference's "anything else passes through lowercased" behavior. */
  def tolerantBool(c: Column): Column = {
    val s = lower(trim(c))
    when(s.isNull || s === "", lit(null).cast("string"))
      .when(s.isin("true", "1", "y", "yes", "t"), lit("true"))
      .when(s.isin("false", "0", "n", "no", "f"), lit("false"))
      .when(s.rlike("^-?[0-9]+(\\.[0-9]+)?$"),
        when(s.cast("double") =!= 0.0, lit("true")).otherwise(lit("false")))
      .otherwise(s)
  }

  // ---- X3: to_epoch_millis (main.py:134-158) --------------------------
  /** ISO-8601 UTC string ('...Z' tolerated) → epoch millis.
    * Session-independent: the pattern parses an explicit offset, so a
    * non-UTC session cannot shift the result. */
  def epochMillisFromIsoUtc(c: Column): Column =
    unix_millis(to_timestamp(
      concat(regexp_replace(c, "Z$", ""), lit("+00:00")),
      "yyyy-MM-dd'T'HH:mm:ssXXX"))

  /** Bare date string — reference treats naive as Eastern (main.py:155). */
  def epochMillisFromEasternDate(c: Column): Column =
    unix_millis(to_utc_timestamp(to_timestamp(c, "yyyy-MM-dd"), EasternTz))

  // ---- X4: to_eastern_date_string (main.py:160-180) -------------------
  def easternDateString(c: Column): Column =
    date_format(from_utc_timestamp(c, EasternTz), "yyyy-MM-dd")

  // ---- X5: compute_next_birthday (main.py:182-203) --------------------
  /** Next anniversary of `dob` that is >= `today` (a date literal is
    * injected for determinism — SURVEY.md §5). Feb-29 policy: Mar-1
    * (the reference's Python `.replace` would raise; we define the
    * policy instead of inheriting the crash — SURVEY.md §2g X5). */
  def nextBirthday(dob: Column, today: Column): Column = {
    val m = month(dob)
    val d = day(dob)
    // ANSI mode (Spark 4 default) makes make_date THROW on invalid
    // dates, so Feb-29 must be redirected before construction.
    def isLeap(y: Column): Column =
      (y % 4 === 0 && y % 100 =!= 0) || (y % 400 === 0)
    def anniv(y: Column): Column =
      when(m === 2 && d === 29 && !isLeap(y), make_date(y, lit(3), lit(1)))
        .otherwise(make_date(y, m, d))
    val thisYear = anniv(year(today))
    when(thisYear >= today, thisYear).otherwise(anniv(year(today) + 1))
  }

  // ---- X6: format_identifier (main.py:205-221) ------------------------
  /** Canonicalize numeric-looking identifiers textually:
    * trim; '' → null; integral → drop '.0…'; strip trailing zeros after
    * the decimal point and any leading zeros; non-numeric passes through
    * trimmed. Pure text (no double round-trip) so engines agree. */
  def formatIdentifier(c: Column): Column = {
    val t = trim(c)
    val numeric = t.rlike("^-?[0-9]+(\\.[0-9]+)?$")
    // strip leading zeros (keep one digit before '.'), e.g. 00.120 -> 0.120
    val noLead = regexp_replace(t, "^(-?)0+([0-9])", "$1$2")
    // strip trailing zeros then a dangling '.', e.g. 10.500 -> 10.5, 7.0 -> 7
    val noTrail = regexp_replace(regexp_replace(noLead, "^(-?[0-9]+\\.[0-9]*?)0+$", "$1"), "\\.$", "")
    when(t.isNull || t === "", lit(null).cast("string"))
      .when(numeric, noTrail)
      .otherwise(t)
  }

  // ---- X7: hash8 (main.py:93-97) --------------------------------------
  /** First 8 hex chars of sha256 — used for fallback natural keys and
    * PHI redaction (F6). */
  def hash8(c: Column): Column = substring(sha2(c, 256), 1, 8)

  // ---- X8: email normalize (main.py:573) ------------------------------
  def emailNorm(c: Column): Column = nullif(lower(trim(c)), lit(""))

  // ---- X9: python-`or` coalesce (blank-falsy) -------------------------
  /** Python `a or b` skips '' as well as NULL — replicate for strings. */
  def coalesceBlankFalsy(cs: Column*): Column =
    coalesce(cs.map(c => nullif(c, lit(""))): _*)

  // ---- X10/X11: JSON encode + truncate (main.py:398-399) --------------
  def jsonPayload(limit: Int, cols: Column*): Column =
    substring(to_json(struct(cols: _*)), 1, limit)

  // ---- F6: PHI redaction (main.py:84-89) ------------------------------
  private val PhiNamePattern =
    "(?i).*(name|email|address|dob|birth|phone|gender).*"

  /** Schema-driven masking: any column whose *name* matches the PHI
    * pattern is replaced by its hash8; everything else passes through. */
  def redactProjection(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.name.matches(PhiNamePattern)) hash8(col(f.name).cast("string")).as(f.name)
      else col(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  // ---- deterministic 60-bit hash (extension ops) ----------------------
  /** Hex-prefix-of-sha256 → bigint; identical in DuckDB via
    * cast(concat('0x', substr(sha256(x),1,15)) as bigint). Backed by the
    * fused Sha60 codegen Expression (digests bytes directly); the
    * composed column form is kept for the equivalence test. */
  def hash60(c: Column): Column = ColumnOps.sha60(c)

  /** Composed-builtin form of hash60 — the reference implementation the
    * Sha60 kernel must match bit-for-bit (asserted in ExprSpec). */
  def hash60Composed(c: Column): Column =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")
}
