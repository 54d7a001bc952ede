package graft.ops

import org.apache.spark.sql.functions._

import graft.Q
import graft.expr.Scalars
import graft.model.{Fixtures, Tables}

/** Oracle-checked queries exercising the scalar library (SURVEY.md §2g). */
object ScalarQueries {

  // ---------- X1: clean_value (timestamp → Eastern render) ----------
  val fnCleanValue: Q = Q("fn_clean_value",
    (spark, sfDir) =>
      Tables.events(spark, sfDir).select(
        col("event_id"),
        Scalars.easternWall(col("ts")).as("eastern_ts"),
        Scalars.cleanNumeric(col("value")).as("value_dbl"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
           |  strftime(timezone('America/New_York', timezone('UTC', ts)), '%Y-%m-%d %H:%M:%S') AS eastern_ts,
           |  CAST(value AS DOUBLE) AS value_dbl
           |FROM events ORDER BY event_id""".stripMargin))

  // ---------- X2: tolerant bool ----------
  val fnBool: Q = Q("fn_bool",
    (spark, sfDir) => {
      val k = col("c_custkey")
      val raw = when(k % 12 === 0, lit("true")).when(k % 12 === 1, lit("FALSE"))
        .when(k % 12 === 2, lit(" 1 ")).when(k % 12 === 3, lit("0"))
        .when(k % 12 === 4, lit("Y")).when(k % 12 === 5, lit("n"))
        .when(k % 12 === 6, lit("YES")).when(k % 12 === 7, lit("no"))
        .when(k % 12 === 8, lit("t")).when(k % 12 === 9, lit("F"))
        .when(k % 12 === 10, lit("")).otherwise(lit(" 2.5 "))
      Tables.customer(spark, sfDir)
        .select(k, raw.as("raw"), Scalars.tolerantBool(raw).as("parsed"))
        .orderBy("c_custkey")
    },
    Some("""WITH t AS (
           |  SELECT c_custkey,
           |    CASE c_custkey % 12
           |      WHEN 0 THEN 'true' WHEN 1 THEN 'FALSE' WHEN 2 THEN ' 1 '
           |      WHEN 3 THEN '0' WHEN 4 THEN 'Y' WHEN 5 THEN 'n'
           |      WHEN 6 THEN 'YES' WHEN 7 THEN 'no' WHEN 8 THEN 't'
           |      WHEN 9 THEN 'F' WHEN 10 THEN '' ELSE ' 2.5 ' END AS raw
           |  FROM customer),
           |n AS (SELECT c_custkey, raw, lower(trim(raw)) AS s FROM t)
           |SELECT c_custkey, raw,
           |  CASE WHEN s IS NULL OR s = '' THEN NULL
           |       WHEN s IN ('true','1','y','yes','t') THEN 'true'
           |       WHEN s IN ('false','0','n','no','f') THEN 'false'
           |       WHEN regexp_full_match(s, '-?[0-9]+(\.[0-9]+)?') THEN
           |         CASE WHEN CAST(s AS DOUBLE) <> 0.0 THEN 'true' ELSE 'false' END
           |       ELSE s END AS parsed
           |FROM n ORDER BY c_custkey""".stripMargin))

  // ---------- X3: epoch millis from ISO-UTC and Eastern date ----------
  val fnEpochMillis: Q = Q("fn_epoch_millis",
    (spark, sfDir) => {
      val o = Tables.orders(spark, sfDir)
      val isoUtc = concat(date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss"), lit("Z"))
      val dateStr = date_format(col("o_orderdate"), "yyyy-MM-dd")
      o.select(col("o_orderkey"),
        Scalars.epochMillisFromIsoUtc(isoUtc).as("ms_utc"),
        Scalars.epochMillisFromEasternDate(dateStr).as("ms_eastern"))
        .orderBy("o_orderkey")
    },
    Some("""WITH t AS (
           |  SELECT o_orderkey,
           |    concat(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S'), 'Z') AS iso_utc,
           |    strftime(o_orderdate, '%Y-%m-%d') AS date_str
           |  FROM orders)
           |SELECT o_orderkey,
           |  epoch_ms(strptime(regexp_replace(iso_utc, 'Z$', ''), '%Y-%m-%dT%H:%M:%S')) AS ms_utc,
           |  epoch_ms(timezone('UTC', timezone('America/New_York', strptime(date_str, '%Y-%m-%d')))) AS ms_eastern
           |FROM t ORDER BY o_orderkey""".stripMargin))

  // ---------- X4: eastern date string ----------
  val fnEasternDate: Q = Q("fn_eastern_date",
    (spark, sfDir) =>
      Tables.events(spark, sfDir).select(
        col("event_id"),
        Scalars.easternDateString(col("ts")).as("eastern_date"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
           |  strftime(timezone('America/New_York', timezone('UTC', ts)), '%Y-%m-%d') AS eastern_date
           |FROM events ORDER BY event_id""".stripMargin))

  // ---------- X5: next birthday (today injected as literal, SURVEY §5) ----------
  val fnNextBirthday: Q = Q("fn_next_birthday",
    (spark, sfDir) => {
      val k = col("c_custkey")
      val dob = make_date(lit(1940) + (k % 60).cast("int"), lit(1) + (k % 12).cast("int"),
        lit(1) + (k % 28).cast("int"))
      val today = lit("2026-08-12").cast("date")
      // the custom Catalyst Expression (graft.expr.NextBirthday), so the
      // oracle gate exercises the codegen path; Scalars.nextBirthday is
      // the composed-Column fallback (equivalence asserted in ExprSpec)
      Tables.customer(spark, sfDir)
        .select(k, dob.as("dob"),
          graft.expr.ColumnOps.nextBirthday(dob, today).as("next_birthday"))
        .orderBy("c_custkey")
    },
    Some("""WITH t AS (
           |  SELECT c_custkey,
           |    make_date(CAST(1940 + c_custkey % 60 AS INT), CAST(1 + c_custkey % 12 AS INT),
           |              CAST(1 + c_custkey % 28 AS INT)) AS dob
           |  FROM customer)
           |SELECT c_custkey, dob,
           |  CASE WHEN make_date(2026, month(dob)::INT, day(dob)::INT) >= DATE '2026-08-12'
           |       THEN make_date(2026, month(dob)::INT, day(dob)::INT)
           |       ELSE make_date(2027, month(dob)::INT, day(dob)::INT) END AS next_birthday
           |FROM t ORDER BY c_custkey""".stripMargin))

  // ---------- X6: format_identifier ----------
  val fnFormatId: Q = Q("fn_format_id",
    (spark, sfDir) => {
      val k = col("c_custkey")
      val raw = when(k % 9 === 0, lit("10.500")).when(k % 9 === 1, lit("7"))
        .when(k % 9 === 2, lit("7.0")).when(k % 9 === 3, lit(" 42 "))
        .when(k % 9 === 4, lit("")).when(k % 9 === 5, lit("00.120"))
        .when(k % 9 === 6, lit("-5.0")).when(k % 9 === 7, lit("abc"))
        .otherwise(lit("3.14"))
      Tables.customer(spark, sfDir)
        .select(k, raw.as("raw"), Scalars.formatIdentifier(raw).as("formatted"))
        .orderBy("c_custkey")
    },
    Some("""WITH t AS (
           |  SELECT c_custkey,
           |    CASE c_custkey % 9
           |      WHEN 0 THEN '10.500' WHEN 1 THEN '7' WHEN 2 THEN '7.0'
           |      WHEN 3 THEN ' 42 ' WHEN 4 THEN '' WHEN 5 THEN '00.120'
           |      WHEN 6 THEN '-5.0' WHEN 7 THEN 'abc' ELSE '3.14' END AS raw
           |  FROM customer),
           |s AS (SELECT c_custkey, raw, trim(raw) AS tr FROM t),
           |n AS (SELECT c_custkey, raw, tr,
           |        regexp_replace(regexp_replace(
           |          regexp_replace(tr, '^(-?)0+([0-9])', '\1\2'),
           |          '^(-?[0-9]+\.[0-9]*?)0+$', '\1'), '\.$', '') AS canon
           |      FROM s)
           |SELECT c_custkey, raw,
           |  CASE WHEN tr = '' THEN NULL
           |       WHEN regexp_full_match(tr, '-?[0-9]+(\.[0-9]+)?') THEN canon
           |       ELSE tr END AS formatted
           |FROM n ORDER BY c_custkey""".stripMargin))

  // ---------- X7: hash8 ----------
  val fnHash8: Q = Q("fn_hash8",
    (spark, sfDir) =>
      Tables.customer(spark, sfDir)
        .select(col("c_custkey"), Scalars.hash8(col("c_name")).as("h8"))
        .orderBy("c_custkey"),
    Some("SELECT c_custkey, substr(sha256(c_name),1,8) AS h8 FROM customer ORDER BY c_custkey"))

  // ---------- X8: email normalize ----------
  val fnEmailNorm: Q = Q("fn_email_norm",
    (spark, sfDir) =>
      Fixtures.patients(spark, sfDir)
        .select(col("c_custkey"), Scalars.emailNorm(col("email_raw")).as("email"))
        .orderBy("c_custkey"),
    Some(Fixtures.withCtes(Fixtures.patientsSql) +
      """SELECT c_custkey, nullif(lower(trim(email_raw)),'') AS email
        |FROM patients ORDER BY c_custkey""".stripMargin))

  // ---------- X10/X11: JSON payload + truncation ----------
  val fnToJson: Q = Q("fn_to_json",
    (spark, sfDir) =>
      Tables.events(spark, sfDir).select(
        col("event_id"),
        Scalars.jsonPayload(90000, col("event_id"), col("event_type")).as("payload"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
           |  substr(concat('{"event_id":', CAST(event_id AS VARCHAR),
           |                ',"event_type":"', event_type, '"}'), 1, 90000) AS payload
           |FROM events ORDER BY event_id""".stripMargin))

  // ---------- X13: JSON decode (schema-on-read over events.props) ------
  // Both the path-extraction form (get_json_object: no schema, lazy) and
  // the schema-applied form (from_json: typed struct, Catalyst-visible).
  val fnJsonGet: Q = Q("fn_json_get",
    (spark, sfDir) =>
      Tables.events(spark, sfDir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_path"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType))))
          .getField("k").as("k_typed"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
           |  CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
           |  CAST(json_extract_string(props, '$.k') AS INT) AS k_typed
           |FROM events ORDER BY event_id""".stripMargin))

  // ---------- X14: higher-order array functions (Catalyst HOFs) --------
  // filter/aggregate/array_max over array columns stay inside Catalyst
  // (no UDF); the double cast before arithmetic keeps both engines in
  // float64 with the same left-to-right accumulation.
  val fnArrayOps: Q = Q("fn_array_ops",
    (spark, sfDir) => {
      val v = col("embedding").cast("array<double>")
      Tables.embeddings(spark, sfDir).select(
        col("vec_id"),
        size(filter(col("embedding"), x => x > 0)).as("n_pos"),
        round(aggregate(v, lit(0.0), (acc, x) => acc + x), 4).as("total"),
        round(array_max(v), 4).as("mx"))
        .orderBy("vec_id")
    },
    Some("""SELECT vec_id,
           |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           |  round(list_sum(embedding::DOUBLE[]), 4) AS total,
           |  round(list_max(embedding::DOUBLE[]), 4) AS mx
           |FROM embeddings ORDER BY vec_id""".stripMargin))

  val all: Seq[Q] = Seq(fnCleanValue, fnBool, fnEpochMillis, fnEasternDate,
    fnNextBirthday, fnFormatId, fnHash8, fnEmailNorm, fnToJson, fnJsonGet,
    fnArrayOps)
}
