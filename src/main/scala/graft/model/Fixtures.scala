package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic control-table fixtures derived from the read-only
  * testdata (FIXTURES.md §2-3). Each derivation exists twice, kept
  * adjacent so they stay in sync:
  *
  *   - a Spark DataFrame builder (used by SparkEntry.queries)
  *   - a DuckDB CTE string (prefixed onto the oracle SQL)
  *
  * The stand-ins mirror the reference's entities: `patients` ≈ the
  * BigQuery PatientsWithStatistics source (main.py:31), `rois` ≈ ROIs
  * (main.py:32), `id_map` ≈ hubspot_id_map (main.py:319-326),
  * `target_state` ≈ the HubSpot-side GET snapshot (main.py:676,778),
  * `dlq` / `ledger` ≈ the DDL tables (main.py:285-314).
  */
object Fixtures {

  private val BaseMs = 1704067200000L // 2024-01-01T00:00:00Z
  private val DayMs = 86400000L

  // ---------- patients (from customer) ----------
  // Round 2 widened the stand-in to the reference's full
  // PatientsWithStatistics surface (main.py:555-611, README.md:43-55):
  // name parts with Preferred* fallbacks, DOB (incl. Feb-29 leap rows),
  // address block, phones, facility, treatment counters, schedule
  // timestamps, tolerant-bool raw flags, and a format_identifier-shaped
  // raw id ('<k>.0'). Every column is a pure k-modular derivation so the
  // Spark builder and the DuckDB CTE stay provably in sync.
  def patients(spark: SparkSession, sfDir: String): DataFrame = {
    val k = col("c_custkey")
    Tables.customer(spark, sfDir).select(
      k,
      when(k % 10 === 3, lit(null)).otherwise(k.cast("string")).as("patient_id"),
      when(k % 7 === 2, lit(null)).otherwise(concat(lit("CH"), k.cast("string"))).as("patient_chart"),
      // email tiers: null / shared "dup" address (→ ambiguous match) /
      // unique per-key (→ cardinality-1 match) / nomatch domain
      when(k % 5 === 0, lit(null))
        .when(k % 21 === 0, concat(lit("dup"), (k % 3).cast("string"), lit("@Example.COM ")))
        .when(k % 2 === 1, concat(lit("user"), k.cast("string"), lit("@Example.COM ")))
        .otherwise(concat(lit("user"), (k + 1).cast("string"), lit("@nomatch.com ")))
        .as("email_raw"),
      col("c_name"), col("c_acctbal"), col("c_nationkey"), col("c_mktsegment"),
      // -- names (Preferred* only populated where the primary is absent,
      //    mirroring the reference's `or` fallbacks, main.py:574-577)
      when(k % 6 === 0, lit(null)).otherwise(concat(lit("First"), (k % 23).cast("string"))).as("first_name"),
      when(k % 6 === 0, concat(lit("PF"), (k % 23).cast("string"))).otherwise(lit(null)).as("preferred_first_name"),
      when(k % 5 === 0, concat(lit("M"), (k % 7).cast("string"))).otherwise(lit(null)).as("middle_name"),
      when(k % 5 =!= 0 && k % 10 === 1, concat(lit("PM"), (k % 7).cast("string"))).otherwise(lit(null)).as("preferred_middle_name"),
      when(k % 9 === 4, lit(null)).otherwise(concat(lit("Last"), (k % 31).cast("string"))).as("last_name"),
      when(k % 9 === 4, concat(lit("PL"), (k % 31).cast("string"))).otherwise(lit(null)).as("preferred_last_name"),
      when(k % 3 === 0, lit("F")).when(k % 3 === 1, lit("M")).otherwise(lit(null)).as("gender"),
      // k%29==0 rows land on Feb-29 of a leap year (1952+4n all leap) so
      // the next_birthday Mar-1 policy is exercised end-to-end
      when(k % 29 === 0, make_date((lit(1952) + (k % 12) * 4).cast("int"), lit(2), lit(29)))
        .otherwise(make_date((lit(1950) + k % 50).cast("int"),
          (lit(1) + k % 12).cast("int"), (lit(1) + k % 28).cast("int"))).as("dob"),
      // -- address block
      concat((lit(1) + k % 999).cast("string"), lit(" Main St")).as("address1"),
      when(k % 4 === 0, concat(lit("Apt "), (k % 20).cast("string"))).otherwise(lit(null)).as("address2"),
      concat(lit("City"), (k % 37).cast("string")).as("city"),
      concat(lit("S"), (k % 50).cast("string")).as("state_code"),
      lpad((k % 99999).cast("string"), 5, "0").as("zip"),
      // -- phones
      when(k % 3 === 0, lit(null)).otherwise(concat(lit("555-"), lpad((k % 10000).cast("string"), 4, "0"))).as("home_phone"),
      concat(lit("555-"), lpad(((k + 7) % 10000).cast("string"), 4, "0")).as("phone_alt"),
      when(k % 7 === 0, concat(lit("556-"), lpad((k % 10000).cast("string"), 4, "0"))).otherwise(lit(null)).as("other_phone"),
      // -- facility + counters
      concat(lit("Facility "), (k % 5).cast("string")).as("primary_facility"),
      concat(lit("FAC"), (k % 5).cast("string")).as("primary_facility_code"),
      (k % 9).cast("long").as("spravatos_to_date"),
      (k % 11).cast("long").as("ketamines_to_date"),
      (k % 20).cast("long").as("treatments_to_date"),
      (k % 4).cast("long").as("future_treatment_count"),
      (k % 3).cast("long").as("future_follow_up_count"),
      // -- schedule timestamps (NextTreatment|MaxScheduled fallback pair)
      when(k % 8 < 4, timestamp_millis(lit(BaseMs) + (k % 200) * DayMs)).otherwise(lit(null).cast("timestamp")).as("next_treatment"),
      when(k % 8 >= 4 && k % 8 < 6, timestamp_millis(lit(BaseMs) + (k % 150) * DayMs)).otherwise(lit(null).cast("timestamp")).as("max_scheduled_treatment"),
      when(k % 2 === 0, timestamp_millis(lit(BaseMs) + (k % 90) * DayMs + 3600000L)).otherwise(lit(null).cast("timestamp")).as("next_follow_up"),
      when(k % 10 < 5, timestamp_millis(lit(BaseMs) - (k % 400) * DayMs)).otherwise(lit(null).cast("timestamp")).as("first_treatment"),
      when(k % 10 >= 5 && k % 10 < 8, timestamp_millis(lit(BaseMs) - (k % 300) * DayMs)).otherwise(lit(null).cast("timestamp")).as("first_initial_consult"),
      // -- tolerant-bool raw flags (exercise X2's full branch matrix)
      when(k % 6 === 0, lit("Y")).when(k % 6 === 1, lit("no")).when(k % 6 === 2, lit(" 1 "))
        .when(k % 6 === 3, lit("0")).when(k % 6 === 4, lit("maybe")).otherwise(lit(null)).as("started_raw"),
      when(k % 5 === 0, lit("true")).when(k % 5 === 1, lit("FALSE")).when(k % 5 === 2, lit("T"))
        .when(k % 5 === 3, lit("2")).otherwise(lit(null)).as("active_raw"),
      when(k % 2 === 0, lit("Ketamine")).otherwise(lit("Spravato")).as("care_type"),
      when(k % 10 === 3, lit(null)).otherwise(concat(k.cast("string"), lit(".0"))).as("patient_id_raw"))
  }

  val patientsSql: String =
    s"""patients AS (
       |  SELECT c_custkey,
       |    CASE WHEN c_custkey % 10 = 3 THEN NULL ELSE CAST(c_custkey AS VARCHAR) END AS patient_id,
       |    CASE WHEN c_custkey % 7 = 2 THEN NULL ELSE concat('CH', CAST(c_custkey AS VARCHAR)) END AS patient_chart,
       |    CASE WHEN c_custkey % 5 = 0 THEN NULL
       |         WHEN c_custkey % 21 = 0 THEN concat('dup', CAST(c_custkey % 3 AS VARCHAR), '@Example.COM ')
       |         WHEN c_custkey % 2 = 1 THEN concat('user', CAST(c_custkey AS VARCHAR), '@Example.COM ')
       |         ELSE concat('user', CAST(c_custkey + 1 AS VARCHAR), '@nomatch.com ') END AS email_raw,
       |    c_name, c_acctbal, c_nationkey, c_mktsegment,
       |    CASE WHEN c_custkey % 6 = 0 THEN NULL ELSE concat('First', CAST(c_custkey % 23 AS VARCHAR)) END AS first_name,
       |    CASE WHEN c_custkey % 6 = 0 THEN concat('PF', CAST(c_custkey % 23 AS VARCHAR)) END AS preferred_first_name,
       |    CASE WHEN c_custkey % 5 = 0 THEN concat('M', CAST(c_custkey % 7 AS VARCHAR)) END AS middle_name,
       |    CASE WHEN c_custkey % 5 <> 0 AND c_custkey % 10 = 1 THEN concat('PM', CAST(c_custkey % 7 AS VARCHAR)) END AS preferred_middle_name,
       |    CASE WHEN c_custkey % 9 = 4 THEN NULL ELSE concat('Last', CAST(c_custkey % 31 AS VARCHAR)) END AS last_name,
       |    CASE WHEN c_custkey % 9 = 4 THEN concat('PL', CAST(c_custkey % 31 AS VARCHAR)) END AS preferred_last_name,
       |    CASE WHEN c_custkey % 3 = 0 THEN 'F' WHEN c_custkey % 3 = 1 THEN 'M' END AS gender,
       |    CASE WHEN c_custkey % 29 = 0 THEN make_date(CAST(1952 + (c_custkey % 12) * 4 AS INT), 2, 29)
       |         ELSE make_date(CAST(1950 + c_custkey % 50 AS INT), CAST(1 + c_custkey % 12 AS INT), CAST(1 + c_custkey % 28 AS INT)) END AS dob,
       |    concat(CAST(1 + c_custkey % 999 AS VARCHAR), ' Main St') AS address1,
       |    CASE WHEN c_custkey % 4 = 0 THEN concat('Apt ', CAST(c_custkey % 20 AS VARCHAR)) END AS address2,
       |    concat('City', CAST(c_custkey % 37 AS VARCHAR)) AS city,
       |    concat('S', CAST(c_custkey % 50 AS VARCHAR)) AS state_code,
       |    lpad(CAST(c_custkey % 99999 AS VARCHAR), 5, '0') AS zip,
       |    CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE concat('555-', lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')) END AS home_phone,
       |    concat('555-', lpad(CAST((c_custkey + 7) % 10000 AS VARCHAR), 4, '0')) AS phone_alt,
       |    CASE WHEN c_custkey % 7 = 0 THEN concat('556-', lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')) END AS other_phone,
       |    concat('Facility ', CAST(c_custkey % 5 AS VARCHAR)) AS primary_facility,
       |    concat('FAC', CAST(c_custkey % 5 AS VARCHAR)) AS primary_facility_code,
       |    CAST(c_custkey % 9 AS BIGINT) AS spravatos_to_date,
       |    CAST(c_custkey % 11 AS BIGINT) AS ketamines_to_date,
       |    CAST(c_custkey % 20 AS BIGINT) AS treatments_to_date,
       |    CAST(c_custkey % 4 AS BIGINT) AS future_treatment_count,
       |    CAST(c_custkey % 3 AS BIGINT) AS future_follow_up_count,
       |    CASE WHEN c_custkey % 8 < 4 THEN make_timestamp(($BaseMs + (c_custkey % 200) * $DayMs) * 1000) END AS next_treatment,
       |    CASE WHEN c_custkey % 8 >= 4 AND c_custkey % 8 < 6 THEN make_timestamp(($BaseMs + (c_custkey % 150) * $DayMs) * 1000) END AS max_scheduled_treatment,
       |    CASE WHEN c_custkey % 2 = 0 THEN make_timestamp(($BaseMs + (c_custkey % 90) * $DayMs + 3600000) * 1000) END AS next_follow_up,
       |    CASE WHEN c_custkey % 10 < 5 THEN make_timestamp(($BaseMs - (c_custkey % 400) * $DayMs) * 1000) END AS first_treatment,
       |    CASE WHEN c_custkey % 10 >= 5 AND c_custkey % 10 < 8 THEN make_timestamp(($BaseMs - (c_custkey % 300) * $DayMs) * 1000) END AS first_initial_consult,
       |    CASE c_custkey % 6 WHEN 0 THEN 'Y' WHEN 1 THEN 'no' WHEN 2 THEN ' 1 '
       |         WHEN 3 THEN '0' WHEN 4 THEN 'maybe' END AS started_raw,
       |    CASE c_custkey % 5 WHEN 0 THEN 'true' WHEN 1 THEN 'FALSE' WHEN 2 THEN 'T'
       |         WHEN 3 THEN '2' END AS active_raw,
       |    CASE WHEN c_custkey % 2 = 0 THEN 'Ketamine' ELSE 'Spravato' END AS care_type,
       |    CASE WHEN c_custkey % 10 = 3 THEN NULL ELSE concat(CAST(c_custkey AS VARCHAR), '.0') END AS patient_id_raw
       |  FROM customer
       |)""".stripMargin

  // ---------- id_map (from customer; tier-1 keys + tier-2 chart keys) ----------
  def idMap(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val k = col("c_custkey")
    val updated = timestamp_millis(lit(BaseMs) + (k % 50) * DayMs)
    val tier1 = c.filter(k % 3 =!= 0).select(
      lit("contacts").as("hubspot_object_type"),
      k.cast("string").as("natural_key"),
      concat(lit("HS-"), k.cast("string")).as("hubspot_id"),
      updated.as("updated_at"))
    val tier2 = c.filter(k % 6 === 0).select(
      lit("contacts").as("hubspot_object_type"),
      concat(lit("CH"), k.cast("string")).as("natural_key"),
      concat(lit("HSC-"), k.cast("string")).as("hubspot_id"),
      updated.as("updated_at"))
    tier1.unionByName(tier2)
  }

  val idMapSql: String =
    s"""id_map AS (
       |  SELECT 'contacts' AS hubspot_object_type,
       |    CAST(c_custkey AS VARCHAR) AS natural_key,
       |    concat('HS-', CAST(c_custkey AS VARCHAR)) AS hubspot_id,
       |    make_timestamp(($BaseMs + (c_custkey % 50) * $DayMs) * 1000) AS updated_at
       |  FROM customer WHERE c_custkey % 3 <> 0
       |  UNION ALL
       |  SELECT 'contacts', concat('CH', CAST(c_custkey AS VARCHAR)),
       |    concat('HSC-', CAST(c_custkey AS VARCHAR)),
       |    make_timestamp(($BaseMs + (c_custkey % 50) * $DayMs) * 1000)
       |  FROM customer WHERE c_custkey % 6 = 0
       |)""".stripMargin

  // ---------- target_state (HubSpot-side snapshot; odd custkeys) ----------
  def targetState(spark: SparkSession, sfDir: String): DataFrame = {
    val k = col("c_custkey")
    Tables.customer(spark, sfDir).filter(k % 2 === 1).select(
      lit("contacts").as("object_type"),
      concat(lit("HS-"), k.cast("string")).as("hubspot_id"),
      when(k % 5 === 0, lit("true")).otherwise(lit("false")).as("amd_synced"),
      when(k % 11 === 0, lit("true")).otherwise(lit("false")).as("roi_manual_override"),
      // odd multiples of 7 share a "dup" address (ambiguity cases);
      // everything else is unique per key
      when(k % 5 === 0, lit(null))
        .when(k % 7 === 0, concat(lit("dup"), (k % 3).cast("string"), lit("@example.com")))
        .otherwise(concat(lit("user"), k.cast("string"), lit("@example.com")))
        .as("email"),
      k.cast("string").as("patient_id"),
      concat(lit("CH"), k.cast("string")).as("patient_chart"),
      // composite-tier attributes (README.md:38-42): same k-modular
      // formulas as `patients`, so tier-2/3 matches exist by construction
      // for odd keys whose email tier misses
      when(k % 6 === 0, lit(null)).otherwise(concat(lit("First"), (k % 23).cast("string"))).as("first_name"),
      when(k % 9 === 4, lit(null)).otherwise(concat(lit("Last"), (k % 31).cast("string"))).as("last_name"),
      when(k % 29 === 0, make_date((lit(1952) + (k % 12) * 4).cast("int"), lit(2), lit(29)))
        .otherwise(make_date((lit(1950) + k % 50).cast("int"),
          (lit(1) + k % 12).cast("int"), (lit(1) + k % 28).cast("int"))).as("dob"),
      concat((lit(1) + k % 999).cast("string"), lit(" Main St")).as("address1"),
      when(k % 4 === 0, concat(lit("Apt "), (k % 20).cast("string"))).otherwise(lit(null)).as("address2"),
      concat(lit("City"), (k % 37).cast("string")).as("city"),
      concat(lit("S"), (k % 50).cast("string")).as("state_code"),
      lpad((k % 99999).cast("string"), 5, "0").as("zip"))
  }

  val targetStateSql: String =
    """target_state AS (
      |  SELECT 'contacts' AS object_type,
      |    concat('HS-', CAST(c_custkey AS VARCHAR)) AS hubspot_id,
      |    CASE WHEN c_custkey % 5 = 0 THEN 'true' ELSE 'false' END AS amd_synced,
      |    CASE WHEN c_custkey % 11 = 0 THEN 'true' ELSE 'false' END AS roi_manual_override,
      |    CASE WHEN c_custkey % 5 = 0 THEN NULL
      |         WHEN c_custkey % 7 = 0 THEN concat('dup', CAST(c_custkey % 3 AS VARCHAR), '@example.com')
      |         ELSE concat('user', CAST(c_custkey AS VARCHAR), '@example.com') END AS email,
      |    CAST(c_custkey AS VARCHAR) AS patient_id,
      |    concat('CH', CAST(c_custkey AS VARCHAR)) AS patient_chart,
      |    CASE WHEN c_custkey % 6 = 0 THEN NULL ELSE concat('First', CAST(c_custkey % 23 AS VARCHAR)) END AS first_name,
      |    CASE WHEN c_custkey % 9 = 4 THEN NULL ELSE concat('Last', CAST(c_custkey % 31 AS VARCHAR)) END AS last_name,
      |    CASE WHEN c_custkey % 29 = 0 THEN make_date(CAST(1952 + (c_custkey % 12) * 4 AS INT), 2, 29)
      |         ELSE make_date(CAST(1950 + c_custkey % 50 AS INT), CAST(1 + c_custkey % 12 AS INT), CAST(1 + c_custkey % 28 AS INT)) END AS dob,
      |    concat(CAST(1 + c_custkey % 999 AS VARCHAR), ' Main St') AS address1,
      |    CASE WHEN c_custkey % 4 = 0 THEN concat('Apt ', CAST(c_custkey % 20 AS VARCHAR)) END AS address2,
      |    concat('City', CAST(c_custkey % 37 AS VARCHAR)) AS city,
      |    concat('S', CAST(c_custkey % 50 AS VARCHAR)) AS state_code,
      |    lpad(CAST(c_custkey % 99999 AS VARCHAR), 5, '0') AS zip
      |  FROM customer WHERE c_custkey % 2 = 1
      |)""".stripMargin

  // ---------- rois (from orders) ----------
  def rois(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    o.select(
      col("o_orderkey").as("roi_id"),
      when(col("o_custkey") % 4 === 1, lit(null))
        .otherwise(col("o_custkey").cast("string")).as("roi_patient_id"),
      concat(lit("CH"), col("o_custkey").cast("string")).as("roi_patient_chart"),
      when(col("o_orderstatus") === "F", lit("Processed"))
        .when(col("o_orderstatus") === "P", lit("Pending"))
        .otherwise(lit("Open")).as("status"),
      when(col("o_orderstatus") === "F" && col("o_orderkey") % 9 =!= 0, col("o_orderdate"))
        .otherwise(lit(null).cast("timestamp")).as("processed_at"),
      col("o_totalprice").as("amount"),
      col("o_orderdate"),
      // Round-2 widening to the reference ROI surface (main.py:635-661,
      // README.md:62-76): template, provider block, signer identity,
      // accepted/completed timestamps — all k-modular derivations.
      (col("o_orderkey") % 7 + 1).cast("long").as("template_id"),
      concat(lit("Template "), (col("o_orderkey") % 7 + 1).cast("string")).as("template_name"),
      concat(lit("Dr. Prov"), (col("o_orderkey") % 53).cast("string")).as("provider_name"),
      when(col("o_orderkey") % 4 === 0, lit("Psychiatry")).when(col("o_orderkey") % 4 === 1, lit("Neurology"))
        .when(col("o_orderkey") % 4 === 2, lit("Primary Care")).otherwise(lit("Anesthesiology")).as("provider_specialty"),
      when(col("o_orderkey") % 5 === 0, lit(null))
        .otherwise(concat(lit("prov"), (col("o_orderkey") % 53).cast("string"), lit("@clinic.org"))).as("provider_email"),
      concat(lit("555-01"), lpad((col("o_orderkey") % 100).cast("string"), 2, "0")).as("provider_phone"),
      when(col("o_orderkey") % 3 === 0, concat(lit("555-09"), lpad((col("o_orderkey") % 100).cast("string"), 2, "0")))
        .otherwise(lit(null)).as("provider_fax"),
      concat(lit("Patient "), (col("o_custkey") % 100).cast("string")).as("patient_name"),
      make_date((lit(1950) + col("o_custkey") % 50).cast("int"),
        (lit(1) + col("o_custkey") % 12).cast("int"), (lit(1) + col("o_custkey") % 28).cast("int")).as("patient_dob"),
      timestamp_millis(lit(BaseMs) + (col("o_orderkey") % 500) * 3600000L).as("accepted_at"),
      when(col("o_orderkey") % 6 < 3, timestamp_millis(lit(BaseMs) + (col("o_orderkey") % 500) * 3600000L + 7200000L))
        .otherwise(lit(null).cast("timestamp")).as("completed_at"))
  }

  val roisSql: String =
    s"""rois AS (
       |  SELECT o_orderkey AS roi_id,
       |    CASE WHEN o_custkey % 4 = 1 THEN NULL ELSE CAST(o_custkey AS VARCHAR) END AS roi_patient_id,
       |    concat('CH', CAST(o_custkey AS VARCHAR)) AS roi_patient_chart,
       |    CASE WHEN o_orderstatus = 'F' THEN 'Processed' WHEN o_orderstatus = 'P' THEN 'Pending' ELSE 'Open' END AS status,
       |    CASE WHEN o_orderstatus = 'F' AND o_orderkey % 9 <> 0 THEN o_orderdate ELSE NULL END AS processed_at,
       |    o_totalprice AS amount, o_orderdate,
       |    CAST(o_orderkey % 7 + 1 AS BIGINT) AS template_id,
       |    concat('Template ', CAST(o_orderkey % 7 + 1 AS VARCHAR)) AS template_name,
       |    concat('Dr. Prov', CAST(o_orderkey % 53 AS VARCHAR)) AS provider_name,
       |    CASE WHEN o_orderkey % 4 = 0 THEN 'Psychiatry' WHEN o_orderkey % 4 = 1 THEN 'Neurology'
       |         WHEN o_orderkey % 4 = 2 THEN 'Primary Care' ELSE 'Anesthesiology' END AS provider_specialty,
       |    CASE WHEN o_orderkey % 5 = 0 THEN NULL
       |         ELSE concat('prov', CAST(o_orderkey % 53 AS VARCHAR), '@clinic.org') END AS provider_email,
       |    concat('555-01', lpad(CAST(o_orderkey % 100 AS VARCHAR), 2, '0')) AS provider_phone,
       |    CASE WHEN o_orderkey % 3 = 0 THEN concat('555-09', lpad(CAST(o_orderkey % 100 AS VARCHAR), 2, '0')) END AS provider_fax,
       |    concat('Patient ', CAST(o_custkey % 100 AS VARCHAR)) AS patient_name,
       |    make_date(CAST(1950 + o_custkey % 50 AS INT), CAST(1 + o_custkey % 12 AS INT), CAST(1 + o_custkey % 28 AS INT)) AS patient_dob,
       |    make_timestamp(($BaseMs + (o_orderkey % 500) * 3600000) * 1000) AS accepted_at,
       |    CASE WHEN o_orderkey % 6 < 3 THEN make_timestamp(($BaseMs + (o_orderkey % 500) * 3600000 + 7200000) * 1000) END AS completed_at
       |  FROM orders
       |)""".stripMargin

  // ---------- dlq (from orders; attempt counter fixture) ----------
  def dlq(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val k = col("o_orderkey")
    o.filter(k % 13 === 0).select(
      timestamp_millis(lit(BaseMs) + k * 3600000L).as("ts"),
      when(k % 2 === 0, lit("patients")).otherwise(lit("rois")).as("job_type"),
      (k % 40).cast("string").as("natural_key"),
      lit("contacts").as("hubspot_object_type"),
      concat(lit("{\"k\":"), k.cast("string"), lit("}")).as("payload"),
      when(k % 3 === 0, lit("HTTP 500")).otherwise(lit("HTTP 429")).as("error"),
      (lit(1L) + k % 6).as("attempt"))
  }

  val dlqSql: String =
    s"""dlq AS (
       |  SELECT make_timestamp(($BaseMs + o_orderkey * 3600000) * 1000) AS ts,
       |    CASE WHEN o_orderkey % 2 = 0 THEN 'patients' ELSE 'rois' END AS job_type,
       |    CAST(o_orderkey % 40 AS VARCHAR) AS natural_key,
       |    'contacts' AS hubspot_object_type,
       |    concat('{"k":', CAST(o_orderkey AS VARCHAR), '}') AS payload,
       |    CASE WHEN o_orderkey % 3 = 0 THEN 'HTTP 500' ELSE 'HTTP 429' END AS error,
       |    1 + o_orderkey % 6 AS attempt
       |  FROM orders WHERE o_orderkey % 13 = 0
       |)""".stripMargin

  // ---------- run ledger (from nation; success/failed interleaved) ----------
  def ledger(spark: SparkSession, sfDir: String): DataFrame = {
    val n = Tables.nation(spark, sfDir)
    val k = col("n_nationkey").cast("long")
    n.select(
      concat(lit("run-"), k.cast("string")).as("run_id"),
      timestamp_millis(lit(BaseMs) + k * DayMs).as("started_at"),
      timestamp_millis(lit(BaseMs) + k * DayMs + 3600000L).as("finished_at"),
      when(k % 2 === 0, lit("patients")).otherwise(lit("rois")).as("job_type"),
      timestamp_millis(lit(BaseMs) + (k - 1) * DayMs).as("high_watermark"),
      (k * 100).as("read_count"),
      (k * 60).as("updated_count"),
      (k * 30).as("created_count"),
      (k * 7).as("skipped_count"),
      (k * 3).as("error_count"),
      when(k % 3 === 0, lit("failed")).otherwise(lit("success")).as("status"))
  }

  val ledgerSql: String =
    s"""ledger AS (
       |  SELECT concat('run-', CAST(n_nationkey AS VARCHAR)) AS run_id,
       |    make_timestamp(($BaseMs + CAST(n_nationkey AS BIGINT) * $DayMs) * 1000) AS started_at,
       |    make_timestamp(($BaseMs + CAST(n_nationkey AS BIGINT) * $DayMs + 3600000) * 1000) AS finished_at,
       |    CASE WHEN n_nationkey % 2 = 0 THEN 'patients' ELSE 'rois' END AS job_type,
       |    make_timestamp(($BaseMs + (CAST(n_nationkey AS BIGINT) - 1) * $DayMs) * 1000) AS high_watermark,
       |    CAST(n_nationkey AS BIGINT) * 100 AS read_count,
       |    CAST(n_nationkey AS BIGINT) * 60 AS updated_count,
       |    CAST(n_nationkey AS BIGINT) * 30 AS created_count,
       |    CAST(n_nationkey AS BIGINT) * 7 AS skipped_count,
       |    CAST(n_nationkey AS BIGINT) * 3 AS error_count,
       |    CASE WHEN n_nationkey % 3 = 0 THEN 'failed' ELSE 'success' END AS status
       |  FROM nation
       |)""".stripMargin

  /** Compose a `WITH ...` prefix from the named CTEs. */
  def withCtes(ctes: String*): String =
    if (ctes.isEmpty) "" else ctes.mkString("WITH ", ",\n", "\n")
}
