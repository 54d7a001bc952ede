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
      col("c_name"), col("c_acctbal"), col("c_nationkey"), col("c_mktsegment"))
  }

  val patientsSql: String =
    """patients AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 10 = 3 THEN NULL ELSE CAST(c_custkey AS VARCHAR) END AS patient_id,
      |    CASE WHEN c_custkey % 7 = 2 THEN NULL ELSE concat('CH', CAST(c_custkey AS VARCHAR)) END AS patient_chart,
      |    CASE WHEN c_custkey % 5 = 0 THEN NULL
      |         WHEN c_custkey % 21 = 0 THEN concat('dup', CAST(c_custkey % 3 AS VARCHAR), '@Example.COM ')
      |         WHEN c_custkey % 2 = 1 THEN concat('user', CAST(c_custkey AS VARCHAR), '@Example.COM ')
      |         ELSE concat('user', CAST(c_custkey + 1 AS VARCHAR), '@nomatch.com ') END AS email_raw,
      |    c_name, c_acctbal, c_nationkey, c_mktsegment
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
      concat(lit("CH"), k.cast("string")).as("patient_chart"))
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
      |    concat('CH', CAST(c_custkey AS VARCHAR)) AS patient_chart
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
      col("o_orderdate"))
  }

  val roisSql: String =
    """rois AS (
      |  SELECT o_orderkey AS roi_id,
      |    CASE WHEN o_custkey % 4 = 1 THEN NULL ELSE CAST(o_custkey AS VARCHAR) END AS roi_patient_id,
      |    concat('CH', CAST(o_custkey AS VARCHAR)) AS roi_patient_chart,
      |    CASE WHEN o_orderstatus = 'F' THEN 'Processed' WHEN o_orderstatus = 'P' THEN 'Pending' ELSE 'Open' END AS status,
      |    CASE WHEN o_orderstatus = 'F' AND o_orderkey % 9 <> 0 THEN o_orderdate ELSE NULL END AS processed_at,
      |    o_totalprice AS amount, o_orderdate
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
