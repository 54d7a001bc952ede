package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.expr.Scalars
import graft.model.{Fixtures, Tables}

/** Core relational operators — SURVEY.md §2a-2f rebuilt Spark-first.
  *
  * Scale posture (the 100 TB contract):
  *  - scans are bare parquet reads; filters/projections sit directly on
  *    them so Catalyst pushes predicates + prunes columns into the scan;
  *  - the id-map / target-state sides of every lookup join are
  *    `broadcast()` hinted (they are small *here*; the library methods
  *    take the DataFrame so a caller with a huge id map simply omits the
  *    hint and gets a shuffle join — SURVEY.md §7 risk (f));
  *  - nothing collects to the driver; every op composes lazily.
  */
object Relational {

  // ---------- S1: full scan ----------
  val scanFull: Q = Q("scan_full",
    (spark, sfDir) => Tables.customer(spark, sfDir).orderBy("c_custkey"),
    Some("SELECT * FROM customer ORDER BY c_custkey"))

  // ---------- S2/F1: watermark delta scan (main.py:537) ----------
  // The predicate is applied to the raw parquet column via eventsDelta,
  // so it pushes into the scan as a row-group filter — at 100 TB only
  // row groups past the watermark are read.
  val scanDelta: Q = Q("scan_delta",
    (spark, sfDir) =>
      Tables.eventsDelta(spark, sfDir,
          Some(1704240000000000L)) // 2024-01-03T00:00:00Z in µs
        .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy("event_id"),
    Some("""SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
            |FROM events WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
            |ORDER BY event_id""".stripMargin))

  // ---- oracle-SQL fragment generators (DuckDB side of §2g scalars) ----
  /** DuckDB twin of Scalars.tolerantBool (X2) applied to expression `e`. */
  private def boolSql(e: String): String = {
    val s = s"lower(trim($e))"
    s"CASE WHEN $s IS NULL OR $s = '' THEN NULL " +
      s"WHEN $s IN ('true','1','y','yes','t') THEN 'true' " +
      s"WHEN $s IN ('false','0','n','no','f') THEN 'false' " +
      "WHEN regexp_full_match(" + s + ", '-?[0-9]+(\\.[0-9]+)?') THEN " +
      s"CASE WHEN CAST($s AS DOUBLE) <> 0.0 THEN 'true' ELSE 'false' END " +
      s"ELSE $s END"
  }

  /** DuckDB twin of Scalars.nextBirthday's anniversary-in-year-y with the
    * Feb-29 → Mar-1 policy (leapness of the literal year decided here). */
  private def annivSql(d: String, y: Int): String = {
    val leap = (y % 4 == 0 && y % 100 != 0) || y % 400 == 0
    if (leap) s"make_date($y, month($d)::INT, day($d)::INT)"
    else s"CASE WHEN month($d) = 2 AND day($d) = 29 THEN make_date($y, 3, 1) " +
      s"ELSE make_date($y, month($d)::INT, day($d)::INT) END"
  }

  private def nextBirthdaySql(d: String, todayIso: String): String = {
    val y = todayIso.take(4).toInt
    s"CASE WHEN ${annivSql(d, y)} >= DATE '$todayIso' THEN ${annivSql(d, y)} " +
      s"ELSE ${annivSql(d, y + 1)} END"
  }

  /** DuckDB twin of Scalars.easternDateString (X4). */
  private def easternDateSql(e: String): String =
    s"strftime(timezone('America/New_York', timezone('UTC', $e)), '%Y-%m-%d')"

  // ---------- P1: patient → contact projection (main.py:555-611) ----------
  // The FULL README.md:43-55 / main.py:555-611 property surface: every
  // mapped field, the Preferred* fallbacks, the derived scalars
  // (next_birthday X5, eastern date renders X4, epoch millis X3, tolerant
  // bools X2, format_identifier X6), the lock flag, and the tiered
  // natural key. `today` is injected as a literal for determinism.
  val projectPatient: Q = Q("project_patient",
    (spark, sfDir) => {
      val p = Fixtures.patients(spark, sfDir)
      val email = Scalars.emailNorm(col("email_raw"))
      val pid = Scalars.formatIdentifier(col("patient_id_raw"))
      val chart = Scalars.formatIdentifier(col("patient_chart"))
      val today = lit("2026-08-12").cast("date")
      p.select(
        col("c_custkey"),
        email.as("email"),
        col("first_name").as("firstname"),
        col("preferred_first_name"),
        Scalars.coalesceBlankFalsy(col("middle_name"), col("preferred_middle_name")).as("middlename"),
        Scalars.coalesceBlankFalsy(col("last_name"), col("preferred_last_name")).as("lastname"),
        col("gender"),
        col("dob").cast("string").as("date_of_birth"),
        graft.expr.ColumnOps.nextBirthday(col("dob"), today).as("next_birthday"),
        col("address1").as("address"),
        col("address2").as("street_address_line_2"),
        col("city"),
        col("state_code").as("state"),
        col("zip"),
        Scalars.coalesceBlankFalsy(col("home_phone"), col("phone_alt")).as("phone"),
        col("other_phone").as("otherphone"),
        pid.as("patient_id"),
        chart.as("patient_chart"),
        col("primary_facility"),
        col("primary_facility_code"),
        col("spravatos_to_date").as("spravatostodate"),
        col("ketamines_to_date").as("ketaminestodate"),
        col("treatments_to_date").as("treatmentstodate"),
        col("future_treatment_count"),
        col("future_follow_up_count"),
        Scalars.easternDateString(coalesce(col("next_treatment"), col("max_scheduled_treatment"))).as("next_treatment_date"),
        Scalars.easternDateString(col("next_follow_up")).as("next_follow_up_date"),
        // exact reference property name, trailing underscore included
        // (main.py:601: "first_initial_consult__treatment_")
        unix_millis(coalesce(col("first_treatment"), col("first_initial_consult"))).as("first_initial_consult__treatment_"),
        Scalars.tolerantBool(col("started_raw")).as("started"),
        Scalars.tolerantBool(col("active_raw")).as("active_treatment"),
        col("care_type"),
        lit("customer").as("lifecyclestage"),
        lit(true).as("amd_synced"),
        // natural-key tiers: ID → Chart → Email → hash8(row) (README.md:43-55)
        coalesce(pid, chart, email, Scalars.hash8(col("c_name"))).as("natural_key"))
        .orderBy("c_custkey")
    },
    Some(Fixtures.withCtes(Fixtures.patientsSql) +
      s"""SELECT c_custkey,
         |  nullif(lower(trim(email_raw)), '') AS email,
         |  first_name AS firstname,
         |  preferred_first_name,
         |  coalesce(middle_name, preferred_middle_name) AS middlename,
         |  coalesce(last_name, preferred_last_name) AS lastname,
         |  gender,
         |  CAST(dob AS VARCHAR) AS date_of_birth,
         |  ${nextBirthdaySql("dob", "2026-08-12")} AS next_birthday,
         |  address1 AS address,
         |  address2 AS street_address_line_2,
         |  city,
         |  state_code AS state,
         |  zip,
         |  coalesce(home_phone, phone_alt) AS phone,
         |  other_phone AS otherphone,
         |  regexp_replace(patient_id_raw, '\\.0$$', '') AS patient_id,
         |  patient_chart,
         |  primary_facility,
         |  primary_facility_code,
         |  spravatos_to_date AS spravatostodate,
         |  ketamines_to_date AS ketaminestodate,
         |  treatments_to_date AS treatmentstodate,
         |  future_treatment_count,
         |  future_follow_up_count,
         |  ${easternDateSql("coalesce(next_treatment, max_scheduled_treatment)")} AS next_treatment_date,
         |  ${easternDateSql("next_follow_up")} AS next_follow_up_date,
         |  epoch_ms(coalesce(first_treatment, first_initial_consult)) AS "first_initial_consult__treatment_",
         |  ${boolSql("started_raw")} AS started,
         |  ${boolSql("active_raw")} AS active_treatment,
         |  care_type,
         |  'customer' AS lifecyclestage,
         |  TRUE AS amd_synced,
         |  coalesce(regexp_replace(patient_id_raw, '\\.0$$', ''), patient_chart,
         |           nullif(lower(trim(email_raw)), ''), substr(sha256(c_name), 1, 8)) AS natural_key
         |FROM patients ORDER BY c_custkey""".stripMargin))

  // ---------- P2: ROI projection (main.py:635-661) ----------
  // The full 15-field README.md:62-76 mapping: template, provider block,
  // signer identity (DOB → epoch millis with the reference's
  // naive-as-Eastern rule, main.py:155), accepted/completed epoch millis,
  // format_identifier-canonicalized ids.
  val projectRoi: Q = Q("project_roi",
    (spark, sfDir) =>
      Fixtures.rois(spark, sfDir).select(
        col("roi_id"),
        Scalars.formatIdentifier(col("roi_id").cast("string")).as("natural_key"),
        col("template_name").as("roi_type"),
        col("template_id").as("amd_template_id"),
        Scalars.formatIdentifier(col("roi_patient_id")).as("patient_id"),
        Scalars.formatIdentifier(col("roi_patient_chart")).as("patient_chart"),
        unix_millis(col("accepted_at")).as("accepted_datetime"),
        unix_millis(col("completed_at")).as("completed_date"),
        col("patient_name").as("patient_signed_name"),
        Scalars.epochMillisFromEasternDate(col("patient_dob").cast("string")).as("patient_signed_dob"),
        col("provider_name").as("raw_provider_name"),
        col("provider_specialty").as("raw_provider_specialty"),
        col("provider_email").as("raw_provider_email"),
        col("provider_phone").as("raw_provider_phone"),
        col("provider_fax").as("raw_provider_fax"))
        .orderBy("roi_id"),
    Some(Fixtures.withCtes(Fixtures.roisSql) +
      """SELECT roi_id,
        |  CAST(roi_id AS VARCHAR) AS natural_key,
        |  template_name AS roi_type,
        |  template_id AS amd_template_id,
        |  roi_patient_id AS patient_id,
        |  roi_patient_chart AS patient_chart,
        |  epoch_ms(accepted_at) AS accepted_datetime,
        |  epoch_ms(completed_at) AS completed_date,
        |  patient_name AS patient_signed_name,
        |  epoch_ms(timezone('UTC', timezone('America/New_York', patient_dob::TIMESTAMP))) AS patient_signed_dob,
        |  provider_name AS raw_provider_name,
        |  provider_specialty AS raw_provider_specialty,
        |  provider_email AS raw_provider_email,
        |  provider_phone AS raw_provider_phone,
        |  provider_fax AS raw_provider_fax
        |FROM rois ORDER BY roi_id""".stripMargin))

  // ---------- P3: blank-as-null drop (main.py:610,656) ----------
  val filterBlanks: Q = Q("filter_blanks",
    (spark, sfDir) => {
      val k = col("c_custkey")
      Tables.customer(spark, sfDir)
        .withColumn("seg_raw",
          when(k % 4 === 0, lit("")).when(k % 4 === 1, lit("  "))
            .otherwise(col("c_mktsegment")))
        .filter(length(trim(col("seg_raw"))) > 0)
        .select(k, trim(col("seg_raw")).as("segment"))
        .orderBy("c_custkey")
    },
    Some("""WITH t AS (
           |  SELECT c_custkey,
           |    CASE WHEN c_custkey % 4 = 0 THEN '' WHEN c_custkey % 4 = 1 THEN '  '
           |         ELSE c_mktsegment END AS seg_raw
           |  FROM customer)
           |SELECT c_custkey, trim(seg_raw) AS segment FROM t
           |WHERE length(trim(seg_raw)) > 0 ORDER BY c_custkey""".stripMargin))

  // ---------- F2: processed-ROI skip (main.py:736-742) ----------
  val filterProcessed: Q = Q("filter_processed",
    (spark, sfDir) =>
      Fixtures.rois(spark, sfDir)
        .filter(!(lower(col("status")) === "processed" && col("processed_at").isNotNull))
        .select(col("roi_id"), col("status"),
          unix_millis(col("processed_at")).as("processed_ms"))
        .orderBy("roi_id"),
    Some(Fixtures.withCtes(Fixtures.roisSql) +
      """SELECT roi_id, status, epoch_ms(processed_at) AS processed_ms
        |FROM rois
        |WHERE NOT (lower(status) = 'processed' AND processed_at IS NOT NULL)
        |ORDER BY roi_id""".stripMargin))

  // ---------- F3: ambiguity guard split (main.py:688-692) ----------
  val filterAmbiguousSplit: Q = Q("filter_ambiguous_split",
    (spark, sfDir) => {
      val p = Fixtures.patients(spark, sfDir)
        .withColumn("email", Scalars.emailNorm(col("email_raw")))
        .withColumn("nk", coalesce(col("patient_id"), col("patient_chart")))
      val im = Fixtures.idMap(spark, sfDir)
        .filter(col("hubspot_object_type") === "contacts")
        .select(col("natural_key"), col("hubspot_id"))
      p.join(broadcast(im), p("nk") === im("natural_key"), "left")
        .select(col("c_custkey"),
          when(col("hubspot_id").isNull && col("email").isNull, lit("dlq"))
            .otherwise(lit("ready")).as("branch"))
        .orderBy("c_custkey")
    },
    Some(Fixtures.withCtes(Fixtures.patientsSql, Fixtures.idMapSql) +
      """SELECT p.c_custkey,
        |  CASE WHEN im.hubspot_id IS NULL AND nullif(lower(trim(p.email_raw)),'') IS NULL
        |       THEN 'dlq' ELSE 'ready' END AS branch
        |FROM patients p
        |LEFT JOIN id_map im
        |  ON im.hubspot_object_type = 'contacts'
        | AND im.natural_key = coalesce(p.patient_id, p.patient_chart)
        |ORDER BY p.c_custkey""".stripMargin))

  // ---------- J1: id-map equi lookup (main.py:373-389) ----------
  val joinIdMap: Q = Q("join_idmap",
    (spark, sfDir) => {
      val p = Fixtures.patients(spark, sfDir)
      val im = Fixtures.idMap(spark, sfDir)
        .filter(col("hubspot_object_type") === "contacts")
        .select(col("natural_key"), col("hubspot_id"))
      p.join(broadcast(im), p("patient_id") === im("natural_key"), "left")
        .select(col("c_custkey"), col("hubspot_id"))
        .orderBy("c_custkey")
    },
    Some(Fixtures.withCtes(Fixtures.patientsSql, Fixtures.idMapSql) +
      """SELECT p.c_custkey, im.hubspot_id
        |FROM patients p
        |LEFT JOIN id_map im
        |  ON im.hubspot_object_type = 'contacts' AND im.natural_key = p.patient_id
        |ORDER BY p.c_custkey""".stripMargin))

  // ---------- F4/J2: manual-override skip (main.py:776-785) ----------
  val joinOverrideSkip: Q = Q("join_override_skip",
    (spark, sfDir) => {
      val p = Fixtures.patients(spark, sfDir)
      val im = Fixtures.idMap(spark, sfDir)
        .filter(col("hubspot_object_type") === "contacts")
        .select(col("natural_key"), col("hubspot_id"))
      val st = Fixtures.targetState(spark, sfDir)
        .select(col("hubspot_id").as("st_id"), col("roi_manual_override"))
      p.join(broadcast(im), p("patient_id") === im("natural_key"), "left")
        .join(broadcast(st), col("hubspot_id") === col("st_id"), "left")
        .filter(coalesce(col("roi_manual_override"), lit("false")) =!= "true")
        .select(col("c_custkey"), col("hubspot_id"))
        .orderBy("c_custkey")
    },
    Some(Fixtures.withCtes(Fixtures.patientsSql, Fixtures.idMapSql, Fixtures.targetStateSql) +
      """SELECT p.c_custkey, im.hubspot_id
        |FROM patients p
        |LEFT JOIN id_map im
        |  ON im.hubspot_object_type = 'contacts' AND im.natural_key = p.patient_id
        |LEFT JOIN target_state st ON st.hubspot_id = im.hubspot_id
        |WHERE coalesce(st.roi_manual_override, 'false') <> 'true'
        |ORDER BY p.c_custkey""".stripMargin))

  // ---------- F5: field locking (main.py:674-687) ----------
  val projectLocked: Q = Q("project_locked",
    (spark, sfDir) => {
      val p = Fixtures.patients(spark, sfDir)
      val im = Fixtures.idMap(spark, sfDir)
        .filter(col("hubspot_object_type") === "contacts")
        .select(col("natural_key"), col("hubspot_id"))
      val st = Fixtures.targetState(spark, sfDir)
        .select(col("hubspot_id").as("st_id"), col("amd_synced"))
      val locked = coalesce(col("amd_synced"), lit("false")) === "true"
      p.join(broadcast(im), p("patient_id") === im("natural_key"), "left")
        .join(broadcast(st), col("hubspot_id") === col("st_id"), "left")
        .select(col("c_custkey"),
          when(locked, lit(null)).otherwise(col("patient_id")).as("patient_id_out"),
          when(locked, lit(null)).otherwise(col("patient_chart")).as("patient_chart_out"),
          locked.as("locked"))
        .orderBy("c_custkey")
    },
    Some(Fixtures.withCtes(Fixtures.patientsSql, Fixtures.idMapSql, Fixtures.targetStateSql) +
      """SELECT p.c_custkey,
        |  CASE WHEN coalesce(st.amd_synced,'false') = 'true' THEN NULL ELSE p.patient_id END AS patient_id_out,
        |  CASE WHEN coalesce(st.amd_synced,'false') = 'true' THEN NULL ELSE p.patient_chart END AS patient_chart_out,
        |  coalesce(st.amd_synced,'false') = 'true' AS locked
        |FROM patients p
        |LEFT JOIN id_map im
        |  ON im.hubspot_object_type = 'contacts' AND im.natural_key = p.patient_id
        |LEFT JOIN target_state st ON st.hubspot_id = im.hubspot_id
        |ORDER BY p.c_custkey""".stripMargin))

  // ---------- F6: PHI redaction (main.py:84-89) ----------
  val projectRedact: Q = Q("project_redact",
    (spark, sfDir) => {
      val p = Fixtures.patients(spark, sfDir)
      p.select(col("c_custkey"),
        Scalars.hash8(col("c_name")).as("name_hash"),
        Scalars.hash8(Scalars.emailNorm(col("email_raw"))).as("email_hash"),
        col("c_mktsegment").as("segment"))
        .orderBy("c_custkey")
    },
    Some(Fixtures.withCtes(Fixtures.patientsSql) +
      """SELECT c_custkey, substr(sha256(c_name),1,8) AS name_hash,
        |  substr(sha256(nullif(lower(trim(email_raw)),'')),1,8) AS email_hash,
        |  c_mktsegment AS segment
        |FROM patients ORDER BY c_custkey""".stripMargin))

  // ---------- J3: email fallback + ambiguity (main.py:694-706) ----------
  val joinEmailAmbiguity: Q = Q("join_email_ambiguity",
    (spark, sfDir) => {
      val p = Fixtures.patients(spark, sfDir)
        .withColumn("email", Scalars.emailNorm(col("email_raw")))
        .filter(col("email").isNotNull)
      val st = Fixtures.targetState(spark, sfDir)
        .filter(col("email").isNotNull)
        .select(col("email").as("st_email"), col("hubspot_id"))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("st_email"))))
      p.join(st, p("email") === st("st_email"), "left")
        .groupBy(col("c_custkey"))
        .agg(max(col("cnt")).as("n"), min(col("hubspot_id")).as("min_id"))
        .select(col("c_custkey"),
          when(col("n").isNull, lit("nomatch"))
            .when(col("n") === 1, lit("matched"))
            .otherwise(lit("ambiguous")).as("branch"),
          when(col("n") === 1, col("min_id")).as("matched_id"))
        .orderBy("c_custkey")
    },
    Some(Fixtures.withCtes(Fixtures.patientsSql, Fixtures.targetStateSql) +
      """, st AS (
        |  SELECT email AS st_email, hubspot_id,
        |         count(*) OVER (PARTITION BY email) AS cnt
        |  FROM target_state WHERE email IS NOT NULL),
        |pe AS (
        |  SELECT c_custkey, nullif(lower(trim(email_raw)),'') AS email
        |  FROM patients WHERE nullif(lower(trim(email_raw)),'') IS NOT NULL)
        |SELECT pe.c_custkey,
        |  CASE WHEN max(st.cnt) IS NULL THEN 'nomatch'
        |       WHEN max(st.cnt) = 1 THEN 'matched' ELSE 'ambiguous' END AS branch,
        |  CASE WHEN max(st.cnt) = 1 THEN min(st.hubspot_id) END AS matched_id
        |FROM pe LEFT JOIN st ON st.st_email = pe.email
        |GROUP BY pe.c_custkey
        |ORDER BY pe.c_custkey""".stripMargin))

  // ---------- J4: tiered match (main.py:613-633, README.md:38-42) ----------
  // One broadcast of the match table, three probe attempts, no repeated
  // shuffles — the scalable form per SURVEY.md §4.
  val joinTiered: Q = Q("join_tiered",
    (spark, sfDir) => {
      val p = Fixtures.patients(spark, sfDir)
        .withColumn("email", Scalars.emailNorm(col("email_raw")))
      val im = Fixtures.idMap(spark, sfDir)
        .filter(col("hubspot_object_type") === "contacts")
      val t1 = im.select(col("natural_key").as("k1"), col("hubspot_id").as("id1"))
      val t2 = im.select(col("natural_key").as("k2"), col("hubspot_id").as("id2"))
      val t3 = Fixtures.targetState(spark, sfDir)
        .filter(col("email").isNotNull)
        .groupBy(col("email").as("k3"))
        .agg(min(col("hubspot_id")).as("id3"), count(lit(1)).as("n3"))
        .filter(col("n3") === 1)
        .select(col("k3"), col("id3"))
      p.join(broadcast(t1), p("patient_id") === col("k1"), "left")
        .join(broadcast(t2), p("patient_chart") === col("k2"), "left")
        .join(broadcast(t3), p("email") === col("k3"), "left")
        .select(col("c_custkey"),
          coalesce(col("id1"), col("id2"), col("id3")).as("hubspot_id"),
          when(col("id1").isNotNull, lit(1))
            .when(col("id2").isNotNull, lit(2))
            .when(col("id3").isNotNull, lit(3))
            .otherwise(lit(0)).as("tier"))
        .orderBy("c_custkey")
    },
    Some(Fixtures.withCtes(Fixtures.patientsSql, Fixtures.idMapSql, Fixtures.targetStateSql) +
      """, t3 AS (
        |  SELECT email AS k3, min(hubspot_id) AS id3
        |  FROM target_state WHERE email IS NOT NULL
        |  GROUP BY email HAVING count(*) = 1)
        |SELECT p.c_custkey,
        |  coalesce(t1.hubspot_id, t2.hubspot_id, t3.id3) AS hubspot_id,
        |  CASE WHEN t1.hubspot_id IS NOT NULL THEN 1
        |       WHEN t2.hubspot_id IS NOT NULL THEN 2
        |       WHEN t3.id3 IS NOT NULL THEN 3 ELSE 0 END AS tier
        |FROM patients p
        |LEFT JOIN id_map t1 ON t1.hubspot_object_type = 'contacts' AND t1.natural_key = p.patient_id
        |LEFT JOIN id_map t2 ON t2.hubspot_object_type = 'contacts' AND t2.natural_key = p.patient_chart
        |LEFT JOIN t3 ON t3.k3 = nullif(lower(trim(p.email_raw)),'')
        |ORDER BY p.c_custkey""".stripMargin))

  // ---------- J4b: README composite-tier match (README.md:38-42) ----------
  // The reference's headline patient join spec: Tier 1 = email
  // (case-insensitive, trimmed; ambiguous emails disqualified, J3
  // semantics), Tier 2 = (FirstName, LastName, DOB), Tier 3 = the full
  // address block. Runs through TieredMatch.melt — the ONE-shuffle form
  // that survives a non-broadcastable match table at 100 TB (probe keys
  // un-pivoted, single equi-join, min-tier wins per row).
  /** The three prefixed composite tier keys of README.md:38-42, built
    * identically for BOTH sides of the match so the expressions cannot
    * drift apart (a one-sided edit would silently stop keys ever
    * equaling). Email is normalized (lower+trim+blank→null) on both
    * sides — the "case-insensitive, trimmed" Tier-1 contract. Prefixes
    * make cross-tier key collisions impossible; nulls propagate so a row
    * missing a tier's inputs contributes no key for that tier. */
  private def tierKeys(emailRaw: Column, first: Column, last: Column,
                       dob: Column, addr1: Column, addr2: Column,
                       city: Column, state: Column, zip: Column): Seq[Column] = Seq(
    concat(lit("em:"), Scalars.emailNorm(emailRaw)),
    when(first.isNotNull && last.isNotNull && dob.isNotNull,
      concat(lit("nd:"), lower(first), lit("|"), lower(last), lit("|"), dob.cast("string"))),
    concat(lit("ad:"), lower(addr1), lit("|"), coalesce(lower(addr2), lit("")),
      lit("|"), lower(city), lit("|"), lower(state), lit("|"), zip))

  val joinTieredComposite: Q = Q("join_tiered_composite",
    (spark, sfDir) => {
      val p = Fixtures.patients(spark, sfDir)
      val Seq(k1, k2, k3) = tierKeys(col("email_raw"), col("first_name"),
        col("last_name"), col("dob"), col("address1"), col("address2"),
        col("city"), col("state_code"), col("zip"))
      val st = Fixtures.targetState(spark, sfDir)
      // ONE pass over target_state: explode the three tier keys (nulls
      // dropped), one groupBy dedups every key; the email tier's
      // ambiguity guard (J3: >1 holder disqualifies) becomes a post-agg
      // filter keyed off the prefix. Replaces 3 groupBys + union —
      // 2 fewer shuffles of the match side.
      val stKs = tierKeys(col("email"), col("first_name"),
        col("last_name"), col("dob"), col("address1"), col("address2"),
        col("city"), col("state_code"), col("zip"))
      val matchTbl = st
        .select(col("hubspot_id"), explode(array(stKs: _*)).as("natural_key"))
        .filter(col("natural_key").isNotNull)
        .groupBy("natural_key")
        .agg(min(col("hubspot_id")).as("hubspot_id"), count(lit(1)).as("n"))
        .filter(!col("natural_key").startsWith("em:") || col("n") === 1)
        .select("natural_key", "hubspot_id")
      TieredMatch.melt(p, "c_custkey", Seq(k1, k2, k3), matchTbl)
        .orderBy("c_custkey")
    },
    Some(Fixtures.withCtes(Fixtures.patientsSql, Fixtures.targetStateSql) +
      """, m1 AS (
        |  SELECT concat('em:', nullif(lower(trim(email)), '')) AS natural_key,
        |         min(hubspot_id) AS hubspot_id
        |  FROM target_state WHERE nullif(lower(trim(email)), '') IS NOT NULL
        |  GROUP BY nullif(lower(trim(email)), '') HAVING count(*) = 1),
        |m2 AS (
        |  SELECT concat('nd:', lower(first_name), '|', lower(last_name), '|', CAST(dob AS VARCHAR)) AS natural_key,
        |         min(hubspot_id) AS hubspot_id
        |  FROM target_state
        |  WHERE first_name IS NOT NULL AND last_name IS NOT NULL AND dob IS NOT NULL
        |  GROUP BY 1),
        |m3 AS (
        |  SELECT concat('ad:', lower(address1), '|', coalesce(lower(address2), ''), '|',
        |                lower(city), '|', lower(state_code), '|', zip) AS natural_key,
        |         min(hubspot_id) AS hubspot_id
        |  FROM target_state GROUP BY 1),
        |m AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2 UNION ALL SELECT * FROM m3),
        |keys AS (
        |  SELECT c_custkey, 1 AS tier,
        |         concat('em:', nullif(lower(trim(email_raw)), '')) AS k
        |  FROM patients WHERE nullif(lower(trim(email_raw)), '') IS NOT NULL
        |  UNION ALL
        |  SELECT c_custkey, 2,
        |         concat('nd:', lower(first_name), '|', lower(last_name), '|', CAST(dob AS VARCHAR))
        |  FROM patients
        |  WHERE first_name IS NOT NULL AND last_name IS NOT NULL AND dob IS NOT NULL
        |  UNION ALL
        |  SELECT c_custkey, 3,
        |         concat('ad:', lower(address1), '|', coalesce(lower(address2), ''), '|',
        |                lower(city), '|', lower(state_code), '|', zip)
        |  FROM patients),
        |j AS (
        |  SELECT kp.c_custkey, kp.tier, m.hubspot_id,
        |         row_number() OVER (PARTITION BY kp.c_custkey
        |                            ORDER BY kp.tier, m.hubspot_id) AS rn
        |  FROM keys kp JOIN m ON m.natural_key = kp.k)
        |SELECT p.c_custkey, j.hubspot_id, coalesce(j.tier, 0) AS tier
        |FROM patients p
        |LEFT JOIN (SELECT * FROM j WHERE rn = 1) j ON j.c_custkey = p.c_custkey
        |ORDER BY p.c_custkey""".stripMargin))

  // ---------- J5: MERGE upsert, last-writer-wins (main.py:354-371) ----------
  val mergeUpsert: Q = Q("merge_upsert",
    (spark, sfDir) => {
      val old = Fixtures.idMap(spark, sfDir)
      val k = col("c_custkey")
      val batch = Tables.customer(spark, sfDir).filter(k % 4 === 0).select(
        lit("contacts").as("hubspot_object_type"),
        k.cast("string").as("natural_key"),
        concat(lit("HSN-"), k.cast("string")).as("hubspot_id"),
        timestamp_millis(lit(1712707200000L) + (k % 50) * 86400000L).as("updated_at"))
      val w = Window.partitionBy(col("hubspot_object_type"), col("natural_key"))
        .orderBy(col("updated_at").desc, col("hubspot_id").desc)
      old.unionByName(batch)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("hubspot_object_type"), col("natural_key"), col("hubspot_id"),
          unix_millis(col("updated_at")).as("updated_ms"))
        .orderBy("natural_key", "hubspot_object_type")
    },
    Some(Fixtures.withCtes(Fixtures.idMapSql) +
      """, batch AS (
        |  SELECT 'contacts' AS hubspot_object_type,
        |    CAST(c_custkey AS VARCHAR) AS natural_key,
        |    concat('HSN-', CAST(c_custkey AS VARCHAR)) AS hubspot_id,
        |    make_timestamp((1712707200000 + (c_custkey % 50) * 86400000) * 1000) AS updated_at
        |  FROM customer WHERE c_custkey % 4 = 0),
        |merged AS (
        |  SELECT *, row_number() OVER (
        |      PARTITION BY hubspot_object_type, natural_key
        |      ORDER BY updated_at DESC, hubspot_id DESC) AS rn
        |  FROM (SELECT * FROM id_map UNION ALL SELECT * FROM batch))
        |SELECT hubspot_object_type, natural_key, hubspot_id,
        |  epoch_ms(updated_at) AS updated_ms
        |FROM merged WHERE rn = 1
        |ORDER BY natural_key, hubspot_object_type""".stripMargin))

  // ---------- J6: anti-join orphan routing (main.py:743-774) ----------
  val joinAntiOrphans: Q = Q("join_anti_orphans",
    (spark, sfDir) => {
      val r = Fixtures.rois(spark, sfDir)
      val pk = Fixtures.patients(spark, sfDir)
        .filter(col("patient_id").isNotNull).select(col("patient_id"))
      r.join(pk, r("roi_patient_id") === pk("patient_id"), "left_anti")
        .select(col("roi_id"), col("roi_patient_id"), col("status"))
        .orderBy("roi_id")
    },
    Some(Fixtures.withCtes(Fixtures.roisSql, Fixtures.patientsSql) +
      """SELECT r.roi_id, r.roi_patient_id, r.status
        |FROM rois r
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM patients p
        |  WHERE p.patient_id IS NOT NULL AND p.patient_id = r.roi_patient_id)
        |ORDER BY r.roi_id""".stripMargin))

  // ---------- A2/J7: attempt counts (main.py:404-420) ----------
  val aggAttempts: Q = Q("agg_attempts",
    (spark, sfDir) =>
      Fixtures.dlq(spark, sfDir)
        .groupBy(col("job_type"), col("natural_key"), col("error"))
        .agg(coalesce(max(col("attempt")), lit(0L)).as("attempts"))
        .orderBy("job_type", "natural_key", "error"),
    Some(Fixtures.withCtes(Fixtures.dlqSql) +
      """SELECT job_type, natural_key, error,
        |  coalesce(max(attempt), 0) AS attempts
        |FROM dlq GROUP BY job_type, natural_key, error
        |ORDER BY job_type, natural_key, error""".stripMargin))

  // ---------- A3: alert threshold (main.py:714-727; >=5 attempts) ----------
  val aggAttemptAlerts: Q = Q("agg_attempt_alerts",
    (spark, sfDir) =>
      Fixtures.dlq(spark, sfDir)
        .groupBy(col("job_type"), col("natural_key"), col("error"))
        .agg(coalesce(max(col("attempt")), lit(0L)).as("attempts"))
        .filter(col("attempts") >= 5)
        .orderBy("job_type", "natural_key", "error"),
    Some(Fixtures.withCtes(Fixtures.dlqSql) +
      """SELECT job_type, natural_key, error,
        |  coalesce(max(attempt), 0) AS attempts
        |FROM dlq GROUP BY job_type, natural_key, error
        |HAVING coalesce(max(attempt), 0) >= 5
        |ORDER BY job_type, natural_key, error""".stripMargin))

  // ---------- A1/O1: latest successful watermark (main.py:330-345) ----------
  val aggTop1Watermark: Q = Q("agg_top1_watermark",
    (spark, sfDir) =>
      Fixtures.ledger(spark, sfDir)
        .filter(col("status") === "success" && col("job_type") === "patients")
        .orderBy(col("finished_at").desc)
        .limit(1)
        .select(col("run_id"), unix_millis(col("high_watermark")).as("wm_ms")),
    Some(Fixtures.withCtes(Fixtures.ledgerSql) +
      """SELECT run_id, epoch_ms(high_watermark) AS wm_ms
        |FROM ledger
        |WHERE status = 'success' AND job_type = 'patients'
        |ORDER BY finished_at DESC LIMIT 1""".stripMargin))

  // ---------- A4: outcome counters (main.py:821-858) ----------
  val aggOutcomes: Q = Q("agg_outcomes",
    (spark, sfDir) => {
      val p = Fixtures.patients(spark, sfDir)
      val im = Fixtures.idMap(spark, sfDir)
        .filter(col("hubspot_object_type") === "contacts")
        .select(col("natural_key"), col("hubspot_id"))
      val st = Fixtures.targetState(spark, sfDir)
        .select(col("hubspot_id").as("st_id"), col("amd_synced"), col("roi_manual_override"))
      p.join(broadcast(im), p("patient_id") === im("natural_key"), "left")
        .join(broadcast(st), col("hubspot_id") === col("st_id"), "left")
        .select(
          when(col("hubspot_id").isNull, lit("created"))
            .when(coalesce(col("roi_manual_override"), lit("false")) === "true", lit("skipped"))
            .when(coalesce(col("amd_synced"), lit("false")) === "true", lit("locked_update"))
            .otherwise(lit("updated")).as("outcome"))
        .groupBy("outcome").agg(count(lit(1)).as("n"))
        .orderBy("outcome")
    },
    Some(Fixtures.withCtes(Fixtures.patientsSql, Fixtures.idMapSql, Fixtures.targetStateSql) +
      """SELECT CASE WHEN im.hubspot_id IS NULL THEN 'created'
        |            WHEN coalesce(st.roi_manual_override,'false') = 'true' THEN 'skipped'
        |            WHEN coalesce(st.amd_synced,'false') = 'true' THEN 'locked_update'
        |            ELSE 'updated' END AS outcome,
        |       count(*) AS n
        |FROM patients p
        |LEFT JOIN id_map im
        |  ON im.hubspot_object_type = 'contacts' AND im.natural_key = p.patient_id
        |LEFT JOIN target_state st ON st.hubspot_id = im.hubspot_id
        |GROUP BY 1 ORDER BY outcome""".stripMargin))

  // ---------- window: latest event per user (window machinery, §2e) ----------
  val windowLatestEvent: Q = Q("window_latest_event",
    (spark, sfDir) => {
      val e = Tables.events(spark, sfDir)
        .withColumn("ts_ms", unix_millis(col("ts")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms").desc, col("event_id").desc)
      e.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts_ms"))
        .orderBy("user_id")
    },
    Some("""WITH e AS (
           |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms,
           |    row_number() OVER (PARTITION BY user_id
           |                       ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
           |  FROM events)
           |SELECT user_id, event_id, event_type, ts_ms
           |FROM e WHERE rn = 1 ORDER BY user_id""".stripMargin))

  // ---------- SCD2 history from an update stream -----------------------
  // The warehouse twin of the reference's "current state only" sync: a
  // type-2 slowly-changing-dimension table with validity intervals.
  // Each user's events in (ts, event_id) order become versioned rows;
  // valid_to = next version's valid_from (null = current). ONE window
  // (row_number + lead share the same partition/order spec, so Catalyst
  // plans a single sort+window over a single shuffle). Timestamps
  // compared at epoch-ms like window_latest_event — the ns-parquet /
  // µs-Spark / DuckDB conversion parity trap lives below ms.
  val windowScd2History: Q = Q("window_scd2_history",
    (spark, sfDir) => {
      val e = Tables.events(spark, sfDir)
        .withColumn("ts_ms", unix_millis(col("ts")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms").asc, col("event_id").asc)
      e.select(col("user_id"), col("event_id"), col("event_type"), col("ts_ms"))
        .withColumn("version", row_number().over(w))
        .withColumn("valid_to_ms", lead(col("ts_ms"), 1).over(w))
        .select(col("user_id"), col("version"),
          col("event_type").as("state"),
          col("ts_ms").as("valid_from_ms"), col("valid_to_ms"),
          col("valid_to_ms").isNull.as("is_current"))
        .orderBy("user_id", "version")
    },
    Some("""WITH e AS (
           |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
           |h AS (
           |  SELECT user_id, event_type,
           |    row_number() OVER w AS version,
           |    ts_ms AS valid_from_ms,
           |    lead(ts_ms) OVER w AS valid_to_ms
           |  FROM e
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms ASC, event_id ASC))
           |SELECT user_id, CAST(version AS INT) AS version, event_type AS state,
           |  valid_from_ms, valid_to_ms, valid_to_ms IS NULL AS is_current
           |FROM h ORDER BY user_id, version""".stripMargin))

  // ---------- gaps-and-islands sessionization (running windows) --------
  // The batch-SQL twin of streaming.EventStreams.sessionWindows: a new
  // session opens after a >30min silence; sess_id is a running sum of
  // session-breaks. lag + cumulative sum — one shuffle on user_id.
  val windowSessionize: Q = Q("window_sessionize",
    (spark, sfDir) => {
      val gapMs = 30L * 60 * 1000
      val e = Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"))
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms").asc, col("event_id").asc)
      val newSess = when(
        col("ts_ms") - lag(col("ts_ms"), 1).over(byUser) > gapMs, 1).otherwise(0)
      e.withColumn("brk", newSess)
        .withColumn("sess_id", sum(col("brk")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_ms")).as("sess_start_ms"),
          max(col("ts_ms")).as("sess_end_ms"))
        .orderBy("user_id", "sess_id")
    },
    Some("""WITH e AS (
           |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
           |b AS (
           |  SELECT user_id, event_id, ts_ms,
           |    CASE WHEN ts_ms - lag(ts_ms) OVER w > 1800000 THEN 1 ELSE 0 END AS brk
           |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms ASC, event_id ASC)),
           |s AS (
           |  SELECT user_id, ts_ms,
           |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_ms ASC, event_id ASC
           |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
           |  FROM b)
           |SELECT user_id, sess_id, count(*) AS n_events,
           |  min(ts_ms) AS sess_start_ms, max(ts_ms) AS sess_end_ms
           |FROM s GROUP BY user_id, sess_id
           |ORDER BY user_id, sess_id""".stripMargin))

  // ---------- RANGE-frame rolling aggregate (trailing time window) -----
  // The frame type the other window queries don't cover: a value-based
  // RANGE frame over event-time (trailing 1h sum per user). RANGE
  // includes ts peers regardless of tie order, so the result is
  // deterministic without a unique-key tiebreak in the frame itself.
  val windowRangeFrame: Q = Q("window_range_frame",
    (spark, sfDir) => {
      val e = Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_id"),
          unix_millis(col("ts")).as("ts_ms"), col("value"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
        .rangeBetween(-3600000L, Window.currentRow)
      e.select(col("user_id"), col("event_id"), col("ts_ms"),
          round(sum(col("value")).over(w), 2).as("rolling_1h"))
        .orderBy("user_id", "event_id")
    },
    Some("""WITH e AS (
           |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM events)
           |SELECT user_id, event_id, ts_ms,
           |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts_ms
           |        RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW), 2) AS rolling_1h
           |FROM e ORDER BY user_id, event_id""".stripMargin))

  val all: Seq[Q] = Seq(
    scanFull, scanDelta, projectPatient, projectRoi, filterBlanks,
    filterProcessed, filterAmbiguousSplit, joinIdMap, joinOverrideSkip,
    projectLocked, projectRedact, joinEmailAmbiguity, joinTiered,
    joinTieredComposite, mergeUpsert, joinAntiOrphans, aggAttempts, aggAttemptAlerts,
    aggTop1Watermark, aggOutcomes, windowLatestEvent, windowSessionize,
    windowRangeFrame, windowScd2History)
}
