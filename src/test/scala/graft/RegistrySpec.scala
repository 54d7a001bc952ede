package graft

/** Uniform smoke over the whole registry: every query — including the
  * rows-only ones the DuckDB gate can't hash (ext_ann_lsh,
  * agg_approx_distinct) — must plan, run, and return a stable schema at
  * sf0.001. Catches runtime regressions in queries the oracle compare
  * would only reveal driver-side. */
class RegistrySpec extends SparkSpec {

  test("all registered queries run and return columns at sf0.001") {
    val failures = SparkEntry.registry.flatMap { q =>
      try {
        val df = q.fn(spark, sf0001)
        assert(df.columns.nonEmpty)
        df.count() // execute the full plan
        None
      } catch {
        case e: Throwable => Some(s"${q.name}: ${e.getMessage.take(200)}")
      } finally spark.sqlContext.clearCache()
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracle belongs to a registered query; names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every rows-only query carries a documented justification — and nothing else does") {
    val rowsOnly = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name).toSet
    val justified = SparkEntry.rowsOnlyJustification.keySet
    assert(rowsOnly == justified,
      s"undocumented rows-only: ${rowsOnly -- justified}; stale justifications: ${justified -- rowsOnly}")
    // a reason must actually say something
    SparkEntry.rowsOnlyJustification.foreach { case (n, why) =>
      assert(why.length > 40, s"$n: justification too thin: '$why'")
    }
  }

  test("rank/window/sample queries are run-to-run deterministic") {
    // the queries whose output depends on an ORDER the engine could
    // break ties in: top-k ranks, window frames, hash-threshold
    // samples, cluster labels. Two executions must produce identical
    // rows — a missing tiebreak column shows up here mechanically, not
    // in a flaky driver hash three rounds later.
    val rankSensitive = Seq("ext_topk_cosine", "ext_topk_ivf", "ext_ann_lsh",
      "ext_bm25_search", "ext_tfidf_terms", "ext_domain_cap",
      "ext_cluster_representative", "ext_temperature_sample",
      "ext_quality_percentile_gate", "window_latest_event",
      "window_sessionize", "ext_dedup_chunk_rewrite",
      "ext_topk_ivfpq", "ext_bm25_incremental", "ext_lsh_incremental")
    val diverged = rankSensitive.flatMap { name =>
      val fn = SparkEntry.queries(name)
      def runOnce() =
        try fn(spark, sf0001).collect().map(_.toString).toSeq
        finally spark.sqlContext.clearCache()
      if (runOnce() != runOnce()) Some(name) else None
    }
    assert(diverged.isEmpty, s"nondeterministic output: $diverged")
  }

  test("SURVEY.md §2 and the registry stay in sync, both directions") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val prefixes = Seq("scan_", "project_", "filter_", "join_", "agg_",
      "window_", "setop_", "fn_", "merge_", "ext_", "stream_")
    val mentioned = "`([a-z0-9_]+)`".r.findAllMatchIn(survey)
      .map(_.group(1)).filter(n => prefixes.exists(n.startsWith)).toSet
    val registered = SparkEntry.registry.map(_.name).toSet
    // every registered query must be documented in the inventory…
    val undocumented = registered -- mentioned
    assert(undocumented.isEmpty, s"registered but absent from SURVEY.md: $undocumented")
    // …and every query name SURVEY promises must actually exist
    val phantom = mentioned -- registered
    assert(phantom.isEmpty, s"SURVEY.md names unregistered queries: $phantom")
  }
}
