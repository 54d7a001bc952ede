package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every registered query (core relational + scalar fns + extensions
    * + bounded streaming lifecycles). */
  def registry: Seq[Q] =
    ops.Relational.all ++ ops.ScalarQueries.all ++ ops.SetAggQueries.all ++
      ext.Extensions.all ++ streaming.StreamQueries.all

  /** Queries that intentionally ship WITHOUT a DuckDB oracle (the
    * driver records its weaker rows-only check), each with the reason
    * that gate is the right one. RegistrySpec asserts this set matches
    * the registry exactly — an oracle-less query with no documented
    * reason is a coverage hole, not a design choice. */
  val rowsOnlyJustification: Map[String, String] = Map(
    "agg_approx_distinct" ->
      "HLL sketch estimates are engine-specific by construction; <5% error vs the exact count is asserted in SetAggSpec",
    "agg_approx_percentile" ->
      "quantile-summary sketch cut points are engine-specific by construction; value error vs the exact agg_percentile is asserted in SetAggSpec",
    "ext_ann_lsh" ->
      "approximate index by design; quality is gated by ext_ann_recall_flat's pass column and the ExtensionsSpec recall floors",
    "ext_topk_ivf" ->
      "approximate index by design; quality is gated by ext_ann_recall_flat's pass column and the ExtensionsSpec recall floors",
    "ext_topk_pq" ->
      "approximate (product-quantized) index by design; quality is gated by ext_ann_recall_flat's pass column and the ExtensionsSpec recall floors",
    "ext_topk_ivfpqr" ->
      "approximate (residual-encoded cell-routed product-quantized) search by design; quality is gated by ext_ann_recall_pq's ivfpqr pass row plus the no-loss-vs-plain-ivfpq assertion, and PlanSpec asserts the stored ivfpqr-codes serve with probed-cell PartitionFilters",
    "ext_topk_ivfpq" ->
      "approximate (cell-routed product-quantized) index by design; quality is gated by ext_ann_recall_pq's ivfpq pass row, the routed-candidate containment by ExtensionsSpec, and the cell-equi-join plan by PlanSpec",
    "ext_topk_imi" ->
      "approximate (inverted multi-index) search by design; quality is gated by ext_ann_recall_imi's imi pass row (floor 0.40) and PlanSpec asserts the per-half routing joins + the stored imi-cells serve",
    "ext_topk_imipq" ->
      "approximate (product-routed product-quantized) search by design; quality is gated by ext_ann_recall_imi's imipq pass row (floor 0.40, plus the routing-bound imipq≈imi assertion) and PlanSpec asserts the stored imipq-codes serve, the cell equi-join, and probed-cell PartitionFilters",
    "ext_ann_recall_flat" ->
      "self-checking metric (flat index families: lsh/ivf/pq): the output carries its own pass column asserting the registered recall floors; split from the old all-families ext_ann_recall so each family's cost and trend is its own registry line",
    "ext_ann_recall_pq" ->
      "self-checking metric (cell-routed PQ families: ivfpq/ivfpqr): the output carries its own pass column asserting the registered recall floors; cross-family assertions (ivfpqr no-loss-vs-ivfpq) stay in ExtensionsSpec's all-families form",
    "ext_ann_recall_imi" ->
      "self-checking metric (product-routed families: imi/imipq): the output carries its own pass column asserting the registered recall floors; the routing-bound imipq-vs-imi assertion stays in ExtensionsSpec's all-families form",
    "ext_ann_recall" ->
      "self-checking metric: the output carries its own pass column asserting the registered recall floors (all seven families in one frame; the per-family split rows above are the preferred trend lines, this form stays registered because a declared query may never disappear)",
    "ext_hybrid_search_pq" ->
      "self-checking metric over an approximate (PQ-tower) index: the output carries its own pass column asserting the fusion-overlap floor vs the exact hybrid",
    "ext_hybrid_search_ivfpq" ->
      "self-checking metric over an approximate (IVFPQ-tower) index: the output carries its own pass column asserting the fusion-overlap floor vs the exact hybrid (same pattern as ext_hybrid_search_pq, dense tower cell-routed)",
    "ext_imipq_incremental" ->
      "approximate index maintenance (same no-oracle reason as ext_topk_imipq); ExtensionsSpec asserts the merged-index output equals ext_topk_imipq at driver SFs and PlanSpec gates the stored corpus serve, the batch-only raw scans, and probed-cell pruning through the union",
    "ext_ivfpq_incremental" ->
      "approximate index maintenance (same no-oracle reason as ext_topk_ivfpq); ExtensionsSpec asserts the merged-index output equals ext_topk_ivfpq at driver SFs and PlanSpec gates the plan to one batch-side encode scan (standing corpus served from the stored combined index)",
    "ext_ivfpq_compact" ->
      "approximate index maintenance (same no-oracle reason as ext_topk_ivfpq); ExtensionsSpec asserts the compacted-index search equals ext_topk_ivfpq at driver SFs and that the compacted table is row-identical to the monolithic build; PlanSpec gates the settled debts (single compacted scan, no union, two query-side raw fetches, PartitionFilters)",
    "ext_lsh_incremental" ->
      "approximate index maintenance (same no-oracle reason as ext_ann_lsh); ExtensionsSpec asserts the merged-index output is row-identical to ext_ann_lsh at driver SFs and PlanSpec gates the plan to one batch-side hash scan (corpus buckets served from the stored table)",
    "ext_ivfpqr_incremental" ->
      "approximate index maintenance (same no-oracle reason as ext_topk_ivfpqr); ExtensionsSpec asserts the merged-index output equals ext_topk_ivfpqr at driver SFs and PlanSpec gates the plan to one batch-side encode scan with probed-cell pruning through the union",
    "ext_ivfpqr_compact" ->
      "approximate index maintenance (same no-oracle reason as ext_topk_ivfpqr); ExtensionsSpec asserts the compacted-index search equals ext_topk_ivfpqr at driver SFs and that the compacted table is row-identical to the monolithic residual build; PlanSpec gates the settled debts (single compacted scan, no union, two query-side raw fetches, PartitionFilters)",
    "ext_imipq_compact" ->
      "approximate index maintenance (same no-oracle reason as ext_topk_imipq); ExtensionsSpec asserts the compacted-index search equals ext_topk_imipq at driver SFs and that the compacted table is row-identical to the monolithic product-cell build; PlanSpec gates the settled debts on the product layout (single compacted scan, no union, two query-side raw fetches, PartitionFilters)",
    "ext_lsh_compact" ->
      "approximate index maintenance (same no-oracle reason as ext_ann_lsh); ExtensionsSpec asserts the compacted pre-capped bucket table is row-identical to the monolithic index and the search equals ext_ann_lsh at driver SFs; PlanSpec gates the settled debts (single compacted scan, no union, no batch hash scan, no per-search re-cap window)",
    "ext_pq_incremental" ->
      "frozen-codebook model maintenance has no SQL analog (the codebook is a trained model); the drift contract is pinned by ExtensionsSpec's planted-drift test, the O(batch) encode by ScaleProbe pqinc, and PlanSpec asserts the train distortion is read from the stored model stat (one corpus scan: the batch filter)",
    "ext_ivf_incremental" ->
      "frozen-centroid model maintenance has no SQL analog (the quantizer is a trained model); the drift contract is pinned by ExtensionsSpec's planted-drift test and PlanSpec's stored-stat gate (same encode shape as ext_pq_incremental)",
    "ext_hard_negatives_ivfpq" ->
      "approximate (attributed cell-routed) search by design, same no-oracle reason as ext_topk_ivfpq_filtered; PurgeSpec asserts zero same-label results and a recall floor vs the oracle-paired exact ext_hard_negatives; PlanSpec gates the stored attributed-index serve and the label-expansion join",
    "ext_ivfpq_purge" ->
      "approximate index maintenance (same no-oracle reason as ext_topk_ivfpq); PurgeSpec asserts zero purged ids can appear in any result and that the purged-index search equals a from-scratch build over the filtered corpus under the same frozen models (cap headroom asserted); PlanSpec gates the stored-code serve + one purge-list scan",
    "ext_topk_ivfpq_filtered" ->
      "approximate (cell-routed product-quantized) FILTERED search by design — the exact filtered ground truth is the oracle-paired ext_topk_filtered; ExtensionsSpec floor-gates recall vs that ground truth, asserts every result satisfies the label constraint, and PlanSpec gates the attributed-index serve (stored ivfpq-codes-attr, label PushedFilter + probed-cell PartitionFilters, label equi-join)",
    "ext_prototype_prune" ->
      "the prototypes are the stored k-means centroid MODEL (no SQL analog — same reason class as ext_ivf_incremental); ExtensionsSpec recomputes assignment, prototypicality score, per-cell rank, and the cut with an independent in-memory twin over the same frozen model and requires exact row equality",
    "ext_mmr_rerank" ->
      "the k-step greedy selection is sequentially data-dependent (selection r depends on the max-similarity state of selections 1..r-1) and has no practical recursive-CTE SQL form; ExtensionsSpec recomputes the selection with an independent in-memory MMR over the same pool and requires identical (query, corpus, rank) triples plus score agreement, and asserts rank 1 equals the exact search's nearest neighbor",
    "ext_mmr_rerank_ivfpq" ->
      "inherits ext_mmr_rerank's no-oracle reason (the greedy has no SQL form) plus the approximate pool (ivfpq, gated by ext_ann_recall_pq); ExtensionsSpec asserts routing-bound overlap >= 0.4 vs the exact-pool MMR (measured 0.59-0.64) and that rank 1 equals ext_topk_ivfpq's rank 1",
    "ext_bpe_merges" ->
      "K data-dependent argmax+rewrite rounds have no practical recursive-CTE SQL form; ExtensionsSpec recomputes the merge table with an independent in-memory BPE over the collected vocabulary and requires exact equality",
    "ext_bpe_token_count" ->
      "the apply side of ext_bpe_merges inherits its no-oracle reason (the merge table is the K-round trained model; a SQL twin would need the same argmax loop plus a fixpoint rewrite per merge); ExtensionsSpec applies the collected merges with an independent in-memory BPE to every document and requires exact per-doc ws/bpe token counts",
    "ext_pagerank_warm" ->
      "warm-start convergence-mode centrality: the iteration count is a runtime property (L1 delta vs tol), so no fixed-depth SQL unrolling can express it; GraphConvergenceSpec pins the fixpoint against a dense in-memory reference AND asserts the registered warm form's top-K scores equal the cold bootstrap's (the damped iteration is a contraction, so the fixpoint is unique)",
    "ext_hits_warm" ->
      "warm-start convergence-mode centrality, same no-oracle reason as ext_pagerank_warm; GraphConvergenceSpec pins hitsConverged's hubs/authorities against a dense in-memory reference and asserts warm==cold on the registered form",
    "ext_lsh_purge" ->
      "approximate index maintenance (same no-oracle reason as ext_ann_lsh); PurgeSpec asserts zero purged ids can appear in any result and that the purged-index search equals a from-scratch build over the filtered corpus under the same frozen hyperplanes (bucket-cap headroom asserted); PlanSpec gates the stored-bucket serve + one purge-list scan",
    "ext_imipq_purge" ->
      "approximate index maintenance (same no-oracle reason as ext_topk_imipq); PurgeSpec asserts zero purged ids and equality to the filtered rebuild under the same frozen models (cap headroom asserted); PlanSpec gates the stored imipq-codes serve + one purge-list scan",
    "ext_ivfpqr_purge" ->
      "approximate index maintenance (same no-oracle reason as ext_topk_ivfpqr); PurgeSpec asserts zero purged ids and equality to the filtered residual rebuild under the same frozen models (cap headroom asserted); PlanSpec gates the stored ivfpqr-codes serve + one purge-list scan",
    "ext_ivfpq_refresh" ->
      "approximate index maintenance (same no-oracle reason as ext_topk_ivfpq); RefreshSpec asserts the diff-driven purge+arrive composition's search equals a from-scratch snapshot-B build under the same frozen models and that no stale vector can be returned; PlanSpec gates the stored snapshot-A code serve + the one-scan delta encode",
    "ext_imipq_refresh" ->
      "approximate index maintenance (same no-oracle reason as ext_topk_imipq); RefreshSpec asserts the diff-driven purge+arrive composition's search equals a from-scratch snapshot-B build under the same three frozen models (PQ codebooks + both half-quantizers) and that no stale vector can be returned; PlanSpec gates the stored snapshot-A code serve + the one-scan delta encode",
    "ext_ivfpqr_refresh" ->
      "approximate index maintenance (same no-oracle reason as ext_topk_ivfpqr); RefreshSpec asserts the diff-driven purge+arrive composition's search equals a from-scratch snapshot-B build under the same frozen residual models (centroids + cell means + residual codebook) and that no stale vector can be returned; PlanSpec gates the stored snapshot-A code serve + the one-scan delta encode",
    "ext_lsh_refresh" ->
      "approximate index maintenance (same no-oracle reason as ext_ann_lsh); RefreshSpec asserts the refreshed capped bucket table's search equals a from-scratch snapshot-B build under the same sha-derived hyperplanes (cap headroom asserted) and that no stale vector can be returned; PlanSpec gates the stored snapshot-A bucket serve + the one-scan delta hash",
    "ext_compact_report" ->
      "operational metadata report: the inputs are stored-index layout facts (fixture row counts, part-file counts) DuckDB cannot see; the threshold rule is pinned by ExtensionsSpec's planted over/under-threshold cases and the registered run asserts per-family coverage with exact base/batch row counts",
    "stream_sync_microbatch" ->
      "streaming foreachBatch lifecycle has no DuckDB analog; semantics are covered by StreamingSyncSpec and PipelineSpec")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The patients pipeline slice: projection + tiered id-map match. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.joinTiered.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
