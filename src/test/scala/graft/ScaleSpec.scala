package graft

import org.apache.spark.sql.functions._
import graft.ops.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plans with no shuffle Exchange on either side") {
    Scale.writeBucketed(model.Tables.orders(spark, sf0001), "b_orders", "o_custkey", 8)
    Scale.writeBucketed(
      model.Tables.customer(spark, sf0001).withColumnRenamed("c_custkey", "o_custkey"),
      "b_customer", "o_custkey", 8)
    // force the sort-merge path: at real scale neither side broadcasts,
    // which is exactly when bucketing pays
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "b_orders", "b_customer", "o_custkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketing unused:\n$plan")
      // correctness: same result as the plain join
      val plain = model.Tables.orders(spark, sf0001).join(
        model.Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      assert(joined.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("saltedJoin returns exactly the same rows as the plain join") {
    val left = model.Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey").as("k"))
    val right = model.Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    val plain = left.join(right, Seq("k")).select("o_orderkey", "c_mktsegment")
    val salted = Scale.saltedJoin(left, right, "k", salt = 7)
      .select("o_orderkey", "c_mktsegment")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("quadratic ground-truth ops are bounded by ABSOLUTE sample size, constant in SF") {
    import graft.ext.Extensions
    // the bound must be a fixed COUNT, not a fraction: a fraction sample
    // makes all-pairs verification quadratic in corpus size (100× data →
    // 10 000× pairs). sf0.01 → sf0.1 is the driver's own 10× step.
    val sfs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val ngramSizes = sfs.map { sf =>
      val docs = model.Tables.documents(spark, sf).select("doc_id", "text")
      Extensions.hashOrderedSample(docs, "doc_id", Extensions.NgramSampleDocs).count()
    }
    // corpus is ≥128 at both SFs: the sample saturates at exactly N —
    // pair volume N·(N-1)/2 is identical at every SF
    assert(ngramSizes.toSet == Set(Extensions.NgramSampleDocs.toLong),
      s"ngram sample not constant in SF: $ngramSizes")
    sfs.foreach { sf =>
      val emb = model.Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("label"))
      val perLabel = Extensions.perLabelHashSample(emb, "label", "vec_id",
          Extensions.EmbeddingSamplePerLabel)
        .groupBy("label").count().collect().map(_.getLong(1))
      assert(perLabel.forall(_ <= Extensions.EmbeddingSamplePerLabel),
        s"$sf: label block exceeds the absolute cap: ${perLabel.toSeq}")
    }
    // at sf0.1 every label exceeds the cap: the bound must actually bind
    val bound = Extensions.perLabelHashSample(
        model.Tables.embeddings(spark, "/root/testdata/sf0.1")
          .select(col("vec_id"), col("label")),
        "label", "vec_id", Extensions.EmbeddingSamplePerLabel)
      .groupBy("label").count().collect().map(_.getLong(1))
    assert(bound.forall(_ == Extensions.EmbeddingSamplePerLabel),
      s"cap not binding at sf0.1: ${bound.toSeq}")
  }

  test("similarity-search query workloads are a FIXED COUNT, invariant across SFs") {
    import graft.ext.Extensions
    // the query side of every search query is broadcast (and PQ builds
    // an M×K LUT per query): a corpus-fraction slice (the old
    // `vec_id % 47`) grows the broadcast linearly with the data — a
    // driver/executor OOM at 100×. The workload must saturate at
    // exactly AnnQueryCount / HybridQueryCount at every SF.
    val sfs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    // finally-released: a FAILED assertion must not leave the postings/
    // query caches of two scale factors pinned in the shared session
    // for the suites that run after this one
    try {
      val annCounts = sfs.map { sf =>
        Extensions.annQueryIds(model.Tables.embeddings(spark, sf)).count()
      }
      assert(annCounts.toSet == Set(Extensions.AnnQueryCount.toLong),
        s"ANN query workload not SF-invariant: $annCounts")
      // the registered queries must agree with the helper: distinct
      // query_ids in each output == the fixed count at both SFs
      sfs.foreach { sf =>
        val nq = Extensions.topkCosine.fn(spark, sf)
          .select("query_id").distinct().count()
        assert(nq == Extensions.AnnQueryCount.toLong,
          s"$sf: ext_topk_cosine ran $nq queries, want ${Extensions.AnnQueryCount}")
      }
      val hybridCounts = sfs.map { sf =>
        Extensions.hybridSearch.fn(spark, sf)
          .select("query_id").distinct().count()
      }
      assert(hybridCounts.toSet == Set(Extensions.HybridQueryCount.toLong),
        s"hybrid query workload not SF-invariant: $hybridCounts")
      // the cell-routed index inherits the same contract: its query
      // side carries an M×K LUT per row, so cardinality must saturate
      // at exactly AnnQueryCount at every SF
      val ivfpqCounts = sfs.map { sf =>
        Extensions.topkIvfpq.fn(spark, sf)
          .select("query_id").distinct().count()
      }
      assert(ivfpqCounts.toSet == Set(Extensions.AnnQueryCount.toLong),
        s"ivfpq query workload not SF-invariant: $ivfpqCounts")
    } finally Extensions.releaseCaches()
  }

  test("connectedComponents handles a planted mega-component (hot join key) correctly") {
    // one hub star (maximally hot key in the sym self-join + neighbor
    // aggregation — the boilerplate-family skew shape) alongside small
    // components: labels must stay exact. Task-time boundedness at
    // probe scale is measured by `runMain graft.ScaleProbe skew`
    // (numbers in DESIGN.md); this case pins correctness under skew.
    val spokes = 20000L
    val star = spark.range(1, spokes + 1)
      .select(lit(0L).as("id_a"), col("id").as("id_b"))
    val base = 1000000L
    val chains = spark.range(0, 1000)
      .filter(col("id") % 100 =!= 99)
      .select((col("id") + base).as("id_a"), (col("id") + base + 1).as("id_b"))
    val edges = star.unionByName(chains)
    val nodes = edges.select(col("id_a").as("id"))
      .unionByName(edges.select(col("id_b").as("id"))).distinct()
    // driverFinishMaxEdges = 0 forces the DISTRIBUTED loop: at this
    // scale the default bound would take the round-14 driver-finish
    // fast path and the loop (and its hot branch below) would ship
    // untested
    val comps = ops.Graph.connectedComponents(edges, nodes,
      driverFinishMaxEdges = 0L).cache()
    assert(comps.filter(col("component") === 0L).count() == spokes + 1)
    val chainComps = comps.filter(col("id") >= base)
      .groupBy("component").count().collect()
    assert(chainComps.length == 10) // 1000 ids in runs of 100
    assert(chainComps.forall(_.getLong(1) == 100L))
    // hot/cold decomposition equivalence: force the hub (degree 20k)
    // over the hot threshold so the broadcast delivery path actually
    // runs, and require bit-identical labels vs the default plan. At
    // the default 500k threshold this graph takes the cold-only path,
    // so without this run the hot branch would ship untested.
    val hot = ops.Graph.connectedComponents(edges, nodes, hotDegree = 100L,
      driverFinishMaxEdges = 0L)
    assert(hot.unionByName(comps).distinct().count() == comps.count(),
      "hot-path labels differ from the default path")
    // round-14 driver-finish equivalence: under the default bound this
    // graph is finished on the driver after local contraction — labels
    // must be bit-identical to the distributed loop's
    val fast = ops.Graph.connectedComponents(edges, nodes)
    assert(fast.unionByName(comps).distinct().count() == comps.count(),
      "driver-finish labels differ from the distributed loop")
    comps.unpersist()
  }

  test("saltedJoin preserves left-outer semantics") {
    val left = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val right = Seq((1, "X")).toDF("k", "w")
    val out = Scale.saltedJoin(left, right, "k", salt = 4, joinType = "left")
    assert(out.count() == 3)
    assert(out.filter(col("w").isNull).count() == 2)
  }
}
