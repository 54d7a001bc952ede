package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the graph
  * step a dedup pipeline runs AFTER pair generation: near-dup pairs are
  * edges, each component keeps its minimum doc id as the cluster id
  * (and typically only that doc survives).
  *
  * Scale shape: every iteration is one equi-join + one aggregation of
  * the (node, label) frame — distributed end to end; the driver sees
  * only the converged-yet? count. Labels only decrease, so the loop
  * converges in O(component diameter) iterations (near-dup clusters are
  * shallow). `localCheckpoint` truncates the logical plan each round —
  * without it the lineage doubles per iteration and analysis time blows
  * up long before data size matters.
  */
object Graph {

  /** Version tag for persisted component-label fixtures
    * (Extensions.parquetFixture keys include it): the fixture key can
    * fingerprint the lazy PAIR plan, but connectedComponents runs jobs
    * eagerly, so algorithm changes here are invisible to that plan —
    * bump this when the labeling algorithm changes in any way that
    * could alter output. */
  final val AlgoVersion = "cc1"

  /** Partition-local contraction: exact union-find over each partition's
    * edges, emitting one (node, local-min-root) star edge per non-root
    * node. One narrow pass — no shuffle — that preserves connectivity
    * exactly (a node shared by two partitions transitively links its two
    * local roots), while collapsing every within-partition path to depth
    * 1. The iterative loop then runs on a graph whose diameter is the
    * CROSS-partition hop count, not the raw component diameter — on a
    * single-partition graph it converges in one confirming round, and at
    * 1000 executors it turns O(diameter) rounds into O(log partitions).
    * Memory is bounded by distinct nodes per partition (2× edge count),
    * the same order as the join state the loop would hold anyway. */
  private def contractLocal(edges: DataFrame): DataFrame = {
    import edges.sparkSession.implicits._
    edges.select(col("id_a"), col("id_b")).as[(Long, Long)]
      .mapPartitions { it =>
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x // path compression
          while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
          r
        }
        it.foreach { case (a, b) =>
          parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { // union by min id: the root IS the local min
            if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
          }
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        parent.keySet().forEach { x => val r = find(x); if (r != x) out += ((x, r)) }
        out.iterator
      }
      .toDF("id_a", "id_b")
  }

  /** @param edges undirected edges as (id_a, id_b) long columns
    * @param nodes one `id` long column (components of isolated nodes =
    *              themselves)
    * @param maxIter outer-loop cap. Hitting it THROWS rather than
    *        returning silently-wrong partial labels (one component
    *        reported as several, multiple keep=true survivors) — a
    *        dedup consumer cannot detect truncation after the fact.
    *        maxIter × roundsPerCheck bounds the reachable diameter.
    * @param roundsPerCheck propagation rounds composed lazily between
    *        materializations — labels are monotone, so a final round
    *        that changed nothing proves the fixpoint regardless of what
    *        earlier composed rounds did; fewer jobs for the same result
    *
    * @param checkpointDir when set, lineage is truncated with RELIABLE
    *        checkpoints into this directory (`sc.setCheckpointDir` +
    *        `.checkpoint()`): blocks live on the checkpoint filesystem
    *        and survive executor loss, which `localCheckpoint`'s
    *        executor-local blocks do not. Default None = localCheckpoint
    *        (cheaper; fine for static single-job clusters). On a
    *        dynamic-allocation cluster ALWAYS pass a dir — executor
    *        decommission mid-loop otherwise kills the job.
    *        RETENTION: Spark does not delete reliable checkpoints on
    *        its own — the dir accumulates one snapshot per truncation
    *        until the CALLER removes it (safe once the returned frame
    *        has been consumed), or set
    *        `spark.cleaner.referenceTracking.cleanCheckpoints=true` to
    *        let the context GC them. Use a per-job subdirectory.
    * @return (id, component) — component = min id reachable */
  /** Lineage-truncation strategy shared by the iterative graph
    * algorithms (CC here, convergence-mode PageRank/HITS in
    * `ext.Extensions`): reliable `.checkpoint()` into `checkpointDir`
    * when given, executor-local `.localCheckpoint()` otherwise. See the
    * `connectedComponents` scaladoc for the retention and
    * dynamic-allocation caveats. */
  private[graft] def checkpointer(spark: org.apache.spark.sql.SparkSession,
      checkpointDir: Option[String]): DataFrame => DataFrame =
    checkpointDir match {
      case Some(dir) =>
        // CAVEAT: the checkpoint dir is SparkContext-GLOBAL state —
        // setting it here is a session-wide side effect. Two concurrent
        // jobs wanting different dirs must serialize externally (or
        // share one parent dir: setCheckpointDir creates a unique
        // UUID subdirectory per call, so same-dir callers never
        // collide). We only touch the setting when the current value
        // was not derived from this dir, so repeated calls with the
        // same dir don't churn a fresh UUID subdir into existence and
        // don't clobber a concurrent same-dir caller's setting.
        val sc = spark.sparkContext
        val hPath = new org.apache.hadoop.fs.Path(dir)
        val qualified = hPath.getFileSystem(sc.hadoopConfiguration)
          .makeQualified(hPath).toString
        val alreadySet = sc.getCheckpointDir.exists { cur =>
          val parent = new org.apache.hadoop.fs.Path(cur).getParent
          parent != null && parent.toString == qualified
        }
        if (!alreadySet) sc.setCheckpointDir(dir)
        df => df.checkpoint()
      case None => df => df.localCheckpoint()
    }

  /** Runs `body` with a Spark-UI job description — the iterative loop
    * otherwise surfaces as indistinguishable AQE callsites, which makes
    * skew triage on a real cluster (and in ScaleProbe) guesswork. */
  private def described[T](spark: org.apache.spark.sql.SparkSession,
      desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(s"graft.cc: $desc")
    try body finally sc.setJobDescription(prev)
  }

  /** @param hotDegree join keys whose symmetric-edge degree reaches this
    *        are delivered by broadcast instead of shuffle (see the
    *        hot/cold decomposition below). The hot-key count is bounded
    *        by |sym|/hotDegree, so at 10¹² edges the default keeps the
    *        broadcast under ~4M rows; graphs with no such key skip the
    *        split entirely (one cheap census, plans unchanged). */
  /** Star-edge bound under which the contracted graph is FINISHED on
    * the driver (one collect + exact union-find) instead of entering
    * the iterative join loop. After [[contractLocal]] every non-root
    * node emits exactly ONE (node, local-root) edge, so the star-edge
    * count is ≤ the touched-node count and the collect is ≤ 16 bytes ×
    * bound ≈ 32 MB at the default — the broadcast-hash-join discipline
    * (a provably small side moves to one JVM) applied to the label
    * loop: below the bound the loop's per-round barriers (join + agg +
    * checkpoint + convergence check, ~10 scheduler round-trips per
    * round) buy nothing that a local pass doesn't, and ABOVE it the
    * distributed loop runs exactly as before. Labels are identical by
    * construction — both paths compute min-reachable-id, and union-find
    * with min-id roots is exact — so downstream oracle hashes and
    * cc-cache fixtures are unaffected (AlgoVersion stays). 1M edges =
    * a ≤16 MB primitive-pair collect and a LocalRelation the final
    * label join broadcasts — the same order as the existing hot-key
    * broadcast bound. */
  final val DriverFinishMaxEdges = 1000000L

  def connectedComponents(edges: DataFrame, nodes: DataFrame,
                          maxIter: Int = 50, roundsPerCheck: Int = 2,
                          checkpointDir: Option[String] = None,
                          hotDegree: Long = 500000L,
                          driverFinishMaxEdges: Long = DriverFinishMaxEdges)
      : DataFrame = {
    val spark = edges.sparkSession
    val ck = checkpointer(edges.sparkSession, checkpointDir)
    // materialize the EDGES once, then derive the symmetric set from the
    // checkpoint: the union's two branches would otherwise each re-run
    // the whole upstream pair-generation pipeline (2× there), and every
    // iteration joins against sym (N× more without materialization)
    val edgesCk = described(spark, "local contraction") {
      ck(contractLocal(edges.select(col("id_a"), col("id_b"))))
    }
    // the count scans the truncated checkpoint blocks, not the upstream
    // pair generation — one cheap job that gates the driver finish
    val nStar = described(spark, "star-edge census") { edgesCk.count() }
    if (nStar <= driverFinishMaxEdges) {
      import spark.implicits._
      val star = described(spark, "driver finish: collect") {
        edgesCk.select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
      }
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      star.foreach { case (a, b) =>
        parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb) }
      }
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size())
      parent.keySet().forEach { x => out += ((x, find(x))) }
      val labels = spark.createDataFrame(out.toSeq)
        .toDF("id", "component")
      return nodes.select(col("id"))
        .join(labels, Seq("id"), "left")
        .select(col("id"), coalesce(col("component"), col("id")).as("component"))
    }
    val sym = described(spark, "symmetrize") {
      ck(edgesCk.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(edgesCk.select(col("id_b").as("src"), col("id_a").as("dst"))))
    }
    // only edge-touched nodes can ever change label; isolated nodes are
    // their own components and rejoin at the end — the loop then works
    // on the (usually much smaller) connected subgraph. No checkpoint:
    // the frame is consumed once, into the first loop's materialization.
    val touched = sym.select(col("src").as("id")).distinct()
    var labels = touched.select(col("id"), col("id").as("component"))

    // ---- skew-resilient label delivery (hot/cold key decomposition) ----
    // The loop's two joins deliver label(x) to every row keyed by x; a
    // planted mega-component (one boilerplate family at 100 TB) makes a
    // single key carry a constant fraction of the edge list, and a
    // 20M-spoke star probe shows the whole first round serializing on it
    // (task p99 ≈ 18× median even under AQE skew-join — the shuffle of
    // the hot partition still lands on one reducer lineage). Since the
    // build side holds exactly ONE row per key, salting would replicate
    // the node-sized label frame S×; instead, deliver hot keys by
    // broadcast: the hot SET is provably tiny (≤ |sym|/hotDegree keys),
    // so labels⋉hot is a bounded broadcast no matter how hot the key.
    // dst frequencies in sym are STATIC — detect once, split sym once.
    val hotKeys = described(spark, "hot-key census") {
      ck(sym.groupBy(col("dst")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= hotDegree).select(col("dst")))
    }
    val hasHot = described(spark, "hot-key census") { !hotKeys.isEmpty }
    // LAZY split — a broadcast semi/anti-join over the checkpointed sym,
    // re-evaluated per iteration. Materializing the two halves would
    // double the pinned block-storage footprint (measured: the 20M-spoke
    // probe OOMs execution memory under the extra cached frames); one
    // additional in-memory scan of sym per round is far cheaper.
    val symHot = sym.join(broadcast(hotKeys), Seq("dst"), "left_semi")
    val symCold =
      if (!hasHot) sym
      else sym.join(broadcast(hotKeys), Seq("dst"), "left_anti")

    def propagate(cur: DataFrame, withFlag: Boolean): DataFrame = {
      val curDst = cur.select(col("id").as("dst"), col("component").as("nc"))
      // hot dsts: the label rows for hot keys are ≤ |hotKeys| — deliver
      // them broadcast so no shuffle partition owns the mega-key's rows
      val joined =
        if (!hasHot) sym.join(curDst, Seq("dst"))
        else symCold.join(curDst, Seq("dst"))
          .unionByName(symHot.join(
            broadcast(curDst.join(broadcast(hotKeys), Seq("dst"), "left_semi")),
            Seq("dst")))
      // the hot-key AGG side is already safe: min() is algebraic, so
      // map-side partial aggregation caps any src's shuffle rows at one
      // per map task
      val neighborMin = joined
        .groupBy(col("src").as("id"))
        .agg(min(col("nc")).as("nmin"))
      val stepped = cur.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("component").as("old"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("c1"))
      // pointer jumping (path halving): also adopt my label's OWN label —
      // propagation distance doubles per round, so a diameter-d chain
      // converges in O(log d) rounds instead of O(d) (measured: 16 → 5
      // rounds on the sf0.1 near-dup graph). Component ids are always
      // touched-node ids, so the self-join key always resolves.
      // Label frequencies are NOT static (the mega-component's label
      // floods c1 as it propagates), so the hot set is re-censused per
      // round with a partial-agg-safe count — one extra node-frame agg,
      // bounded like neighborMin's.
      val jump = stepped.select(col("id").as("jid"), col("c1").as("jc"))
      val jumped =
        if (!hasHot) {
          stepped.join(jump, col("c1") === col("jid"), "left")
            .select(col("id"), col("old"),
              least(col("c1"), coalesce(col("jc"), col("c1"))).as("component"))
        } else {
          val hotLab = stepped.groupBy(col("c1")).agg(count(lit(1)).as("n"))
            .filter(col("n") >= hotDegree).select(col("c1").as("hc"))
          val jumpHot = broadcast(jump.join(broadcast(hotLab),
            col("jid") === col("hc"), "left_semi"))
          val hotSide = stepped.join(broadcast(hotLab), col("c1") === col("hc"), "left_semi")
            .join(jumpHot, col("c1") === col("jid"), "left")
          val coldSide = stepped.join(broadcast(hotLab), col("c1") === col("hc"), "left_anti")
            .join(jump, col("c1") === col("jid"), "left")
          hotSide.unionByName(coldSide)
            .select(col("id"), col("old"),
              least(col("c1"), coalesce(col("jc"), col("c1"))).as("component"))
        }
      if (withFlag)
        jumped.select(col("id"), col("component"),
          (col("component") < col("old")).as("changed"))
      else
        jumped.select(col("id"), col("component"))
    }

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      var cur = labels
      for (r <- 1 until roundsPerCheck) cur = propagate(cur, withFlag = false)
      val next = described(spark, s"propagate round ${iter + 1}") {
        ck(propagate(cur, withFlag = true))
      }
      converged = described(spark, s"convergence check ${iter + 1}") {
        next.filter(col("changed")).isEmpty
      }
      labels = next.select(col("id"), col("component"))
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter×$roundsPerCheck rounds " +
          "(component diameter exceeds the cap); raise maxIter — partial labels " +
          "would silently split components")
    nodes.select(col("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }
}
