package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Structured Streaming operators over the `events` shape
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference has no true streaming (daily batch, README.md:98,172);
  * these are the streaming-native forms of its incremental semantics
  * (SURVEY.md §2h): the high-watermark becomes `withWatermark`, the
  * nightly delta becomes a continuous windowed aggregation. Every
  * transform here works identically on a batch DataFrame (Spark's
  * unified model), which is how the specs exercise them deterministically.
  */
object EventStreams {

  /** Tumbling/sliding event-time counts with late-data bound.
    * At scale: pre-aggregation happens per partition before the shuffle
    * (partial aggregates), and the watermark bounds state size. */
  def windowedCounts(events: DataFrame, windowLen: String, slide: String,
                     lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Declarative event-time sessionization — gap-based sessions via
    * `session_window` (preferred over hand-rolled state: Catalyst plans
    * it, state cleanup is automatic under the watermark). */
  def sessionWindows(events: DataFrame, gap: String, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Stream-static enrichment join: each micro-batch joins the stream
    * against a batch-side dimension (re-read per batch, so dimension
    * updates are picked up without restarting the query). Small
    * dimensions broadcast; no state, no watermark needed — the static
    * side is not a stream. The streaming form of the J1/J2 lookups. */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
                       key: String): DataFrame =
    stream.join(dim, Seq(key), "left")

  /** Streaming exact dedup with bounded state: duplicate `event_id`s
    * arriving within the watermark are dropped; state for ids older
    * than the watermark is evicted automatically. The streaming twin of
    * the batch E1 exact dedup — at-least-once upstream delivery
    * (retries, replays) becomes effectively-once downstream. */
  def dedupWithinWatermark(events: DataFrame, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  // ---- custom state: semantics session_window cannot express ----

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class UserTotal(user_id: Long, total_value: Double, n_in_batch: Long)

  /** Spark 4 arbitrary-state API (transformWithState / StatefulProcessor
    * — the successor of flatMapGroupsWithState): per-user lifetime
    * running total, one UserTotal emitted per micro-batch the user
    * appears in. State is a single ValueState[Double] per key; a TTL
    * can bound it (TTLConfig) without hand-rolled timeout plumbing.
    * Requires the RocksDB state store provider
    * (spark.sql.streaming.stateStore.providerClass). */
  class RunningTotalProcessor extends StatefulProcessor[Long, Event, UserTotal] {
    @transient private var total: org.apache.spark.sql.streaming.ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      total = getHandle.getValueState[Double]("total", Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[UserTotal] = {
      var t = if (total.exists()) total.get() else 0.0
      var n = 0L
      rows.foreach { e => t += e.value; n += 1 }
      total.update(t)
      Iterator.single(UserTotal(user, t, n))
    }
  }

  def runningUserTotals(events: Dataset[Event])
                       (implicit spark: SparkSession): Dataset[UserTotal] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalProcessor, TimeMode.None(), OutputMode.Update())
  }
  final case class CapState(nEvents: Long, totalValue: Double)
  final case class CappedSession(user_id: Long, n_events: Long,
                                 total_value: Double, closed_by: String)

  /** Value-capped sessions: a user's session closes when accumulated
    * `value` exceeds `cap` (not expressible with session_window, which
    * only understands time gaps) — the `flatMapGroupsWithState` escape
    * hatch (SURVEY.md §2i). */
  def valueCappedSessions(events: Dataset[Event], cap: Double)
                         (implicit spark: SparkSession): Dataset[CappedSession] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[CapState]) =>
          var s = state.getOption.getOrElse(CapState(0L, 0.0))
          val out = scala.collection.mutable.Buffer[CappedSession]()
          // deterministic order within the group
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            s = CapState(s.nEvents + 1, s.totalValue + e.value)
            if (s.totalValue >= cap) {
              out += CappedSession(user, s.nEvents, s.totalValue, "cap")
              s = CapState(0L, 0.0)
            }
          }
          if (s.nEvents > 0) state.update(s) else state.remove()
          out.iterator
      }
  }

  // ---- streaming near-dup: the incremental-dedup contract unbounded ----

  final case class BandArrival(bucket: String, doc_id: Long)
  final case class NearDupHit(doc_id: Long, first_doc_id: Long, bucket: String)

  /** First-wins band-bucket registry: per bucket, state holds the FIRST
    * doc_id ever seen; every later arrival in the same bucket emits a
    * candidate hit against it. Within a micro-batch arrivals are
    * processed in doc_id order, so replays and batch boundaries cannot
    * change who owns a bucket once the owner is in state. */
  class BandFirstProcessor extends StatefulProcessor[String, BandArrival, NearDupHit] {
    @transient private var first: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      first = getHandle.getValueState[Long]("first", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(bucket: String, rows: Iterator[BandArrival],
                                 timers: TimerValues): Iterator[NearDupHit] = {
      val arrivals = rows.toSeq.sortBy(_.doc_id)
      val out = scala.collection.mutable.Buffer[NearDupHit]()
      // ownership is tracked by state EXISTENCE, not a sentinel value —
      // doc_ids are arbitrary longs (hashed/signed external ids are
      // legitimately negative) and a magic -1 would silently re-assign
      // a negative owner's bucket
      var f: Option[Long] = if (first.exists()) Some(first.get()) else None
      arrivals.foreach { a =>
        f match {
          case None => f = Some(a.doc_id)
          case Some(owner) if a.doc_id != owner =>
            out += NearDupHit(a.doc_id, owner, bucket)
          case _ => ()
        }
      }
      f.foreach(first.update)
      out.iterator
    }
  }

  /** Streaming near-dup CANDIDATES over a (doc_id, text) stream — the
    * `ext_dedup_incremental` contract with the corpus index living in
    * stream state instead of a table: minhash signatures are per-row
    * reductions (map-only, streaming-safe — no shuffle before the
    * keyed state), each band row keys the first-wins bucket registry,
    * and a doc sharing any band bucket with an earlier doc emits a hit
    * against that bucket's first arrival. Same LSH contract as the
    * batch ops: candidates, to be est_jaccard-confirmed downstream
    * (a doc can hit several buckets/owners — consumers dedup on
    * (doc_id, first_doc_id)). State is one long per live bucket; a
    * production deployment bounds the dedup horizon with a TTL
    * (TTLConfig) exactly where this passes NONE. */
  def streamingNearDupHits(docs: DataFrame)(implicit spark: SparkSession): Dataset[NearDupHit] = {
    import spark.implicits._
    val banded = graft.ext.Extensions.minhashBanded(
      graft.ext.Extensions.minhashSignatures(docs))
    banded.select(
        concat(col("band").cast("string"), lit(":"),
          col("bk").cast("string")).as("bucket"),
        col("doc_id"))
      .as[BandArrival]
      .groupByKey(_.bucket)
      .transformWithState(new BandFirstProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Stream-stream inner join with an event-time range bound: each
    * right event matches left events of the same key that happened in
    * the trailing `windowBound` before it. Both sides carry watermarks,
    * so Spark bounds the join state buffers (without the time bound a
    * stream-stream join would buffer forever — the range condition IS
    * the state-eviction contract).
    *
    * Column contract: left has (key, ts, ...), right has (key, rts, ...)
    * — distinct time-column names keep the range condition unambiguous. */
  def streamStreamJoin(left: DataFrame, right: DataFrame, key: String,
                       lateness: String, windowBound: String): DataFrame = {
    val l = left.withWatermark("ts", lateness).alias("l")
    val r = right.withWatermark("rts", lateness).alias("r")
    l.join(r,
      expr(s"l.$key = r.$key AND " +
        s"l.ts BETWEEN r.rts - INTERVAL $windowBound AND r.rts"))
  }

  /** Wire a streaming source of the events schema through a transform to
    * an in-memory sink and drain it — the test/demo harness
    * (`format("memory")` + processAllAvailable, spark_guide.md). */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String): DataFrame = {
    val q = streamed.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
