package graft.sink

/** Batched upsert sink with retry/backoff — SURVEY.md §2a S6/S7 + §2h T4.
  *
  * The reference POSTs one row per HTTP request, sequentially
  * (main.py:670-672). Here the unit of I/O is a *batch* (default 50 —
  * the reference's BATCH_SIZE, main.py:51, whose capacity it never
  * actually used), issued per partition, so at 1000 executors the sink
  * parallelizes while each connection amortizes across 50 records.
  *
  * Exactly-once is NOT promised by the transport (Spark may retry a
  * task): idempotency comes from the natural-key id map (T3), so a
  * replayed batch upserts the same targets.
  */
final case class UpsertRecord(
    naturalKey: String,
    existingId: Option[String],
    properties: Map[String, String])

final case class UpsertResult(
    naturalKey: String,
    hubspotId: Option[String],
    outcome: String, // created | updated | failed
    error: Option[String],
    attempts: Int)

/** One attempt's raw result, per record. */
final case class TransportStatus(status: Int, id: Option[String], body: String)

/** Pluggable transport: tests stub it; production implements HTTP. */
trait UpsertTransport extends Serializable {
  /** Attempt one batch; one status per record, order-aligned. */
  def send(objectType: String, batch: Seq[UpsertRecord]): Seq[TransportStatus]
}

object RetryPolicy {
  // main.py:49-53, 440-457 (observed constants, re-expressed)
  val MaxRetries = 5
  val InitialBackoffSec = 0.5
  val BackoffCapSec = 30.0
  val RetryableStatuses: Set[Int] = Set(429, 500, 502, 503, 504)
  val ExhaustedSentinel = 599

  def backoffSec(attempt: Int): Double =
    math.min(BackoffCapSec, InitialBackoffSec * math.pow(2.0, (attempt - 1).toDouble))
}

/** Wraps a transport with per-batch retry + exponential backoff.
  * Retries only the records whose status was retryable.
  *
  * `maxRequestsPerSec` > 0 adds PROACTIVE rate limiting: a
  * capacity-one token bucket enforcing a minimum gap of 1/rate between
  * transport sends (retries included — they are requests too). The
  * reference's per-row sequential loop (main.py:670-672) was
  * implicitly rate-limited by its own latency; a batched sink on a
  * wide cluster has no such brake — at 1000 concurrent sink tasks,
  * reactive 429 retries alone would stampede the target API and turn
  * every batch into its own backoff storm. The cap is PER UPSERTER
  * (= per partition task): configure it as
  * global_api_budget / max_concurrent_sink_tasks. The clock is
  * injectable so specs assert pacing without real sleeps. */
final class RetryingUpserter(
    transport: UpsertTransport,
    sleeper: Long => Unit = Thread.sleep,
    maxRequestsPerSec: Double = 0.0,
    nanoTime: () => Long = System.nanoTime) extends Serializable {

  import RetryPolicy._

  private val minGapNanos: Long =
    if (maxRequestsPerSec > 0) (1e9 / maxRequestsPerSec).toLong else 0L
  private var nextSendAt = Long.MinValue

  /** Block until a send is allowed, then reserve the next slot. */
  private def pace(): Unit = if (minGapNanos > 0) {
    val now = nanoTime()
    if (now < nextSendAt) sleeper((nextSendAt - now + 999999L) / 1000000L)
    // reserve from the LATER of now/slot so idle periods don't bank an
    // unbounded burst (capacity-one bucket, not an unbounded one)
    nextSendAt = math.max(now, nextSendAt) + minGapNanos
  }

  def upsertBatch(objectType: String, batch: Seq[UpsertRecord]): Seq[UpsertResult] = {
    val results = new Array[UpsertResult](batch.size)
    var pending: Seq[(UpsertRecord, Int)] = batch.zipWithIndex
    var attempt = 1
    while (pending.nonEmpty && attempt <= MaxRetries) {
      if (attempt > 1) sleeper((backoffSec(attempt - 1) * 1000).toLong)
      pace()
      val statuses = transport.send(objectType, pending.map(_._1))
      val next = Seq.newBuilder[(UpsertRecord, Int)]
      pending.zip(statuses).foreach { case ((rec, idx), st) =>
        if (st.status >= 200 && st.status < 300) {
          val outcome = if (rec.existingId.isDefined) "updated" else "created"
          results(idx) = UpsertResult(rec.naturalKey,
            st.id.orElse(rec.existingId), outcome, None, attempt)
        } else if (RetryableStatuses.contains(st.status) && attempt < MaxRetries) {
          next += ((rec, idx))
        } else {
          val code = if (RetryableStatuses.contains(st.status)) ExhaustedSentinel else st.status
          results(idx) = UpsertResult(rec.naturalKey, rec.existingId,
            "failed", Some(s"HTTP $code: ${st.body.take(10000)}"), attempt)
        }
      }
      pending = next.result()
      attempt += 1
    }
    results.toSeq
  }
}

/** Production transport over JDK HttpClient (no extra deps). Endpoint
  * shape mirrors a CRM-style batch upsert API: POST {base}/{objectType}
  * /batch/upsert with a JSON body of (naturalKey, id?, properties). */
final class HttpUpsertTransport(baseUrl: String, apiKey: String,
    timeoutSec: Long = 20) extends UpsertTransport {

  @transient private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(timeoutSec)).build()

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  override def send(objectType: String, batch: Seq[UpsertRecord]): Seq[TransportStatus] = {
    val body = batch.map { r =>
      val props = r.properties.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
      val idPart = r.existingId.map(i => s""""id":"${esc(i)}",""").getOrElse("")
      s"""{"naturalKey":"${esc(r.naturalKey)}",$idPart"properties":$props}"""
    }.mkString("""{"inputs":[""", ",", "]}")
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"$baseUrl/crm/v3/objects/$objectType/batch/upsert"))
      .timeout(java.time.Duration.ofSeconds(timeoutSec))
      .header("Authorization", s"Bearer $apiKey")
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    try {
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      // Response contract: {"results":[{"id":"..."},...]} order-aligned
      // with the request inputs. Ids MUST be captured on create — the
      // id map is the engine's idempotency source (T3): a created
      // record without its id would be re-created on every later run.
      val ids: Seq[Option[String]] = {
        val found = HttpUpsertTransport.IdPattern.findAllMatchIn(resp.body()).map(m => m.group(1)).toSeq
        if (found.size == batch.size) found.map(Some(_))
        else batch.map(_ => None)
      }
      batch.zip(ids).map { case (_, id) =>
        TransportStatus(resp.statusCode(), id, resp.body().take(1000))
      }
    } catch {
      case e: Exception =>
        batch.map(_ => TransportStatus(598, None, String.valueOf(e.getMessage)))
    }
  }
}

object HttpUpsertTransport {
  private[sink] val IdPattern = """"id"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
}
