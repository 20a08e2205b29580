package graft.annotate

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** HTTP implementation of [[Annotator.Batch]] — the concrete
  * RobotReviewer client the stub stands in for offline (reference
  * protocol: pubmed.py:320-345 `predict`, driven at batch_size=100 by
  * `annotate_rcts`, pubmed.py:560-635):
  *
  *   1. POST `{base}/queue-documents` with
  *      `{"articles": [...], "robots": tasks, "filter_rcts": ...}`
  *      and the `api-key` header; a response without `report_id` is a
  *      hard error (the reference raises, never retries the POST);
  *   2. GET `{base}/report-status/{id}` every 300 ms until
  *      `state == "SUCCESS"` (the reference polls unbounded; here a
  *      generous deadline turns a dead service into a loud task
  *      failure instead of a hung executor — the one deliberate
  *      divergence, because a Spark task that sleeps forever poisons
  *      its whole slot). Gateway 502/503/504 blips and connection
  *      drops on the GETs consume a bounded per-chunk
  *      `transientRetryBudget` before failing loudly (the POST is
  *      never retried — a retried POST double-queues the batch);
  *   3. GET `{base}/report/{id}` and map each entry through the SAME
  *      post-processing as the reference's insert loop: num_randomized
  *      of `"not found"` or > 1,000,000 → null (P10,
  *      pubmed.py:611-613), prob_low_rob from bias_ab_bot, punchline
  *      text/effect from punchline_bot.
  *
  * Executor shape: [[Annotator.annotateNew]] calls `annotate` once per
  * PARTITION, so each task makes ceil(rows/batchSize) round-trips and
  * the client/mapper are per-instance lazies (re-created after
  * deserialization on each executor, never serialized). Concurrency at
  * 100 TB is partition-parallel POSTs — the service's queue is the
  * rate limiter, exactly as in the reference's sequential loop scaled
  * out; batchSize stays the protocol's 100 (5000 is the reference's
  * ceiling for the cheaper classify endpoint).
  *
  * AnnotatorHttpSpec drives this against an in-process mock server and
  * pins the protocol (batch fan-out, api-key, poll-until-success,
  * missing report_id error) plus a stub/HTTP differential on the same
  * fixture.
  */
final class AnnotatorHttp(
    baseUrl: String,
    apiKey: String,
    batchSize: Int = 100,
    tasks: Seq[String] =
      Seq("pico_span_bot", "sample_size_bot", "bias_ab_bot", "punchline_bot"),
    filterRcts: String = "none",
    pollIntervalMs: Long = 300L,
    pollDeadlineMs: Long = 600000L,
    transientRetryBudget: Int = 10) extends Annotator.Batch {
  require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
  require(transientRetryBudget >= 0,
    s"transientRetryBudget must be >= 0, got $transientRetryBudget")

  // normalize once: raw concatenation against a slashless base would
  // silently target /rrqueue-documents-style paths
  private val base: String =
    if (baseUrl.endsWith("/")) baseUrl else baseUrl + "/"

  @transient private lazy val http: HttpClient = HttpClient.newHttpClient()
  @transient private lazy val mapper: ObjectMapper = new ObjectMapper()

  def annotate(batch: Iterator[(Long, String)])
      : Iterator[Annotator.Annotation] =
    batch.grouped(batchSize).flatMap(annotateChunk)

  private def checked(resp: HttpResponse[String], what: String): JsonNode = {
    if (resp.statusCode() / 100 != 2)
      throw new IllegalStateException(
        s"$what returned HTTP ${resp.statusCode()}: " +
          resp.body().take(200))
    mapper.readTree(resp.body())
  }

  /** One GET, no retry — the POST's (`queue-documents` is never
    * retried, matching the reference, because a retried POST would
    * queue the batch twice).
    */
  private def get(path: String): JsonNode = {
    val req = HttpRequest.newBuilder(URI.create(base + path))
      .header("api-key", apiKey).GET().build()
    checked(http.send(req, HttpResponse.BodyHandlers.ofString()), s"GET $path")
  }

  /** GET with a bounded transient-failure budget: a gateway 502/503/
    * 504 or a connection-level IOException — the blips a loaded
    * RobotReviewer deployment emits while its queue drains — consumes
    * one unit of `budget` and retries after `pollIntervalMs`; any
    * other non-2xx stays a HARD error exactly as in [[checked]] (the
    * reference treats protocol errors as fatal, and a 4xx repeated N
    * times is still a 4xx). The budget is PER CHUNK and shared across
    * that chunk's whole poll conversation, so a flapping service
    * cannot stretch one batch indefinitely: at most
    * `transientRetryBudget` extra round-trips, then the task fails
    * loudly with the budget in the message.
    */
  private def getTransientSafe(path: String,
      budget: java.util.concurrent.atomic.AtomicInteger): JsonNode = {
    while (true) {
      val transient =
        try {
          val req = HttpRequest.newBuilder(URI.create(base + path))
            .header("api-key", apiKey).GET().build()
          val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
          if (Set(502, 503, 504).contains(resp.statusCode()))
            s"HTTP ${resp.statusCode()}"
          else return checked(resp, s"GET $path")
        } catch {
          case e: java.io.IOException => s"${e.getClass.getSimpleName}"
        }
      if (budget.decrementAndGet() < 0)
        throw new IllegalStateException(
          s"GET $path still failing ($transient) after " +
            s"$transientRetryBudget transient retries — service down, " +
            "not flapping")
      Thread.sleep(pollIntervalMs)
    }
    throw new IllegalStateException("unreachable")
  }

  private def annotateChunk(chunk: Seq[(Long, String)])
      : Seq[Annotator.Annotation] = {
    val root = mapper.createObjectNode()
    val articles = root.putArray("articles")
    chunk.foreach { case (id, text) =>
      val a = articles.addObject()
      a.put("pmid", id)
      a.put("ab", text)
    }
    val robots = root.putArray("robots")
    tasks.foreach(robots.add)
    root.put("filter_rcts", filterRcts)

    val post = HttpRequest.newBuilder(URI.create(base + "queue-documents"))
      .header("api-key", apiKey)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(root)))
      .build()
    val queued = checked(
      http.send(post, HttpResponse.BodyHandlers.ofString()), "queue-documents")
    if (!queued.hasNonNull("report_id"))
      throw new IllegalStateException(
        s"Invalid response for RobotReviewer API request: $queued")
    val reportId = queued.get("report_id").asText()

    val deadline = System.nanoTime() + pollDeadlineMs * 1000000L
    val budget =
      new java.util.concurrent.atomic.AtomicInteger(transientRetryBudget)
    var state = getTransientSafe(s"report-status/$reportId", budget)
      .path("state").asText()
    while (state != "SUCCESS") {
      // celery-style terminal failures must fail NOW, not spin the
      // full deadline and then blame the clock
      if (state == "FAILURE" || state == "REVOKED")
        throw new IllegalStateException(
          s"report $reportId ended in terminal state $state")
      if (System.nanoTime() > deadline)
        throw new IllegalStateException(
          s"report $reportId not ready within ${pollDeadlineMs} ms " +
            s"(last state: $state)")
      Thread.sleep(pollIntervalMs)
      state = getTransientSafe(s"report-status/$reportId", budget)
        .path("state").asText()
    }

    val report = getTransientSafe(s"report/$reportId", budget)
    val out = Vector.newBuilder[Annotator.Annotation]
    val it = report.path("annotations").elements()
    while (it.hasNext) {
      val a = it.next()
      val rawN = a.path("sample_size_bot").path("num_randomized")
      // P10 sanity guard, the reference's insert-loop post-processing
      val num =
        if (!rawN.isNumber) None
        else Some(rawN.asLong()).filter(_ <= 1000000L)
      out += Annotator.Annotation(
        a.path("pmid").asLong(),
        num,
        a.path("bias_ab_bot").path("prob_low_rob").asDouble(),
        a.path("punchline_bot").path("punchline_text").asText(),
        a.path("punchline_bot").path("effect").asText())
    }
    out.result()
  }
}
