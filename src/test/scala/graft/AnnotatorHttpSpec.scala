package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import graft.annotate.{Annotator, AnnotatorHttp}

/** The concrete RobotReviewer protocol client against an in-process
  * mock service: batch fan-out at the reference's batch size, api-key
  * on every request, poll-until-SUCCESS cadence, loud failure on a
  * response without report_id, and the client-side sample-size guard
  * ("not found" / > 1e6 → null). The headline check is differential:
  * the HTTP path over a fixture must equal the deterministic Stub
  * over the same fixture, with the mock serving Stub-derived payloads
  * whose sample sizes are PRE-guard (so guard bugs cannot cancel out).
  */
class AnnotatorHttpSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  /** Mock RobotReviewer: queue-documents → report_id; report-status
    * PENDING twice per report, then SUCCESS; report → Stub-derived
    * annotations with raw sample sizes.
    */
  private final class Mock {
    val posts = new AtomicInteger(0)
    val statusCalls = new AtomicInteger(0)
    @volatile var failNextQueue = false
    @volatile var failStatus = false
    @volatile var sawBadApiKey = false
    /** next N report-status calls answer 503 (then behave normally) */
    val transient503 = new AtomicInteger(0)
    /** every report-status call answers 503 — a dead gateway */
    @volatile var always503Status = false
    /** next queue-documents POST answers 503 */
    @volatile var post503Next = false
    private val reports =
      new java.util.concurrent.ConcurrentHashMap[String, Seq[(Long, String)]]()
    private val statusPerReport =
      new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    private val nextId = new AtomicInteger(0)

    private def reply(x: HttpExchange, body: String, status: Int = 200): Unit = {
      val b = body.getBytes("UTF-8")
      x.sendResponseHeaders(status, b.length.toLong)
      x.getResponseBody.write(b)
      x.close()
    }

    private def checkKey(x: HttpExchange): Unit =
      if (x.getRequestHeaders.getFirst("api-key") != "k-test")
        sawBadApiKey = true

    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/queue-documents", (x: HttpExchange) => {
      checkKey(x)
      posts.incrementAndGet()
      if (post503Next) { post503Next = false; reply(x, "busy", 503) }
      else if (failNextQueue) { failNextQueue = false; reply(x, """{"error":"no"}""") }
      else {
        val root = mapper.readTree(x.getRequestBody)
        val arts = Vector.newBuilder[(Long, String)]
        val it = root.path("articles").elements()
        while (it.hasNext) {
          val a = it.next()
          arts += ((a.path("pmid").asLong(), a.path("ab").asText()))
        }
        val id = s"r${nextId.incrementAndGet()}"
        reports.put(id, arts.result())
        statusPerReport.put(id, new AtomicInteger(0))
        reply(x, s"""{"report_id":"$id"}""")
      }
    })
    server.createContext("/report-status/", (x: HttpExchange) => {
      checkKey(x)
      statusCalls.incrementAndGet()
      if (always503Status || transient503.getAndUpdate(n => math.max(0, n - 1)) > 0)
        reply(x, "busy", 503)
      else {
        val id = x.getRequestURI.getPath.split("/").last
        val n = statusPerReport.get(id).incrementAndGet()
        reply(x,
          if (failStatus) """{"state":"FAILURE"}"""
          else if (n <= 2) """{"state":"PENDING"}"""
          else """{"state":"SUCCESS"}""")
      }
    })
    server.createContext("/report/", (x: HttpExchange) => {
      checkKey(x)
      val id = x.getRequestURI.getPath.split("/").last
      val root = mapper.createObjectNode()
      val anns = root.putArray("annotations")
      Annotator.Stub.annotate(reports.get(id).iterator).foreach { st =>
        val a = anns.addObject()
        a.put("pmid", st.doc_id)
        val ss = a.putObject("sample_size_bot")
        st.num_randomized match {
          case Some(n) => ss.put("num_randomized", n)
          // PRE-guard payloads: the service reports these raw; the
          // CLIENT must null them (both reference branches covered)
          case None if st.doc_id % 2 == 0 => ss.put("num_randomized", "not found")
          case None => ss.put("num_randomized", 1500000L)
        }
        a.putObject("bias_ab_bot").put("prob_low_rob", st.prob_low_rob)
        val p = a.putObject("punchline_bot")
        p.put("punchline_text", st.punchline_text)
        p.put("effect", st.effect)
      }
      reply(x, mapper.writeValueAsString(root))
    })
    server.start()
    def base: String = s"http://localhost:${server.getAddress.getPort}/"
    def stop(): Unit = server.stop(0)
  }

  private def fixture(n: Int): Seq[(Long, String)] =
    (1 to n).map(i => (i.toLong,
      s"trial $i randomized ${i * 37} patients into two arms and measured stuff"))

  test("HTTP path equals Stub on the same fixture; batches and polls per protocol") {
    val mock = new Mock
    try {
      val docs = fixture(25)
      val client = new AnnotatorHttp(mock.base, "k-test", batchSize = 10,
        pollIntervalMs = 5L)
      val got = client.annotate(docs.iterator).toSeq
      val want = Annotator.Stub.annotate(docs.iterator).toSeq
      assert(got === want)
      assert(!mock.sawBadApiKey, "a request went out without the api key")
      assert(mock.posts.get() === 3, "25 docs at batchSize=10 must be 3 POSTs")
      // 2 PENDINGs + 1 SUCCESS per report minimum
      assert(mock.statusCalls.get() >= 9, s"poll loop short: ${mock.statusCalls.get()}")
    } finally mock.stop()
  }

  test("missing report_id is a loud error, as in the reference") {
    val mock = new Mock
    try {
      mock.failNextQueue = true
      val client = new AnnotatorHttp(mock.base, "k-test", pollIntervalMs = 5L)
      val e = intercept[IllegalStateException] {
        client.annotate(fixture(3).iterator).toSeq
      }
      assert(e.getMessage.contains("Invalid response"))
    } finally mock.stop()
  }

  test("terminal FAILURE state fails immediately, not at the poll deadline") {
    val mock = new Mock
    try {
      mock.failStatus = true
      // a deadline far above the test budget: passing proves the
      // terminal state short-circuited, not the clock
      val client = new AnnotatorHttp(mock.base, "k-test",
        pollIntervalMs = 5L, pollDeadlineMs = 600000L)
      val t0 = System.nanoTime()
      val e = intercept[IllegalStateException] {
        client.annotate(fixture(2).iterator).toSeq
      }
      assert(e.getMessage.contains("terminal state FAILURE"))
      assert((System.nanoTime() - t0) / 1e9 < 30.0)
    } finally mock.stop()
  }

  test("transient 503 blips on status polls are absorbed by the retry budget") {
    val mock = new Mock
    try {
      mock.transient503.set(3)
      val docs = fixture(4)
      val client = new AnnotatorHttp(mock.base, "k-test",
        pollIntervalMs = 5L, transientRetryBudget = 10)
      val got = client.annotate(docs.iterator).toSeq
      assert(got === Annotator.Stub.annotate(docs.iterator).toSeq,
        "3 x 503 then PENDING/SUCCESS must still produce the full result")
      // 3 x 503 + 2 PENDING + 1 SUCCESS on the status path
      assert(mock.statusCalls.get() >= 6)
      assert(mock.posts.get() === 1, "the POST must never be re-sent")
    } finally mock.stop()
  }

  test("a dead gateway exhausts the budget: exactly budget+1 attempts, loud error") {
    val mock = new Mock
    try {
      mock.always503Status = true
      val client = new AnnotatorHttp(mock.base, "k-test",
        pollIntervalMs = 5L, transientRetryBudget = 4)
      val e = intercept[IllegalStateException] {
        client.annotate(fixture(2).iterator).toSeq
      }
      assert(e.getMessage.contains("transient retries"))
      assert(e.getMessage.contains("4"), "error must state the budget")
      // the budget is a HARD cap on extra round-trips: 1 first try + 4
      // retries, never an unbounded hammer on a downed service
      assert(mock.statusCalls.get() === 5,
        s"expected exactly 5 status calls, saw ${mock.statusCalls.get()}")
      assert(mock.posts.get() === 1)
    } finally mock.stop()
  }

  test("a 503 on the POST is a hard error, never a double-queue retry") {
    val mock = new Mock
    try {
      mock.post503Next = true
      val client = new AnnotatorHttp(mock.base, "k-test",
        pollIntervalMs = 5L, transientRetryBudget = 10)
      val e = intercept[IllegalStateException] {
        client.annotate(fixture(2).iterator).toSeq
      }
      assert(e.getMessage.contains("503"))
      assert(mock.posts.get() === 1,
        "queue-documents must not be retried — a second POST queues twice")
    } finally mock.stop()
  }

  test("slashless base URL is normalized, not concatenated into a 404") {
    val mock = new Mock
    try {
      val client = new AnnotatorHttp(mock.base.dropRight(1), "k-test",
        pollIntervalMs = 5L)
      val got = client.annotate(fixture(3).iterator).toSeq
      assert(got === Annotator.Stub.annotate(fixture(3).iterator).toSeq)
    } finally mock.stop()
  }

  test("annotateNew drives the HTTP client from executors end to end") {
    val spark = TestSpark.spark
    import spark.implicits._
    val mock = new Mock
    try {
      val cands = fixture(40).toDF("doc_id", "text")
      val done = Seq(1L, 2L).toDF("doc_id")
      val client = new AnnotatorHttp(mock.base, "k-test", batchSize = 7,
        pollIntervalMs = 5L)
      val viaHttp = Annotator.annotateNew(cands, done, client)
        .collect().sortBy(_.doc_id).toSeq
      val viaStub = Annotator.annotateNew(cands, done, Annotator.Stub)
        .collect().sortBy(_.doc_id).toSeq
      assert(viaHttp === viaStub)
      assert(viaHttp.map(_.doc_id) === (3L to 40L))
      assert(!mock.sawBadApiKey)
    } finally mock.stop()
  }
}
