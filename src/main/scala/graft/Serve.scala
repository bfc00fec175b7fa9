package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.SparkSession

/** Ad-hoc HTTP query endpoint — the SERVING half of the reference's shape
  * (pkg2 kept a web front-end next to its metadata store: vendored JS
  * evidence `/root/reference/.vscode/settings.json:8`; [[Ingest]] is the
  * fetch-then-cache half). POST SQL text to `/query`, get JSONL rows back
  * — the transport for every text surface the engine already exposes:
  * plain SQL + custom functions (q132), native recursive CTEs (q180), and
  * BEGIN…END scripting (q198).
  *
  * Deliberately JDK-only (`com.sun.net.httpserver`, same as the ingest
  * loopback tests): no server framework, no new dependency. The hosting
  * session decides which views/functions exist; the endpoint adds exactly
  * two policies of its own:
  *   - results are capped at `maxRows` via `limit()` IN THE PLAN — the
  *     cap prunes before collection, so an accidental `SELECT *` over the
  *     corpus cannot OOM the driver;
  *   - failures come back as HTTP 400 with a JSON error body — analysis
  *     errors are the caller's bug, not a server crash;
  *   - requests run CONCURRENTLY on a fixed `workers` thread pool (the
  *     default JDK executor is single-threaded — one slow query would
  *     convoy every caller), and each request thread tags its jobs into
  *     its own Spark scheduler pool, so under `spark.scheduler.mode=FAIR`
  *     (the session config Verify/Bench/tests run with) concurrent
  *     queries time-slice the cluster instead of queueing FIFO behind
  *     the first big scan.
  */
object Serve {
  final case class Running(server: HttpServer, port: Int,
      exec: java.util.concurrent.ExecutorService) {
    def url: String = s"http://127.0.0.1:$port/query"
    def diagUrl: String = s"http://127.0.0.1:$port/diag"
    def stop(): Unit = { server.stop(0); exec.shutdown() }
  }

  private def jsonQuote(s: String): String =
    "\"" + Option(s).getOrElse("").flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Start serving `spark`'s SQL surface on 127.0.0.1:`port` (0 = pick a
    * free port). The caller owns the lifecycle via [[Running.stop]].
    */
  def start(spark: SparkSession, port: Int = 0, maxRows: Int = 1000,
      workers: Int = 8): Running = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    val exec = java.util.concurrent.Executors.newFixedThreadPool(workers)
    server.setExecutor(exec)
    server.createContext("/query", { exchange =>
      try {
        // per-request scheduler pool (local properties are thread-local):
        // under FAIR mode each in-flight query gets its own pool and they
        // share executors round-robin; under FIFO this is a harmless tag
        spark.sparkContext.setLocalProperty("spark.scheduler.pool",
          s"serve-${Thread.currentThread().getId}")
        val sqlText = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
        try {
          val rows = spark.sql(sqlText).limit(maxRows).toJSON.collect()
          val bytes = (rows.mkString("\n") + "\n").getBytes("UTF-8")
          exchange.getResponseHeaders.set("Content-Type", "application/x-ndjson")
          exchange.sendResponseHeaders(200, bytes.length.toLong)
          exchange.getResponseBody.write(bytes)
        } catch {
          case e: Throwable =>
            val bytes = s"""{"error":${jsonQuote(e.getMessage)}}""".getBytes("UTF-8")
            exchange.getResponseHeaders.set("Content-Type", "application/json")
            exchange.sendResponseHeaders(400, bytes.length.toLong)
            exchange.getResponseBody.write(bytes)
        }
      } finally exchange.close()
    })
    // optimizer diagnostics over the wire (VERDICT r16 item 8): the
    // operator asking "why didn't my join flip" is talking to THIS
    // endpoint, not to Scala. GET /diag returns the serving session's
    // RuleDiag buffer as JSONL — serialized entirely driver-side from the
    // in-memory records, so the read schedules zero Spark jobs and can
    // never perturb the plans it explains. Recording still requires
    // `spark.graft.diag.enabled` on the serving session (the usual opt-in);
    // an unenabled session answers with an empty body.
    server.createContext("/diag", { exchange =>
      // same error posture as /query (ADVICE r17): a serialization failure
      // answers with a JSON 500 body instead of a silently-closed exchange,
      // and the read-only surface rejects every non-GET method with 405 —
      // a POST here is a caller confusing the two endpoints, not a query
      try {
        if (exchange.getRequestMethod != "GET") {
          val bytes = """{"error":"/diag is read-only: use GET"}""".getBytes("UTF-8")
          exchange.getResponseHeaders.set("Content-Type", "application/json")
          exchange.getResponseHeaders.set("Allow", "GET")
          exchange.sendResponseHeaders(405, bytes.length.toLong)
          exchange.getResponseBody.write(bytes)
        } else try {
          val rows = graft.plans.RuleDiag.records(spark).map { case (r, d, re, n) =>
            s"""{"rule":${jsonQuote(r)},"decision":${jsonQuote(d)},""" +
              s""""reason":${jsonQuote(re)},"n_plans":$n}"""
          }
          val bytes = (rows.mkString("\n") + "\n").getBytes("UTF-8")
          exchange.getResponseHeaders.set("Content-Type", "application/x-ndjson")
          exchange.sendResponseHeaders(200, bytes.length.toLong)
          exchange.getResponseBody.write(bytes)
        } catch {
          case e: Throwable =>
            val bytes = s"""{"error":${jsonQuote(e.getMessage)}}""".getBytes("UTF-8")
            exchange.getResponseHeaders.set("Content-Type", "application/json")
            exchange.sendResponseHeaders(500, bytes.length.toLong)
            exchange.getResponseBody.write(bytes)
        }
      } finally exchange.close()
    })
    server.start()
    Running(server, server.getAddress.getPort, exec)
  }
}
