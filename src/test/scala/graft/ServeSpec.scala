package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** The HTTP query endpoint driven over a real loopback socket (the same
  * no-egress discipline as IngestSpec): SQL text in, JSONL out, capped
  * results, custom functions reachable, and errors as 400 JSON — the
  * pkg2 ad-hoc web-query shape end-to-end.
  */
class ServeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def post(url: String, body: String): HttpResponse[String] = {
    val client = HttpClient.newHttpClient()
    client.send(
      HttpRequest.newBuilder(URI.create(url))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
  }

  test("POSTed SQL with custom functions returns the same rows as a direct spark.sql") {
    GraftFunctions.ensureRegistered(spark)
    Tables.packages(spark, SparkTestHarness.Sf0001).createOrReplaceTempView("v_serve_pkg")
    val sql =
      """SELECT name, max_by(version, version_sort_key(version)) AS latest
        |FROM v_serve_pkg GROUP BY name ORDER BY name""".stripMargin
    val running = Serve.start(spark)
    try {
      val resp = post(running.url, sql)
      assert(resp.statusCode() == 200)
      val gotLines = resp.body().trim.split("\n").toSeq
      val direct = spark.sql(sql).toJSON.collect().toSeq
      assert(gotLines == direct)
      assert(gotLines.size == 60 && gotLines.head.contains("\"name\""))
    } finally running.stop()
  }

  test("the maxRows cap limits in the plan, and bad SQL returns 400 with a JSON error") {
    Tables.packages(spark, SparkTestHarness.Sf0001).createOrReplaceTempView("v_serve_pkg")
    val running = Serve.start(spark, maxRows = 5)
    try {
      val capped = post(running.url, "SELECT pkg_id FROM v_serve_pkg ORDER BY pkg_id")
      assert(capped.statusCode() == 200)
      assert(capped.body().trim.split("\n").length == 5)

      val bad = post(running.url, "SELECT definitely_not_a_column FROM v_serve_pkg")
      assert(bad.statusCode() == 400)
      assert(bad.body().startsWith("{\"error\":"))
    } finally running.stop()
  }
}
