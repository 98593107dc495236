package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BulkIndexSinkSpec extends SparkSpec {
  import spark.implicits._

  private def repos = graft.fixtures.AlbedoFixtures.reposP(spark)
    .select($"repo_id", $"repo_name", $"repo_language",
      $"repo_stargazers_count", $"repo_is_fork")

  test("sync filter mirrors the reference's stars/fork predicate") {
    val kept = repos.filter(BulkIndexSink.syncFilter(
      $"repo_stargazers_count", $"repo_is_fork"))
    assert(kept.count() > 0)
    assert(kept.filter($"repo_is_fork" ||
      $"repo_stargazers_count" < 10 ||
      $"repo_stargazers_count" > 290000).count() == 0)
  }

  test("bulk files round-trip: 2 lines per doc, ids and docs intact") {
    val docs = repos.filter(BulkIndexSink.syncFilter(
      $"repo_stargazers_count", $"repo_is_fork"))
    val n = docs.count()
    val dir = java.nio.file.Files.createTempDirectory("bulk_sink").toString
    BulkIndexSink.write(docs, "repo", "repo_id", dir, maxDocsPerFile = 100)

    val lines = spark.read.text(dir).as[String].collect()
    assert(lines.length == 2 * n, s"expected ${2 * n} lines, got ${lines.length}")

    val (actions, sources) = lines.zipWithIndex.partition(_._2 % 2 == 0)
    assert(actions.forall(_._1.startsWith("""{"index":{"_index":"repo","_id":"""")))

    // parse source docs back and compare the full row set
    val parsed = spark.read.json(sources.map(_._1).toSeq.toDS())
      .select($"repo_id", $"repo_name", $"repo_language",
        $"repo_stargazers_count", $"repo_is_fork")
    assert(parsed.as[(Long, String, String, Long, Boolean)].collect().toSet ==
      docs.select($"repo_id".cast("long"), $"repo_name", $"repo_language",
        $"repo_stargazers_count".cast("long"), $"repo_is_fork")
        .as[(Long, String, String, Long, Boolean)].collect().toSet)

    // every file respects the per-payload bound (2 lines per doc)
    val perFile = spark.read.text(dir)
      .withColumn("f", input_file_name())
      .groupBy($"f").count().as[(String, Long)].collect()
    assert(perFile.forall(_._2 <= 200))
  }

  /** Loopback HTTP server recording every received bulk request —
    * the live half of the connector edge, zero egress. */
  private def withServer(status: Int)(
      f: (String, java.util.List[(String, String)]) => Unit): Unit = {
    val received = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, String)]())
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/_bulk", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      received.add((ex.getRequestHeaders.getFirst("Content-Type"), body))
      val resp = """{"errors":false}""".getBytes
      ex.sendResponseHeaders(status, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/_bulk", received)
    finally server.stop(0)
  }

  test("live bulk POST: batched ndjson requests arrive complete") {
    val docs = (1 to 1000).map(i => (i.toLong, s"repo_$i")).toDF("id", "name")
      .repartition(4)
    withServer(200) { (url, received) =>
      val stats = BulkIndexSink.post(docs, "repo", "id", url,
        docsPerRequest = 100)
      assert(stats.docs == 1000 && stats.failedRequests == 0)
      // 4 partitions × ≤ 100 docs/request → at least 10 requests,
      // each within the page bound
      assert(stats.requests >= 10 && stats.requests.toInt == received.size)
      val bodies = scala.jdk.CollectionConverters
        .ListHasAsScala(received).asScala.toSeq
      assert(bodies.forall(_._1 == "application/x-ndjson"))
      assert(bodies.forall(_._2.endsWith("\n")),
        "_bulk requires the trailing newline")
      val lines = bodies.flatMap(_._2.split("\n"))
      val (actions, sources) = lines.zipWithIndex.partition(_._2 % 2 == 0)
      assert(actions.size == 1000 && sources.size == 1000)
      assert(actions.forall(
        _._1.startsWith("""{"index":{"_index":"repo","_id":"""")))
      // every doc id arrives exactly once (executor-parallel, no loss)
      val ids = spark.read.json(sources.map(_._1).toDS())
        .select($"id").as[Long].collect().sorted
      assert(ids.toSeq == (1L to 1000L))
      assert(bodies.forall(_._2.count(_ == '\n') <= 200))
    }
  }

  test("live bulk POST: non-2xx batches are counted, not silently dropped") {
    val docs = (1 to 10).map(i => (i.toLong, s"r$i")).toDF("id", "name")
      .coalesce(1)
    withServer(500) { (url, _) =>
      val stats = BulkIndexSink.post(docs, "repo", "id", url,
        docsPerRequest = 5)
      assert(stats.requests == 2 && stats.failedRequests == 2)
    }
  }
}
