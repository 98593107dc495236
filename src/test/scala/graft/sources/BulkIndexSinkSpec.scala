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
}
