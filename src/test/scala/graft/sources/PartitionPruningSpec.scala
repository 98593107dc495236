package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PartitionPruningSpec extends SparkSpec {

  test("partitioned snapshot prunes partitions at planning time") {
    val path = Files.createTempDirectory("part").toString + "/events_by_type"
    val events = Tables.events(spark, sf0001)
    Snapshots.writePartitioned(events.select(col("event_id"), col("user_id"),
      col("value"), col("event_type")), path, Seq("event_type"))

    val pruned = spark.read.parquet(path)
      .filter(col("event_type") === "purchase")
    val plan = pruned.queryExecution.executedPlan.toString

    // the partition predicate must appear as a PartitionFilter on the
    // scan, and the scan must read only the matching directory
    assert(plan.contains("PartitionFilters"), plan.take(500))
    assert(plan.contains("event_type"), plan.take(500))
    val expected = events.filter(col("event_type") === "purchase").count()
    assert(pruned.count() == expected)

    // row-group pushdown for data predicates still applies on top
    val both = spark.read.parquet(path)
      .filter(col("event_type") === "purchase" && col("value") > 100)
    assert(both.count() ==
      events.filter(col("event_type") === "purchase" && col("value") > 100).count())
  }
}
