package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  test("local master resolves to localCheckpoint and preserves rows") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .withColumn("twice", col("id") * 2)
    val cut = Checkpoints.cut(df)
    // lineage is cut: the plan is a scan of checkpointed blocks, not
    // the original project over a LocalRelation
    assert(cut.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.getClass.getSimpleName.contains("LogicalRDD")))
    assert(cut.orderBy("id").as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "a", 2L), (2L, "b", 4L), (3L, "c", 6L)))
  }

  test("lazy cut materializes on first action and stays consistent") {
    val df = spark.range(100).withColumn("h", xxhash64(col("id")))
    val cut = Checkpoints.cut(df, eager = false)
    val n = cut.filter(col("h") % 2 === 0).count()
    // second action reads the same materialized blocks
    assert(cut.filter(col("h") % 2 === 0).count() == n)
    assert(cut.count() == 100)
  }
}
