package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val events = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("value"))
    val users = Tables.events(spark, sf0001)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))

    events.write.mode("overwrite")
      .bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("ev_bucketed")
    users.write.mode("overwrite")
      .bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("u_bucketed")

    // co-located join: both sides pre-bucketed on the key → planner
    // must not insert a shuffle on either side
    val joined = spark.table("ev_bucketed")
      .join(spark.table("u_bucketed"), Seq("user_id"))
    joined.count() // force execution so the final plan materializes
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(800))
    assert(joined.count() == events.count())
  }
}
