package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static join — the dimension-enrichment mode Structured
  * Streaming supports with NO state store (the static side is planned
  * per micro-batch; broadcast here, so enrichment is map-side). The
  * remaining §2.11 join mode next to stream-stream (q69) and the
  * stateful ops. */
class StreamStaticJoinSpec extends SparkSpec {

  import spark.implicits._

  test("streaming enrichment equals the batch join across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")

    val ms = MemoryStream[(Long, Long)]
    val joined = ms.toDF().toDF("user_id", "value")
      .join(broadcast(dim), Seq("user_id"), "left")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()

    ms.addData((1L, 10L), (3L, 30L)) // 3 has no dim row -> null segment
    q.processAllAvailable()
    ms.addData((2L, 20L), (1L, 11L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ss_join")
      .as[(Long, Long, Option[String])].collect().toSet
    val want = Seq((1L, 10L), (3L, 30L), (2L, 20L), (1L, 11L))
      .toDF("user_id", "value").join(broadcast(dim), Seq("user_id"), "left")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(got == want)
    assert(got.contains((3L, 30L, None)), "left semantics preserve unmatched")

    // no state store involved: the plan has no stateful operator
    val plan = joined.queryExecution.analyzed.toString
    assert(!plan.contains("StateStore"), plan)
  }
}
