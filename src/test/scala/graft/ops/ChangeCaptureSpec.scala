package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangeCaptureSpec extends SparkSpec {

  import spark.implicits._

  test("snapshotDiff classifies insert/update/delete and drops unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "t")
    val neu = Seq((2L, "b"), (3L, "C"), (4L, "d"), (5L, "e")).toDF("k", "t")
    val got = ChangeCapture.snapshotDiff(old, neu, "k", Seq("t"))
      .select("k", "op").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "D", 3L -> "U", 5L -> "I")) // 2,4 unchanged
  }

  test("snapshotDiff content hash is separator-safe across columns") {
    val old = Seq((1L, "ab", "c")).toDF("k", "x", "y")
    val neu = Seq((1L, "a", "bc")).toDF("k", "x", "y")
    val got = ChangeCapture.snapshotDiff(old, neu, "k", Seq("x", "y"))
      .select("op").as[String].collect().toSeq
    assert(got == Seq("U")) // concat without a separator would see equality
  }

  test("scd2 collapses identical re-deliveries and closes changed intervals") {
    val deliveries = Seq(
      (1L, 1L, "x"), (1L, 2L, "x"), (1L, 3L, "y"),  // change at v3
      (2L, 1L, "p"), (2L, 2L, "p"), (2L, 3L, "p"),  // never changes
      (3L, 1L, "a"), (3L, 2L, "b"), (3L, 3L, "a")   // flip-flops: 3 intervals
    ).toDF("k", "version", "t")
    val got = ChangeCapture.scd2(deliveries, "k", "version", Seq("t"))
      .select(col("k"), col("valid_from"), col("valid_to"), col("is_current"))
      .as[(Long, Long, Option[Long], Boolean)].collect().toSet
    assert(got == Set(
      (1L, 1L, Some(2L), false), (1L, 3L, None, true),
      (2L, 1L, None, true),
      (3L, 1L, Some(1L), false), (3L, 2L, Some(2L), false), (3L, 3L, None, true)))
  }

  test("scd2 plan shuffles once: a single exchange feeds both windows") {
    val deliveries = Seq((1L, 1L, "x"), (1L, 2L, "y")).toDF("k", "version", "t")
    val plan = ChangeCapture.scd2(deliveries, "k", "version", Seq("t"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one shuffle, plan:\n$plan")
  }
}
