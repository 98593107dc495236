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

  test("rowImageDiff carries before/after images for I/U/D only") {
    val old = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L))
      .toDF("k", "g", "v")
    val neu = Seq((2L, "b", 25L), (3L, "c", 30L), (4L, "a", 40L))
      .toDF("k", "g", "v")
    val got = ChangeCapture.rowImageDiff(old, neu, "k", "g", "v")
      .select($"k", $"op", $"g_old", $"v_old", $"g_new", $"v_new")
      .as[(Long, String, Option[String], Option[Long], Option[String], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == ((1L, "D", Some("a"), Some(10L), None, None)))
    assert(got(2L) == ((2L, "U", Some("b"), Some(20L), Some("b"), Some(25L))))
    assert(got(3L) == ((3L, "U", Some("a"), Some(30L), Some("c"), Some(30L)))) // group move
    assert(got(4L) == ((4L, "I", None, None, Some("a"), Some(40L))))
  }

  test("maintainAgg applies deltas: update, group move, insert, delete, zero-drop") {
    val old = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L), (5L, "z", 5L))
      .toDF("k", "g", "v")
    // 1 deleted; 2 updated in place; 3 moves a->c; 4 inserted; 5 (sole
    // member of z) deleted -> group z must vanish
    val neu = Seq((2L, "b", 25L), (3L, "c", 30L), (4L, "a", 40L))
      .toDF("k", "g", "v")
    val oldAgg = old.groupBy("g").agg(count(lit(1)).as("n_rows"), sum("v").as("total"))
    val changes = ChangeCapture.rowImageDiff(old, neu, "k", "g", "v")
    val got = ChangeCapture.maintainAgg(oldAgg, changes)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val want = neu.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("t"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == want, "maintained view must equal a recompute of the new snapshot")
    assert(!got.contains("z"), "a group whose count reaches zero is dropped")
  }

  test("maintainAgg on an empty changelog is the old view") {
    val old = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "g", "v")
    val oldAgg = old.groupBy("g").agg(count(lit(1)).as("n_rows"), sum("v").as("total"))
    val changes = ChangeCapture.rowImageDiff(old, old, "k", "g", "v")
    assert(changes.isEmpty)
    val got = ChangeCapture.maintainAgg(oldAgg, changes)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 1L, 10L), ("b", 1L, 20L)))
  }

  test("asOfVersion reconstructs every version as latest-delivery-wins") {
    val deliveries = Seq(
      (1L, 1L, "x"), (1L, 2L, "x"), (1L, 3L, "y"),
      (2L, 1L, "p"), (2L, 2L, "p"), (2L, 3L, "p"),
      (3L, 1L, "a"), (3L, 2L, "b"), (3L, 3L, "a")
    ).toDF("k", "version", "t")
    val hist = ChangeCapture.scd2(deliveries, "k", "version", Seq("t"))
    for (v <- 1L to 3L) {
      val got = ChangeCapture.asOfVersion(hist, v)
        .select($"k", $"h").as[(Long, String)].collect().toMap
      val want = deliveries.filter($"version" <= v)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("k").orderBy($"version".desc)))
        .filter($"rn" === 1)
        .select($"k", md5(concat_ws("", $"t")))
        .as[(Long, String)].collect().toMap
      assert(got == want, s"as-of $v mismatch")
      assert(got.size == 3, s"every key visible as of $v")
    }
  }

  test("scd2 plan shuffles once: a single exchange feeds both windows") {
    val deliveries = Seq((1L, 1L, "x"), (1L, 2L, "y")).toDF("k", "version", "t")
    val plan = ChangeCapture.scd2(deliveries, "k", "version", Seq("t"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one shuffle, plan:\n$plan")
  }
}
