package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {

  import spark.implicits._

  private def naive(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame) =
    left.join(right, Seq("k"))
      .filter($"ls" <= $"re" && $"rs" <= $"le")
      .select($"k", $"l_id", $"r_id")
      .as[(Long, Long, Long)].collect()

  test("bucketed join equals the naive predicate join, exactly once per pair") {
    // intervals spanning 1..4 buckets of width 10, touching endpoints,
    // disjoint pairs, and a containing interval
    val left = Seq(
      (1L, 10L, 0L, 5L), (1L, 11L, 8L, 32L), (1L, 12L, 40L, 41L),
      (2L, 20L, 0L, 100L)
    ).toDF("k", "l_id", "ls", "le")
    val right = Seq(
      (1L, 50L, 5L, 9L),   // touches 10 at 5, overlaps 11 at 8..9
      (1L, 51L, 30L, 45L), // overlaps 11 (30..32) and 12 (40..41)
      (1L, 52L, 200L, 210L), // no overlap
      (2L, 53L, 99L, 300L) // overlaps the long interval at its tail
    ).toDF("k", "r_id", "rs", "re")
    val got = IntervalJoin.overlapJoin(left, right, "k", bucketWidth = 10L)
      .select($"k", $"l_id", $"r_id").as[(Long, Long, Long)].collect()
    assert(got.length == got.distinct.length, "pairs must be emitted once")
    assert(got.toSet == naive(left, right).toSet)
    assert(got.toSet == Set((1L, 10L, 50L), (1L, 11L, 50L), (1L, 11L, 51L),
      (1L, 12L, 51L), (2L, 20L, 53L)))
  }

  test("no cartesian product in the plan") {
    val left = Seq((1L, 1L, 0L, 5L)).toDF("k", "l_id", "ls", "le")
    val right = Seq((1L, 2L, 3L, 9L)).toDF("k", "r_id", "rs", "re")
    val plan = IntervalJoin.overlapJoin(left, right, "k", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"range join must stay an equi-join, plan:\n$plan")
  }

  test("randomized cross-check against the naive join") {
    val rnd = new scala.util.Random(42)
    val left = (1L to 300L).map { i =>
      val s = rnd.nextInt(1000).toLong
      (rnd.nextInt(5).toLong, i, s, s + rnd.nextInt(80).toLong)
    }.toDF("k", "l_id", "ls", "le")
    val right = (1L to 300L).map { i =>
      val s = rnd.nextInt(1000).toLong
      (rnd.nextInt(5).toLong, i, s, s + rnd.nextInt(80).toLong)
    }.toDF("k", "r_id", "rs", "re")
    for (wdt <- Seq(7L, 64L, 1000L)) {
      val got = IntervalJoin.overlapJoin(left, right, "k", wdt)
        .select($"k", $"l_id", $"r_id").as[(Long, Long, Long)].collect()
      assert(got.length == got.distinct.length, s"dupes at width $wdt")
      assert(got.toSet == naive(left, right).toSet, s"mismatch at width $wdt")
    }
  }

  test("caller-named interval columns work without renames (ADVICE r8 #3)") {
    val left = Seq((1L, 10L, 0L, 5L), (1L, 11L, 8L, 32L))
      .toDF("k", "l_id", "win_start", "win_end")
    val right = Seq((1L, 50L, 5L, 9L), (1L, 51L, 200L, 210L))
      .toDF("k", "r_id", "err_start", "err_end")
    val got = IntervalJoin.overlapJoin(left, right, "k", 10L,
        leftStart = "win_start", leftEnd = "win_end",
        rightStart = "err_start", rightEnd = "err_end")
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 50L), (11L, 50L)))
    // ambiguous naming is rejected, not silently mis-joined
    intercept[IllegalArgumentException] {
      IntervalJoin.overlapJoin(left, right, "k", 10L,
        leftStart = "win_start", leftEnd = "win_end",
        rightStart = "win_start", rightEnd = "err_end")
    }
  }

  test("ns-scale interval bounds keep exact buckets (integer DIV, not float)") {
    // 1.7e18 ns timestamps exceed double precision; a float-division
    // bucket would misassign and drop/dup pairs
    val base = 1700000000000000000L
    val left = Seq((1L, 1L, base, base + 10L)).toDF("k", "l_id", "ls", "le")
    val right = Seq((1L, 2L, base + 5L, base + 20L)).toDF("k", "r_id", "rs", "re")
    val got = IntervalJoin.overlapJoin(left, right, "k", 1000000000L)
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }
}
