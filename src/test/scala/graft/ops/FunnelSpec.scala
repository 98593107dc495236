package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val steps = Seq("view", "click", "purchase")

  test("stepTimes enforces strict step order") {
    val ev = Seq(
      // u1: clean view -> click -> purchase
      (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      // u2: click BEFORE any view never qualifies; later click does
      (2L, "click", ts(5)), (2L, "view", ts(10)), (2L, "click", ts(15)),
      // u3: purchase before its qualifying click — step 3 not reached
      (3L, "view", ts(10)), (3L, "purchase", ts(15)), (3L, "click", ts(20)),
      // u4: view only
      (4L, "view", ts(10))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.stepTimes(ev, "user_id", "event_type", "ts", steps)
      .select($"user_id", unix_micros($"t_1"), unix_micros($"t_2"),
        unix_micros($"t_3"))
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    def us(s: Long) = Some(s * 1000000L)
    assert(got(1L) == ((us(10), us(20), us(30))))
    assert(got(2L) == ((us(10), us(15), None)), "pre-view click must not count")
    assert(got(3L) == ((us(10), us(20), None)), "pre-click purchase must not count")
    assert(got(4L) == ((us(10), None, None)))
  }

  test("equal-timestamp events count for the next step (RANGE frame)") {
    val ev = Seq(
      (1L, "view", ts(10)), (1L, "click", ts(10)), (1L, "purchase", ts(10))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.stepTimes(ev, "user_id", "event_type", "ts", steps)
      .select(unix_micros($"t_3")).as[Option[Long]].collect().head
    assert(got.contains(10000000L),
      "a tie at the same ts must reach step 3 regardless of sort order")
  }

  test("earliest qualifying occurrence wins, not a later re-conversion") {
    val ev = Seq(
      (1L, "view", ts(10)), (1L, "click", ts(20)),
      (1L, "view", ts(30)), (1L, "click", ts(40))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.stepTimes(ev, "user_id", "event_type", "ts", steps)
      .select(unix_micros($"t_1"), unix_micros($"t_2"))
      .as[(Option[Long], Option[Long])].collect().head
    assert(got == ((Some(10000000L), Some(20000000L))))
  }

  test("horizon bounds later steps to the first step-1 time") {
    val ev = Seq(
      // u1: click inside 100s horizon, purchase outside -> step 3 unreached
      (1L, "view", ts(0)), (1L, "click", ts(50)), (1L, "purchase", ts(150)),
      // u2: all inside
      (2L, "view", ts(0)), (2L, "click", ts(50)), (2L, "purchase", ts(99)),
      // u3: a second view at t=200 does NOT restart the clock
      (3L, "view", ts(0)), (3L, "view", ts(200)), (3L, "click", ts(250))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.stepTimes(ev, "user_id", "event_type", "ts", steps,
        maxSpanSec = Some(100L))
      .select($"user_id", unix_micros($"t_2"), unix_micros($"t_3"))
      .as[(Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((Some(50000000L), None)))
    assert(got(2L) == ((Some(50000000L), Some(99000000L))))
    assert(got(3L) == ((None, None)), "horizon anchors at the FIRST view")
  }

  test("summary counts and ppm conversions") {
    val ev = Seq(
      (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      (2L, "view", ts(10)), (2L, "click", ts(20)),
      (3L, "view", ts(10)),
      (4L, "view", ts(10))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.summary(ev, "user_id", "event_type", "ts", steps)
      .select($"step", $"n_reached", $"conv_prev_ppm", $"conv_first_ppm")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1, 4L, 1000000L, 1000000L),
      (2, 2L, 500000L, 500000L),     // 2/4 from step 1
      (3, 1L, 500000L, 250000L)))    // 1/2 from step 2, 1/4 from first
  }

  test("plan shuffles once on the entity key") {
    val ev = Seq((1L, "view", ts(10)), (1L, "click", ts(20)))
      .toDF("user_id", "event_type", "ts")
    val plan = Funnel.stepTimes(ev, "user_id", "event_type", "ts", steps)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one shuffle, plan:\n$plan")
  }
}
