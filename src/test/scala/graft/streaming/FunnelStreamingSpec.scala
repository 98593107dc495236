package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class FunnelStreamingSpec extends SparkSpec {

  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  /** Final per-user row from Update-mode emissions: under the ordered-
    * arrival contract each reach time is set once, so min-over-
    * emissions per column IS the final state. */
  private def finalRows(updates: org.apache.spark.sql.DataFrame) =
    updates.groupBy($"userId")
      .agg(min($"t1Us").as("t1"), min($"t2Us").as("t2"), min($"t3Us").as("t3"))
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("streaming funnel over the fixture equals the batch operator") {
    val sf = "/root/testdata/sf0.001"
    val batch = graft.ops.Funnel.stepTimes(
        graft.sources.Tables.events(spark, sf),
        "user_id", "event_type", "ts", steps)
      .select($"user_id", unix_micros($"t_1"), unix_micros($"t_2"),
        unix_micros($"t_3"))
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(batch.nonEmpty)

    val got = finalRows(EventStreams.runToMemory(
      EventStreams.funnelStreaming(
        EventStreams.readEvents(spark, sf), steps).toDF(),
      "funnel_stream", OutputMode.Update()))
    assert(got == batch)
  }

  test("state carries across micro-batches; ties within a batch qualify") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long)]
    val events = ms.toDF().toDF("user_id", "event_type", "sec")
      .withColumn("ts", timestamp_micros($"sec" * 1000000L))
    val q = EventStreams.funnelStreaming(events, steps).toDF()
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_waves").start()

    // wave 1: u1 view; u2 view+click+purchase all at the SAME second
    ms.addData((1L, "view", 10L),
      (2L, "view", 10L), (2L, "purchase", 10L), (2L, "click", 10L))
    q.processAllAvailable()
    // wave 2 (later event times): u1 converts
    ms.addData((1L, "click", 20L), (1L, "purchase", 30L))
    q.processAllAvailable()
    q.stop()

    val got = finalRows(spark.table("funnel_waves"))
    def us(s: Long) = Some(s * 1000000L)
    assert(got(1L) == ((us(10), us(20), us(30))),
      "click/purchase in wave 2 must qualify against wave-1 state")
    assert(got(2L) == ((us(10), us(10), us(10))),
      "same-timestamp arrival order must not matter (step-index sort)")
  }

  test("unordered funnel: fully shuffled arrival equals the batch operator") {
    val sf = "/root/testdata/sf0.001"
    val batch = graft.ops.Funnel.stepTimes(
        graft.sources.Tables.events(spark, sf),
        "user_id", "event_type", "ts", steps)
      .select($"user_id", unix_micros($"t_1"), unix_micros($"t_2"),
        unix_micros($"t_3"))
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(batch.nonEmpty)

    // replay the fixture SHUFFLED (seeded) across 4 arbitrary waves;
    // a generous watermark delay keeps every event in-contract, so
    // the result must equal batch regardless of arrival order
    val all = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      .as[(Long, String, Long)].collect()
    val shuffled = new scala.util.Random(7).shuffle(all.toSeq)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long)]
    val events = ms.toDF().toDF("user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros($"us"))
    val q = EventStreams.funnelStreamingUnordered(events, steps,
        delay = "3650 days").toDF()
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_shuffled").start()
    shuffled.grouped((shuffled.size / 4).max(1)).foreach { wave =>
      ms.addData(wave)
      q.processAllAvailable()
    }
    q.stop()
    assert(finalRows(spark.table("funnel_shuffled")) == batch)
  }

  test("hostile delay/traffic ratio: hot-user buffer bound is enforced, answer exact") {
    // VERDICT r10 #3: state is O(users × step events inside the delay
    // window). One user emits 5000 step events under a delay wider
    // than the whole span, so NOTHING ripens until the flush — the
    // worst case the operator's contract names. The hot user's 1667
    // views compress exactly to ONE buffered row (r11), so the stored
    // bound is its 3333 clicks+purchases + 1 = 3334: the cap at
    // exactly that must pass (pinning BOTH the events-in-window bound
    // and the view compression); one unit below must fail the query
    // with the explicit contract error, never truncate.
    val base = 1000000000000000L
    val hot = (0 until 5000).map { i =>
      val ty = if (i % 3 == 0) "view" else if (i % 3 == 1) "click" else "purchase"
      (1L, ty, base + i * 1000L)
    }
    val calm = Seq((2L, "view", base + 5L), (2L, "click", base + 10L),
      (2L, "purchase", base + 20L), (3L, "view", base + 7L))
    val all = hot ++ calm
    val batch = graft.ops.Funnel.stepTimes(
        all.toDF("user_id", "event_type", "us")
          .withColumn("ts", timestamp_micros($"us")),
        "user_id", "event_type", "ts", steps)
      .select($"user_id", unix_micros($"t_1"), unix_micros($"t_2"),
        unix_micros($"t_3"))
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap

    val delaySec = 3650L * 86400L
    def run(cap: Int): Map[Long, (Option[Long], Option[Long], Option[Long])] = {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ms = MemoryStream[(Long, String, Long)]
      val events = ms.toDF().toDF("user_id", "event_type", "us")
        .withColumn("ts", timestamp_micros($"us"))
      val name = s"funnel_stress_$cap"
      val q = EventStreams.funnelStreamingUnordered(events, steps,
          delay = s"$delaySec seconds", maxBufferPerUser = Some(cap)).toDF()
        .writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName(name).start()
      try {
        new scala.util.Random(11).shuffle(all).grouped(1500).foreach { w =>
          ms.addData(w); q.processAllAvailable()
        }
        val flushBase = base + 5000000L + (delaySec + 3600L) * 1000000L
        Seq(flushBase, flushBase + 3600000000L).foreach { f =>
          ms.addData(Seq((-1L, "view", f))); q.processAllAvailable()
        }
        finalRows(spark.table(name)).filter(_._1 != -1L)
      } finally {
        q.stop()
        if (spark.catalog.tableExists(name)) spark.catalog.dropTempView(name)
      }
    }

    assert(run(3334) == batch,
      "cap = compressed events-in-window must pass and equal batch")
    val ex = intercept[Exception] { run(3333) }
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("|")
    assert(chain.contains("step events inside the watermark delay"),
      s"expected the contract error, got: $chain")
  }

  test("unordered funnel: in-delay disorder merges, beyond-watermark drops") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long)]
    val events = ms.toDF().toDF("user_id", "event_type", "sec")
      .withColumn("ts", timestamp_micros($"sec" * 1000000L))
    val q = EventStreams.funnelStreamingUnordered(events, steps,
        delay = "10 seconds").toDF()
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_disorder").start()

    // wave 1: u1 has only a click (its view is still in flight);
    // u3's lone view is older than the watermark will be after this
    // wave (max ts 50 → wm 40), so u3's armed timeout DRAINS it:
    // t1=20 finalizes and u3's frontier advances to 40.
    ms.addData((1L, "click", 48L), (2L, "view", 50L), (3L, "view", 20L))
    q.processAllAvailable()
    // wave 2: u1's view@45 arrives AFTER its click but inside the
    // delay window → merges in event-time order and qualifies the
    // click; u3's click@25 is below its fold frontier (40) → dropped
    // (batch over all events would say t2=25 — the watermark contract
    // is exactly this bounded forgetting).
    ms.addData((1L, "view", 45L), (3L, "click", 25L))
    q.processAllAvailable()
    q.stop()

    val got = finalRows(spark.table("funnel_disorder"))
    def us(s: Long) = Some(s * 1000000L)
    assert(got(1L) == ((us(45), us(48), None)),
      "in-delay disorder must merge in event-time order")
    assert(got(2L) == ((us(50), None, None)))
    assert(got(3L) == ((us(20), None, None)),
      "an event below the fold frontier must drop, not rewrite history")
  }

  test("unordered funnel honors the conversion horizon like batch (q129)") {
    val sf = "/root/testdata/sf0.001"
    val horizonSec = 72L * 3600
    val batch = graft.ops.Funnel.stepTimes(
        graft.sources.Tables.events(spark, sf),
        "user_id", "event_type", "ts", steps, maxSpanSec = Some(horizonSec))
      .select($"user_id", unix_micros($"t_1"), unix_micros($"t_2"),
        unix_micros($"t_3"))
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val all = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      .as[(Long, String, Long)].collect()
    val shuffled = new scala.util.Random(13).shuffle(all.toSeq)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long)]
    val events = ms.toDF().toDF("user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros($"us"))
    val q = EventStreams.funnelStreamingUnordered(events, steps,
        delay = "3650 days", maxSpanSec = Some(horizonSec)).toDF()
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_horizon_stream").start()
    // ONE wave, fully shuffled: with a horizon, provisional emissions
    // are not monotone (an earlier view arriving later re-anchors the
    // horizon and can retract a provisional t2/t3 — see the scaladoc),
    // so the consumable contract is latest-row-per-user; a single
    // batch makes the only emission the latest while still exercising
    // arbitrary intra-batch disorder through the buffer fold.
    ms.addData(shuffled)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel_horizon_stream")
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == batch)
    // the horizon binds somewhere on the fixture, or this proves nothing
    val unbounded = graft.ops.Funnel.stepTimes(
        graft.sources.Tables.events(spark, sf),
        "user_id", "event_type", "ts", steps)
      .select($"user_id", unix_micros($"t_1"), unix_micros($"t_2"),
        unix_micros($"t_3"))
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(batch != unbounded, "horizon must change at least one user")
  }
}
