package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class EventStreamsSpec extends SparkSpec {

  test("streaming hourly counts match the batch run of the same transform") {
    val batch = EventStreams.hourlyTypeCounts(
      graft.sources.Tables.events(spark, sf0001))
      .orderBy(col("window_start"), col("event_type")).collect().toSeq

    // Complete mode: a bounded source processed in one micro-batch never
    // advances the watermark past the tail windows, so Append would
    // (correctly) withhold them — Complete emits the full state.
    val stream = EventStreams.readEvents(spark, sf0001)
    val got = EventStreams.runToMemory(
        EventStreams.hourlyTypeCounts(stream),
        "hourly_test", OutputMode.Complete())
      .orderBy(col("window_start"), col("event_type")).collect().toSeq

    assert(got == batch)
  }

  test("stateful running totals equal batch group sums") {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sf0001)
    val expected = events.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("v"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    val stream = EventStreams.readEvents(spark, sf0001)
    val totals = EventStreams.runningUserTotals(stream)
    val q = totals.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("running_test").start()
    q.processAllAvailable(); q.stop()
    // last update per user wins
    val got = spark.table("running_test")
      .groupBy($"userId")
      .agg(max(struct($"nEvents", $"totalValue")).as("s"))
      .select($"userId", $"s.nEvents", $"s.totalValue")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == expected)
  }

  test("session windows: bounded, non-overlapping per user") {
    import spark.implicits._
    val sessions = EventStreams.userSessions(
      graft.sources.Tables.events(spark, sf0001)).cache()
    assert(sessions.count() > 0)
    val overlaps = sessions.as("a").join(sessions.as("b"),
      $"a.user_id" === $"b.user_id" &&
        $"a.session_start" < $"b.session_start" &&
        $"b.session_start" < $"a.session_end").count()
    assert(overlaps == 0)
  }

  test("flatMapGroupsWithState sessionizer matches session_window semantics") {
    import spark.implicits._
    // batch truth: built-in session_window over the same events
    val batch = EventStreams.userSessions(
        graft.sources.Tables.events(spark, sf0001))
      .select($"user_id", expr("unix_micros(session_start)"),
        expr("unix_micros(session_end)"), $"n_events", $"session_value")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty)

    val stream = EventStreams.readEvents(spark, sf0001)
    val got = EventStreams.runToMemory(
        EventStreams.sessionizeCustom(stream).toDF(), "fmgws_sessions")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.length == got.toSet.size, "duplicate session emissions")

    // every emitted session is exactly a batch session
    val gotSet = got.toSet
    assert((gotSet -- batch).isEmpty,
      s"streamed sessions not in batch truth: ${(gotSet -- batch).take(3)}")

    // completeness: every session comfortably closed before the final
    // watermark (end + 1h < max event time) must have been emitted —
    // only each user's tail session may legitimately still be open
    val maxUs = graft.sources.Tables.events(spark, sf0001)
      .select(max(expr("unix_micros(ts)"))).head().getLong(0)
    val mustEmit = batch.filter(_._3 + 3600000000L < maxUs)
    assert((mustEmit -- gotSet).isEmpty,
      s"closed sessions missing from stream: ${(mustEmit -- gotSet).take(3)}")
    assert(mustEmit.nonEmpty && gotSet.size >= mustEmit.size)
  }

  test("streaming dedup emits the same logical rows as the batch twin") {
    import spark.implicits._
    val batchEv = graft.sources.Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val expected = EventStreams.dedupEventsBatch(
        EventStreams.withDuplicateDeliveries(batchEv))
      .select($"user_id", $"ts", $"event_type", $"value")
      .as[(Long, java.sql.Timestamp, String, Double)].collect().toSet

    val stream = EventStreams.readEvents(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val got = EventStreams.runToMemory(
        EventStreams.dedupEventsStreaming(
          EventStreams.withDuplicateDeliveries(stream)),
        "dedup_test")
      .as[(Long, java.sql.Timestamp, String, Double)].collect()

    assert(got.length == got.toSet.size, "streaming dedup emitted duplicates")
    assert(got.toSet == expected)
  }

  test("checkpointed file-sink query restarts exactly-once: batch1 is " +
      "not re-emitted after recovery") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ckpt-test").toString
    val stage = s"$root/in"; val ckpt = s"$root/ckpt"; val out = s"$root/out"

    // ts reads as TIMESTAMP (µs) in this session — no nanosAsLong conf
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    // time-ordered halves so the second arrival wave is never late
    // relative to the first wave's watermark
    val cut = ev.select(expr("percentile(unix_micros(ts), 0.5)"))
      .head().getDouble(0).toLong
    val half1 = ev.filter(expr(s"unix_micros(ts) <= $cut"))
    val half2 = ev.filter(expr(s"unix_micros(ts) > $cut"))

    def startQuery() = spark.readStream
      .schema(half1.schema)
      .option("recursiveFileLookup", "true")
      .parquet(stage)
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "ts")
      .writeStream
      .format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", out)
      .start()

    half1.coalesce(1).write.parquet(s"$stage/wave1")
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    val afterWave1 = spark.read.parquet(out).count()

    half2.coalesce(1).write.parquet(s"$stage/wave2")
    val q2 = startQuery() // NEW query object, SAME checkpoint
    q2.processAllAvailable(); q2.stop()

    val finalRows = spark.read.parquet(out)
      .select($"user_id", $"ts").as[(Long, java.sql.Timestamp)].collect()
    // exactly-once across the restart: no key emitted twice, and the
    // union equals the batch dedup of both waves
    assert(finalRows.length == finalRows.toSet.size,
      "restart re-emitted rows — sink is not exactly-once")
    val expected = ev.select($"user_id", $"ts").distinct().count()
    assert(finalRows.length.toLong == expected)
    assert(afterWave1 > 0 && afterWave1 < expected,
      "wave split degenerate — restart path not actually exercised")
  }

  test("stream-stream interval join matches the batch join") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type")
    val expected = EventStreams.clickPurchaseJoin(
        ev.filter($"event_type" === "click"),
        ev.filter($"event_type" === "purchase"))
      .as[(Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty, "fixture produced no click->purchase pairs")

    val stream = EventStreams.readEvents(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type")
    val got = EventStreams.runToMemory(
        EventStreams.clickPurchaseJoinStreaming(stream), "ssjoin_test")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }
}
