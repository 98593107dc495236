package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table.
  *
  * The reference is batch-only (SURVEY.md §2.11): its freshness model is
  * daily snapshots. This module adds the streaming ingest path a
  * production deployment of the same engine needs: identical
  * transformations declared once and run over `readStream`, with
  * watermarked event-time windows and stateful per-key aggregation.
  *
  * Scale design: windowed aggs are partial-aggregated per micro-batch
  * and state-store backed; state is keyed by (window, event_type) or
  * user_id — bounded by watermark expiry, so state size is
  * O(active keys), not O(stream length).
  */
object EventStreams {

  /** Schema of the events fixture as read with nanosAsLong. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) surfaces as long ns
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over the fixture directory (file-source
    * micro-batches; glob keeps it to the events table). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Event-time hourly counts per event_type with a 10-minute watermark
    * for late data. Works identically on a batch DataFrame (used by the
    * oracle-checked batch query). */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  def hourlyTypeCountsStreaming(events: DataFrame): DataFrame =
    hourlyTypeCounts(events.withWatermark("ts", "10 minutes"))

  /** Per-user session windows (30-min gap), watermarked. */
  def userSessions(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("s"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("session_value"))
      .select(col("user_id"), col("s.start").as("session_start"),
        col("s.end").as("session_end"), col("n_events"), col("session_value"))

  case class UserRunning(userId: Long, nEvents: Long, totalValue: Double)

  /** Custom stateful op: running per-user totals via mapGroupsWithState
    * (the engine's escape hatch for state machines the built-in windows
    * can't express — reference analog would be per-user accumulators). */
  def runningUserTotals(events: DataFrame): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").as("userId"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserRunning, UserRunning](
        GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[UserRunning]) =>
          val (n0, v0) = state.getOption
            .map(s => (s.nEvents, s.totalValue)).getOrElse((0L, 0.0))
          var n = n0; var v = v0
          rows.foreach { r => n += 1; v += r._2 }
          val next = UserRunning(uid, n, math.rint(v * 100) / 100)
          state.update(next)
          next
      }
  }

  /** Drive a streaming query to completion against a bounded source and
    * return the materialized result (memory sink). */
  def runToMemory(df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Append()): DataFrame = {
    val q = df.writeStream.outputMode(mode)
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
