package graft.queries

import graft.QueryDef
import graft.llmops.Multimodal
import graft.sources.Tables
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-equivalent and multimodal queries. */
object Extras {

  /** Event-time hourly windowed agg — the same transformation the
    * streaming path runs (EventStreams.hourlyTypeCounts), executed over
    * the bounded batch table for the oracle gate. */
  def hourlyWindowCounts(spark: SparkSession, dir: String): DataFrame =
    EventStreams.hourlyTypeCounts(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  /** Session windows per user (30-min inactivity gap) — batch run of the
    * streaming sessionization (rows-only: no session_window in DuckDB). */
  def userSessions(spark: SparkSession, dir: String): DataFrame =
    EventStreams.userSessions(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("session_start"))

  /** Multimodal feature extraction over a deterministic synthetic binary
    * corpus (decode kernel stubbed — no codecs offline; plumbing real). */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.documents(spark, dir).count().toInt.min(2000)
    Multimodal.extractFeatures(Multimodal.synthCorpus(spark, n))
      .toDF().orderBy(col("media_id"))
  }

  /** Video frame sampling (every 4th frame) over the synthetic corpus. */
  def frameSamples(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.synthCorpus(spark, 300))
      .orderBy(col("media_id"), col("frame_idx"))

  /** As-of join: each click enriched with the user's latest preceding
    * purchase (point-in-time correctness — the operator Spark lacks
    * natively, composed per ops/AsOfJoin). */
  def clicksAsOfPurchases(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("ts_us", expr("ts_ns DIV 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id").as("purchase_id"))
    graft.ops.AsOfJoin.asOf(clicks, purchases, "user_id", "ts_us",
        Seq("purchase_id"))
      .orderBy(col("event_id"))
  }

  /** Albedo-shaped profile-builder jobs over the deterministic fixture
    * generator (SURVEY §3.1 lifecycle; rows-only — fixtures are
    * in-memory, not sfDir tables). */
  def userProfiles(spark: SparkSession, dir: String): DataFrame =
    graft.jobs.ProfileBuilders.buildUserProfile(
        graft.fixtures.AlbedoFixtures.users(spark),
        graft.fixtures.AlbedoFixtures.repos(spark),
        graft.fixtures.AlbedoFixtures.starrings(spark), "2017-09-01")
      .withColumn("recent_languages",
        array_join(col("recent_languages"), ","))
      .orderBy(col("user_id"))

  def repoProfiles(spark: SparkSession, dir: String): DataFrame =
    graft.jobs.ProfileBuilders.buildRepoProfile(
        graft.fixtures.AlbedoFixtures.repos(spark), "2017-09-01")
      .withColumn("topics_list", array_join(col("topics_list"), ","))
      .orderBy(col("repo_id"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q49_user_profiles", userProfiles, None),
    QueryDef("q50_repo_profiles", repoProfiles, None),
    QueryDef("q48_asof_join", clicksAsOfPurchases, Some(
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |              event_type FROM events),
        |clicks AS (SELECT event_id, user_id, ts_us FROM ev
        |           WHERE event_type = 'click'),
        |purch AS (SELECT event_id AS purchase_id, user_id, ts_us FROM ev
        |          WHERE event_type = 'purchase')
        |SELECT c.user_id, c.ts_us, c.event_id,
        |       p.purchase_id AS asof_purchase_id
        |FROM clicks c ASOF LEFT JOIN purch p
        |  ON c.user_id = p.user_id AND p.ts_us <= c.ts_us
        |ORDER BY c.event_id""".stripMargin)),
    QueryDef("q28_hourly_window_counts", hourlyWindowCounts, Some(
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        | event_type, count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin)),
    QueryDef("q29_user_sessions", userSessions, None),
    QueryDef("q45_multimodal_features", multimodalFeatures, None),
    QueryDef("q46_frame_samples", frameSamples, None)
  )
}
