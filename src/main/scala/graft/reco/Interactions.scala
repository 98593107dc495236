package graft.reco

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Implicit-feedback interaction matrix derived from the `events`
  * fixture: (user_id, item_id, rating, ts). Mirrors the reference's
  * Starring dataset (reference: src/main/scala/ws/vinta/albedo/schemas/
  * package.scala:49-54 and DatasetUtils.scala:115-123 which stamps a
  * constant rating 1.0).
  *
  * item_id comes from the event payload's "k" field (0..99 domain).
  * Scale note: this is a pure projection over the scan — no shuffle;
  * the JSON extract is codegen'd (`get_json_object`).
  */
object Interactions {

  def fromEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("user_id").cast("int").as("user_id"),
      get_json_object(col("props"), "$.k").cast("int").as("item_id"),
      col("ts"),
      col("ts_ns"),
      col("event_type"),
      col("value"),
      lit(1.0).as("rating"))

  /** Deduplicated (user,item) pairs with interaction count as implicit
    * confidence — the shape ALS consumes. One shuffle on (user,item). */
  def ratings(spark: SparkSession, dir: String): DataFrame =
    fromEvents(spark, dir)
      .groupBy(col("user_id"), col("item_id"))
      .agg(count(lit(1)).cast("double").as("rating"),
        max(col("ts_ns")).as("last_ts_ns"))
}
