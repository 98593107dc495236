package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-step funnel over an event log — the classic product
  * analytics query (how many users did view → click → purchase, in
  * that order?) that the reference's event tables would feed.
  *
  * Semantics: an entity reaches step k when an event of step k's type
  * occurs AT OR AFTER the earliest time the entity reached step k−1
  * (ties at the same timestamp count — the frame is RANGE-based, so
  * equal-timestamp ordering is deterministic regardless of the sort's
  * tie order). Step times are the EARLIEST qualifying occurrence, so
  * a later re-conversion never moves an entity's funnel position.
  *
  * Scale shape: ONE shuffle on the entity key; both running-min
  * windows and the per-entity aggregate run on that same partitioning
  * (the plan shows a single Exchange feeding two Window operators and
  * a partial→final aggregate). The summary is a constant-size global
  * aggregate of one row per entity. No step count limit: each extra
  * step adds one Window projection on the same sort, not a new
  * shuffle.
  */
object Funnel {

  /** Per-entity earliest qualifying time for each step.
    * Output: (entity, t_1 .. t_n) — t_k null when step k not reached.
    *
    * @param maxSpanSec when set, steps 2..n additionally must occur
    *        within this many seconds of the entity's step-1 time (the
    *        "converted within 72 h" product question). The horizon is
    *        anchored at the EARLIEST step-1 occurrence — a later
    *        re-entry does not restart the clock. */
  def stepTimes(events: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      maxSpanSec: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // RANGE frame (orderBy's default): at any row, reach_{k} is the
    // earliest qualifying step-k time among ALL events with ts <= this
    // row's ts — including equal timestamps, whatever their sort order.
    val w = Window.partitionBy(entityCol).orderBy(tsCol)
    // reach_k as running columns: a step-k event row qualifies when the
    // entity had already reached step k-1 at (or exactly at) its ts.
    val withReach = steps.zipWithIndex.foldLeft(events.toDF()) {
      case (df, (step, i)) =>
        val inHorizon = maxSpanSec match {
          case Some(s) if i > 0 =>
            unix_micros(col(tsCol)) - unix_micros(col("__reach_0")) <=
              lit(s * 1000000L)
          case _ => lit(true)
        }
        val qualifies =
          if (i == 0) col(typeCol) === step
          else col(typeCol) === step &&
            col(s"__reach_${i - 1}").isNotNull && inHorizon
        df.withColumn(s"__q_$i", when(qualifies, col(tsCol)))
          .withColumn(s"__reach_$i", min(col(s"__q_$i")).over(w))
    }
    val aggs = steps.indices.map(i => min(col(s"__q_$i")).as(s"t_${i + 1}"))
    withReach.groupBy(col(entityCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Funnel summary: one row per step with how many entities reached
    * it and integer parts-per-million conversion vs step 1 and vs the
    * previous step (exact integer DIV — replayable by any engine). */
  def summary(events: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      maxSpanSec: Option[Long] = None): DataFrame = {
    val per = stepTimes(events, entityCol, typeCol, tsCol, steps, maxSpanSec)
    val counts = per.select(
      steps.indices.map(i =>
        count(col(s"t_${i + 1}")).as(s"n_${i + 1}")): _*)
    // tiny (1-row) frame → per-step rows via a literal step table;
    // each struct carries its own denominators so no second window
    val stepRows = steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step"), lit(s).as("step_type"),
        col(s"n_${i + 1}").as("n_reached"),
        col(if (i == 0) "n_1" else s"n_$i").as("base_prev"),
        col("n_1").as("base_first"))
    }
    counts
      .select(explode(array(stepRows: _*)).as("r"))
      .select(col("r.step"), col("r.step_type"), col("r.n_reached"),
        when(col("r.base_prev") > 0,
          expr("r.n_reached * 1000000L DIV r.base_prev"))
          .otherwise(lit(0L)).as("conv_prev_ppm"),
        when(col("r.base_first") > 0,
          expr("r.n_reached * 1000000L DIV r.base_first"))
          .otherwise(lit(0L)).as("conv_first_ppm"))
      .orderBy("step")
  }
}
