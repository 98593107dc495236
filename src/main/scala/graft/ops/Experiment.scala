package graft.ops

import graft.reco.Splits
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment (A/B) analysis over the events table — the readout an
  * event store exists to serve once variants ship (r9;
  * beyond-reference surface, like the funnel/retention family it
  * composes with).
  *
  * Variant assignment is the q75 portable-hash rule
  * ([[Splits.hashBucketPortable]]): hash the UNIT id, not the event —
  * a user sees one variant forever, assignment is layout- and
  * time-independent, and a SQL oracle re-derives the entire
  * experiment from the raw events (no assignment table to trust).
  * That is also the industry-standard production shape.
  *
  * The two-proportion z statistic runs in IEEE doubles derived from
  * EXACT integer counts with a documented operation order, so both
  * engines produce identical bits and the milli-quantized z compares
  * hash-exact (the q43b cosine argument). Relative lift is pure
  * integer ppm. Scale: two conditional distinct-aggregates over one
  * scan, then driver-size arithmetic — nothing here is heavier than
  * q22.
  */
object Experiment {

  /** Deterministic unit→variant assignment: treatment iff the
    * portable hash bucket of (seed, unit) falls under
    * `treatFrac`·10⁶. */
  def assign(unitCol: Column, seed: String,
      treatFrac: Double = 0.5): Column =
    when(Splits.hashBucketPortable(unitCol, seed) <
        math.round(treatFrac * 1000000),
      lit("treatment")).otherwise(lit("control"))

  /** One-row experiment readout: exposed / converted distinct units
    * per variant, conversion ppm per arm, relative lift ppm
    * (integer), pooled two-proportion z in milli-units, and the
    * |z| ≥ 1.96 significance verdict.
    *
    * Exposure = any event by the unit; conversion = at least
    * `minConvEvents` events of `convType` (a threshold matters on
    * high-frequency event streams, where "any purchase ever"
    * saturates to p = 1 and the statistic degenerates). Degenerate
    * pools (p ∈ {0, 1}: zero sd) and a zero-conversion control arm
    * yield NULL z / lift with significant = false, not an error. */
  def abSummary(events: DataFrame, unitCol: String, typeCol: String,
      convType: String, seed: String, treatFrac: Double = 0.5,
      minConvEvents: Int = 1): DataFrame = {
    val treated = Splits.hashBucketPortable(col(unitCol), seed) <
      math.round(treatFrac * 1000000)
    val perUnit = events.groupBy(col(unitCol))
      .agg(sum(when(col(typeCol) === convType, 1L).otherwise(0L))
        .as("n_conv_ev"))
      .select(treated.as("treated"),
        (col("n_conv_ev") >= minConvEvents).as("converted"))
    val counts = perUnit.agg(
      sum(when(!col("treated"), 1L).otherwise(0L)).as("n_c"),
      sum(when(!col("treated") && col("converted"), 1L).otherwise(0L))
        .as("conv_c"),
      sum(when(col("treated"), 1L).otherwise(0L)).as("n_t"),
      sum(when(col("treated") && col("converted"), 1L).otherwise(0L))
        .as("conv_t"))
    counts
      .withColumn("conv_ppm_c", expr("conv_c * 1000000 DIV n_c"))
      .withColumn("conv_ppm_t", expr("conv_t * 1000000 DIV n_t"))
      // relative lift (p_t/p_c − 1) in exact integer ppm; products
      // bounded by (distinct units)² · 10⁶ — document the 2⁶³ margin
      .withColumn("lift_ppm", when(col("conv_c") > 0,
        expr("(conv_t * n_c - conv_c * n_t) * 1000000 DIV (conv_c * n_t)")))
      // z: identical op order in the SQL oracle — pooled p, then
      // (p_t − p_c) / sqrt(p·(1−p)·(1/n_c + 1/n_t)), then ·1000, floor
      .withColumn("p_pool",
        (col("conv_c") + col("conv_t")).cast("double") /
          (col("n_c") + col("n_t")).cast("double"))
      .withColumn("z_milli",
        when(col("p_pool") > 0.0 && col("p_pool") < 1.0, floor(
          (col("conv_t").cast("double") / col("n_t").cast("double") -
            col("conv_c").cast("double") / col("n_c").cast("double")) /
            sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
              (lit(1.0) / col("n_c").cast("double") +
                lit(1.0) / col("n_t").cast("double"))) * lit(1000))
          .cast("long")))
      .withColumn("significant",
        coalesce(abs(col("z_milli")) >= 1960L, lit(false)))
      .select(col("n_c"), col("conv_c"), col("n_t"), col("conv_t"),
        col("conv_ppm_c"), col("conv_ppm_t"), col("lift_ppm"),
        col("z_milli"), col("significant"))
  }
}
