package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout via Morton (z-order) interleaving —
  * the write-side optimization that makes parquet min/max stats prune
  * on TWO dimensions at once. A 100 TB event store laid out by time
  * alone answers "user X last week" by scanning the whole week; laid
  * out by z(user, hour) the same footer stats skip all but the files
  * whose user range covers X.
  *
  * The z value is pure integer bit math (statically unrolled shifts —
  * whole-stage codegen, no UDF), so a SQL oracle replays it bit for
  * bit. File assignment here is a row_number over the z total order
  * (single-partition window — fixture-scale oracle vehicle, like
  * q88's exact percentile); the cluster path writes the same layout
  * distributively with `repartitionByRange(z).sortWithinPartitions(z)`
  * whose range bins ARE the file bins, no global window needed — see
  * [[ZOrderSpec]] which drives that writer and reads the row-group
  * stats back.
  *
  * No reference twin: the reference engine stores MySQL rows and ES
  * docs (no columnar layout control); this is part of the
  * beyond-reference training-data-at-scale surface.
  */
object ZOrder {

  /** Morton-interleave two `bits`-bit non-negative ints: bit j of `a`
    * lands at position 2j, bit j of `b` at 2j+1. */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { j =>
      shiftleft(shiftright(a, j).bitwiseAND(lit(1L)), 2 * j) +
        shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), 2 * j + 1)
    }.reduce(_ + _)

  /** (event_id, ub, hb, zv): each dim equal-width-binned to 2^bits
    * buckets over its OBSERVED min/max (the column stats a real
    * z-order writer normalizes with — masking raw values instead
    * wastes bits when the domain is small and aliases distinct
    * periods when it wraps, degenerating the curve to a single-dim
    * order; measured on the sf0.001 fixture: 15 users in an 8-bit
    * mask left every file spanning the full user domain). The min/max
    * scalars broadcast; everything else is per-row integer math. */
  def bucketedEvents(events: DataFrame, bits: Int): DataFrame = {
    val n = 1L << bits
    val raw = events.select(col("event_id"), col("user_id").as("u"),
      expr("ts_ns DIV 3600000000000").as("hr"))
    val stats = raw.agg(
      min(col("u")).as("minu"), max(col("u")).as("maxu"),
      min(col("hr")).as("minh"), max(col("hr")).as("maxh"))
    raw.crossJoin(broadcast(stats))
      .select(col("event_id"),
        expr(s"(u - minu) * $n DIV (maxu - minu + 1)").as("ub"),
        expr(s"(hr - minh) * $n DIV (maxh - minh + 1)").as("hb"))
      .withColumn("zv", zValue(col("ub"), col("hb"), bits))
  }

  /** QUANTILE (equal-frequency) binning — the skew-proof sibling of
    * [[bucketedEvents]] (r9). Equal-WIDTH bins waste the curve on a
    * power-law dimension: one hot user's rows flood a single bucket,
    * so files covering it span the whole other dimension and every
    * bucket boundary sits where no data lives. Rank-based bins give
    * every bucket the same ROW count — the hot key spreads over many
    * buckets of its own while cold keys get narrow buckets, so point
    * queries on cold keys prune far more files ([[ZOrderSpec]]
    * measures the planted-zipf win).
    *
    * Determinism: bucket = (rank − 1)·2^bits DIV total with rank over
    * (value, event_id) — pure integer math a SQL oracle replays. The
    * rank windows are global (the oracle-vehicle shape, as
    * [[layoutStats]]'s file window); the cluster path replaces them
    * with approx_percentile edge tables (mergeable sketch, broadcast
    * CASE lookup) exactly as q54 ↔ q54b twin exact and sketch
    * percentiles. */
  def quantileBucketedEvents(events: DataFrame, bits: Int): DataFrame = {
    val n = 1L << bits
    val raw = events.select(col("event_id"), col("user_id").as("u"),
      expr("ts_ns DIV 3600000000000").as("hr"))
    val wU = Window.orderBy(col("u"), col("event_id"))
    val wH = Window.orderBy(col("hr"), col("event_id"))
    val total = raw.agg(count(lit(1)).as("tot"))
    raw
      .withColumn("ru", row_number().over(wU).cast("long"))
      .withColumn("rh", row_number().over(wH).cast("long"))
      .crossJoin(broadcast(total))
      .select(col("event_id"),
        expr(s"(ru - 1) * $n DIV tot").as("ub"),
        expr(s"(rh - 1) * $n DIV tot").as("hb"))
      .withColumn("zv", zValue(col("ub"), col("hb"), bits))
  }

  /** Cut a bucketed frame's z total order into `rowsPerFile` files and
    * report each file's min/max envelope (the footer stats a reader
    * prunes on). */
  private def fileEnvelopes(bucketed: DataFrame,
      rowsPerFile: Int): DataFrame =
    bucketed
      .withColumn("rn",
        row_number().over(Window.orderBy(col("zv"), col("event_id"))) - 1)
      .withColumn("file_id", expr(s"rn DIV $rowsPerFile"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("ub")).as("min_ub"), max(col("ub")).as("max_ub"),
        min(col("hb")).as("min_hb"), max(col("hb")).as("max_hb"))
      .orderBy(col("file_id"))

  /** Per-file min/max envelope of a z-ordered layout of `events` over
    * (user bucket, hour bucket): rows are sorted by z (ties on
    * event_id), cut into `rowsPerFile` files, and each file reports
    * the footer stats a reader would prune on. Tight envelopes on BOTH
    * dims are the whole point — compare a ts-ordered layout, whose
    * user envelope per file is the full domain.
    *
    * @return (file_id, n_rows, min_ub, max_ub, min_hb, max_hb)
    */
  def layoutStats(events: DataFrame, rowsPerFile: Int = 512,
      bits: Int = 8): DataFrame =
    fileEnvelopes(bucketedEvents(events, bits), rowsPerFile)

  /** [[layoutStats]] over the quantile-binned buckets. */
  def layoutStatsQuantile(events: DataFrame, rowsPerFile: Int = 512,
      bits: Int = 8): DataFrame =
    fileEnvelopes(quantileBucketedEvents(events, bits), rowsPerFile)

  /** The 100 TB path for quantile binning: Spark's own
    * QuantileDiscretizer (Greenwald–Khanna mergeable quantile sketch
    * → broadcast Bucketizer splits) replaces the rank windows — edge
    * fitting is one pass with bounded state, assignment is a map-side
    * lookup, no global sort anywhere. [[quantileBucketedEvents]] is
    * its oracle twin exactly as q54's exact percentiles twin q54b's
    * sketch: same equal-frequency intent, the rank form replayable in
    * SQL, this form the one a cluster runs. `ZOrderSpec` shows the
    * sketch layout delivering the same planted-skew pruning win. */
  def quantileBucketedEventsScale(events: DataFrame, bits: Int,
      relativeError: Double = 0.001): DataFrame = {
    import org.apache.spark.ml.feature.QuantileDiscretizer
    val n = (1 << bits).toInt
    val raw = events.select(col("event_id"),
      col("user_id").cast("double").as("u"),
      expr("ts_ns DIV 3600000000000").cast("double").as("hr"))
    val disc = new QuantileDiscretizer()
      .setInputCols(Array("u", "hr")).setOutputCols(Array("ub_d", "hb_d"))
      .setNumBuckets(n).setRelativeError(relativeError)
    disc.fit(raw).transform(raw)
      .select(col("event_id"),
        col("ub_d").cast("long").as("ub"), col("hb_d").cast("long").as("hb"))
      .withColumn("zv", zValue(col("ub"), col("hb"), bits))
  }
}
