package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic-sketch admission operators: the compact, mergeable
  * summaries a 100 TB curation pipeline substitutes for exact state
  * when the exact state no longer fits — a Bloom pre-filter standing
  * in for a full eval-window hash set, a count-min sketch standing in
  * for an exact token frequency table.
  *
  * Both operators here are built from declarative column math on a
  * portable hash (`conv(substr(md5(x),1,15),16,10)` — the same idiom
  * as the q64/q66/q67 portable gates) so a DuckDB oracle replays every
  * bit: positions, cells, estimates AND the error-bound booleans. The
  * scaladoc on each method records the production-shape variant
  * (bitmap broadcast / sketch-array merge) that trades oracle
  * replayability for constant-size state.
  *
  * Reference context: the reference engine has no sketch layer — its
  * dedup is exact set membership in driver memory
  * (/root/reference/src/main/scala/ws/vinta/albedo/recommenders/
  * CurationRecommender.scala:30-42 collects full item sets). These
  * operators are the beyond-reference scale path mandated by the
  * builder prompt (dedup/decontamination at training-data scale).
  */
object Sketches {

  /** k Bloom positions for an (md5-hex) key: position_i =
    * H(key || '#' || i) mod mBits, H = first 15 md5 hex digits as a
    * long (60 bits — exact in BIGINT on both engines). Statically
    * unrolled (k is a compile-time parameter) so the whole array stays
    * codegen — `transform(sequence(...))` would fall back to
    * interpreted eval (verify-skill gotcha). */
  private[graft] def bloomPositions(key: Column, k: Int, mBits: Int): Column =
    array((0 until k).map(i =>
      conv(substring(md5(concat(key, lit("#" + i))), 1, 15), 16, 10)
        .cast("long") % mBits): _*)

  /** Two-phase Bloom decontamination: phase 1 keeps only training
    * windows whose k Bloom positions are ALL set by some eval window
    * (the approximate pre-filter — false positives possible, false
    * negatives impossible); phase 2 confirms survivors against the
    * exact eval hash set. The final `contaminated` flag is therefore
    * EXACT — identical to [[Dedup.decontaminate]] — while
    * `n_candidate_windows ≥ n_hits` exposes the sketch's false-
    * positive overhead as data.
    *
    * Scale: the point of the pre-filter is state size. The exact eval
    * window set is ~32 bytes/window of md5 text; the Bloom image is
    * mBits bits TOTAL (a 1 GiB bitmap covers ~6×10⁹ windows at k=3,
    * 1% fp) and OR-merges associatively across partitions. Here the
    * bit-set is kept declarative (a distinct-position table joined by
    * position) so the oracle can replay it; the production variant
    * builds the same positions into a broadcast bitmap
    * (`df.stat.bloomFilter` / aggregated long-array) and phase 1
    * becomes a map-side scan with zero shuffle. Phase 2's exact
    * confirm join then runs over the ~fp-rate-sized survivor stream
    * instead of the full corpus — at 100 TB that is the difference
    * between shuffling every window and shuffling ~1% of them.
    *
    * Fixture sizing (mBits = 65536, k = 3) deliberately lets a few
    * false positives through at sf0.01 so the candidate/confirmed gap
    * is visible in the gate output rather than vacuously zero.
    *
    * @return one row per training doc:
    *         (doc_id, n_candidate_windows, n_hits, contaminated).
    */
  def decontaminateBloom(train: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, w: Int = 8, k: Int = 3,
      mBits: Int = 65536): DataFrame = {
    val evalW = Dedup.tokenWindows(evalDocs, idCol, textCol, w)
      .select(col("h")).distinct()
    // the Bloom image: every position set by any eval window
    val evalBits = evalW
      .select(explode(bloomPositions(col("h"), k, mBits)).as("pos"))
      .distinct()
    // distinct (doc, window) pairs — counts below are distinct-window
    // counts, so a doc repeating one span can't break the all-k-probes
    // predicate (k rows per surviving window, exactly)
    val trainW = Dedup.tokenWindows(train, idCol, textCol, w).distinct()
    // phase 1: a window survives iff all k probes hit set bits
    val cand = trainW
      .select(col("id"), col("h"),
        posexplode(bloomPositions(col("h"), k, mBits)).as(Seq("i", "pos")))
      .join(evalBits, Seq("pos"), "inner")
      .groupBy(col("id"), col("h")).agg(count(lit(1)).as("probes_hit"))
      .filter(col("probes_hit") === k)
    val candPerDoc = cand.groupBy(col("id"))
      .agg(count(lit(1)).as("n_candidate_windows"))
    // phase 2: exact confirm over the survivor stream only
    val hits = cand.join(evalW, Seq("h"), "inner")
      .groupBy(col("id")).agg(count(lit(1)).as("n_hits"))
    train.select(col(idCol).cast("long").as("doc_id"))
      .join(candPerDoc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .join(hits.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_candidate_windows"), lit(0L)).as("n_candidate_windows"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Count-min-sketch token frequencies, checked against exact counts.
    * Builds the d×wCells sketch declaratively — one (row, cell) count
    * per token occurrence per hash row, aggregated by (row, cell) —
    * then reads back the CM estimate (min over rows of the addressed
    * cell) for the exact top-N tokens and asserts the one-sided CM
    * guarantee `exact ≤ est ≤ exact + 3·total/wCells` (3 > e bounds
    * εN = e·N/w in integer math; d = 4 rows puts the per-key failure
    * probability under e⁻⁴ ≈ 2%, and the bound column makes any
    * violation a hash mismatch rather than a silent one).
    *
    * Scale: the sketch is d·wCells longs REGARDLESS of corpus size and
    * the (row, cell) aggregation partial-aggregates map-side, so the
    * shuffle carries at most d·wCells rows per partition — this is the
    * mergeable-summary path for "what are the heavy hitters in 100 TB
    * of text" (same role as q54b/q88b's approx_percentile vs exact
    * percentile). The exact side here is the fixture-scale truth
    * vehicle, exactly the q55/q58 HLL-vs-exact pattern.
    *
    * @return top-N rows (token, exact_cnt, cms_est, within_bound)
    *         ordered by exact_cnt desc, token.
    */
  /** The d×wCells sketch itself: one (row, cell) count per token
    * occurrence per hash row. Works unchanged on a STREAMING frame —
    * the aggregation state is bounded by construction (≤ d·wCells
    * rows, whatever the stream's cardinality), so a complete-mode
    * streaming query maintains the sketch incrementally across
    * micro-batches with no watermark and no state growth; see
    * `SketchesSpec`'s streaming≡batch case. Input: a `tok` column. */
  def cmsCells(toks: DataFrame, d: Int, wCells: Int): DataFrame =
    toks
      .select(posexplode(bloomPositions(col("tok"), d, wCells))
        .as(Seq("r", "cell")))
      .groupBy(col("r"), col("cell")).agg(count(lit(1)).as("cnt"))

  def cmsHeavyHitters(docs: DataFrame, idCol: String, textCol: String,
      d: Int = 4, wCells: Int = 2048, topN: Int = 30): DataFrame = {
    val toks = docs
      .select(explode(
        filter(split(lower(col(textCol)), "\\s+"), t => length(t) > 0))
        .as("tok"))
    val cells = cmsCells(toks, d, wCells)
    val exactTop = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok")).limit(topN)
    val total = toks.agg(count(lit(1)).as("total"))
    val est = exactTop
      .select(col("tok"), col("exact_cnt"),
        posexplode(bloomPositions(col("tok"), d, wCells)).as(Seq("r", "cell")))
      .join(cells, Seq("r", "cell"), "inner")
      .groupBy(col("tok"), col("exact_cnt"))
      .agg(min(col("cnt")).as("cms_est"))
    est.crossJoin(broadcast(total))
      .select(col("tok").as("token"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") >= col("exact_cnt") &&
          col("cms_est") <= col("exact_cnt") +
            expr(s"(3 * total) DIV $wCells")) // integer DIV — `/` is double
          .as("within_bound"))
      .orderBy(col("exact_cnt").desc, col("token"))
  }
}
