package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch interval-overlap join without a cartesian product — the
  * range-join problem (which purchase windows overlap which error
  * windows?) that a naive `join(cond)` turns into a per-key cross
  * product and a 100 TB cluster cannot afford.
  *
  * Bucket decomposition: every interval explodes to the fixed-width
  * time buckets it covers; the join is then a plain EQUI-join on
  * (key, bucket) + the exact overlap predicate as a residual. A pair
  * overlapping across several buckets would match once per shared
  * bucket, so each match is emitted only in its CANONICAL bucket —
  * the bucket containing max(l_start, r_start), which both sides'
  * bucket ranges provably cover — making the output exactly-once
  * with no distinct/shuffle-side dedup.
  *
  * Scale shape: shuffle on (key, bucket) — the same hash exchange an
  * ordinary equi-join gets; cost scales with interval_length /
  * bucketWidth per row (pick bucketWidth ≈ typical interval length so
  * the explode factor stays ~2). Catalyst pushes the per-side
  * filters; the residual predicate is codegen. This is the batch twin
  * of the stream-stream interval join (q69), which bounds the same
  * problem with watermarks instead of buckets.
  *
  * Inputs: `left` with (keyCol, ls, le, ...), `right` with (keyCol,
  * rs, re, ...) — start/end as LONGs in any shared unit, closed
  * intervals (touching endpoints overlap).
  */
object IntervalJoin {

  /** Start/end column names are parameters like `keyCol` (ADVICE r8
    * #3 — the previous hardcoded ls/le/rs/re contract failed at
    * analysis time for un-renamed inputs and could silently read a
    * left column that happened to be named rs/re in the residual).
    * The four must be mutually distinct so the post-join residual is
    * unambiguous without internal renames. */
  def overlapJoin(left: DataFrame, right: DataFrame, keyCol: String,
      bucketWidth: Long, leftStart: String = "ls", leftEnd: String = "le",
      rightStart: String = "rs", rightEnd: String = "re"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val names = Seq(leftStart, leftEnd, rightStart, rightEnd)
    require(names.distinct.size == 4,
      s"interval column names must be mutually distinct, got $names")
    require(!right.columns.contains(leftStart) && !right.columns.contains(leftEnd),
      s"right side must not carry the left interval columns $leftStart/$leftEnd")
    require(!left.columns.contains(rightStart) && !left.columns.contains(rightEnd),
      s"left side must not carry the right interval columns $rightStart/$rightEnd")
    // integer DIV, not `/`: float division of ns-scale longs (~1e18)
    // exceeds double precision and would misassign buckets
    val lb = left.withColumn("__bkt", explode(sequence(
      expr(s"`$leftStart` DIV $bucketWidth"),
      expr(s"`$leftEnd` DIV $bucketWidth"))))
    val rb = right.withColumn("__bkt", explode(sequence(
      expr(s"`$rightStart` DIV $bucketWidth"),
      expr(s"`$rightEnd` DIV $bucketWidth"))))
    lb.join(rb, Seq(keyCol, "__bkt"))
      .filter(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      .filter(col("__bkt") ===
        expr(s"greatest(`$leftStart`, `$rightStart`) DIV $bucketWidth"))
      .drop("__bkt")
  }
}
