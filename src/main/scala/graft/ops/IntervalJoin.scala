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

  def overlapJoin(left: DataFrame, right: DataFrame, keyCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("__bkt",
      explode(sequence(expr(s"ls DIV $bucketWidth"), expr(s"le DIV $bucketWidth"))))
    val rb = right.withColumn("__bkt",
      explode(sequence(expr(s"rs DIV $bucketWidth"), expr(s"re DIV $bucketWidth"))))
    lb.join(rb, Seq(keyCol, "__bkt"))
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .filter(col("__bkt") === expr(s"greatest(ls, rs) DIV $bucketWidth"))
      .drop("__bkt")
  }
}
