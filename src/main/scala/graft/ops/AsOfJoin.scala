package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the latest right row
  * with the same key and right_time ≤ left_time.
  *
  * Spark has no native as-of join; per the engine's preference order
  * (SURVEY.md §4 / build brief) this composes existing operators rather
  * than adding a SparkPlan: tag both sides, union on (key, time), and a
  * running `last(payload, ignoreNulls)` window carries the most recent
  * right payload onto each left row. ONE shuffle on the key — same cost
  * as a sort-merge join, no range explosion, works at any scale.
  * (A custom BinaryExecNode would only win by skipping the union
  * materialization; measured unnecessary at fixture scale.)
  */
object AsOfJoin {

  /** @param left        rows to enrich
    * @param right       timeline of states
    * @param keyCol      equi-key present on both sides
    * @param timeCol     event-time column present on both sides (same type)
    * @param rightPayload right columns to carry (renamed as given)
    * @param tolerance   optional max staleness in timeCol's own units
    *                    (pandas merge_asof / kdb aj semantics): a match
    *                    older than left_time − tolerance yields nulls
    *                    instead — point-in-time enrichment that must
    *                    not serve arbitrarily stale state. Requires a
    *                    numeric timeCol.
    * @return left rows + nullable payload columns (left as-of join)
    */
  /** Internal staleness-timestamp field inside the carried payload
    * struct — namespaced so a real payload column can't collide with
    * it (ADVICE r8 #4); collision is rejected loudly regardless. */
  private val TsField = "__graft_asof_ts"

  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, rightPayload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    require(!rightPayload.contains(TsField),
      s"rightPayload must not contain the reserved column name $TsField")
    // the right TIME rides inside the payload so staleness is checked
    // against the row actually carried (not just any right row)
    val payloadStruct =
      struct((rightPayload.map(col) :+ col(timeCol).as(TsField)): _*)
    val l = left.withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(
        right.select(payloadStruct).schema.head.dataType.sql))
    val r = right
      .select(col(keyCol), col(timeCol), payloadStruct.as("__payload"))
      .withColumn("__side", lit(0))
    val lAligned = l.select(
      (Seq(col(keyCol), col(timeCol), col("__side"), col("__payload")) ++
        left.columns.filterNot(c => c == keyCol || c == timeCol)
          .map(c => col(c))): _*)
    val rAligned = r.select(
      (Seq(col(keyCol), col(timeCol), col("__side"), col("__payload")) ++
        left.columns.filterNot(c => c == keyCol || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    // right rows (side=0) sort before left rows (side=1) at equal time →
    // a right row AT the left timestamp is eligible (≤ semantics)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = lAligned.unionByName(rAligned)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
    val fresh = tolerance match {
      case Some(tol) =>
        col("__asof").isNotNull &&
          col(timeCol) - col("__asof").getField(TsField) <= tol
      case None => col("__asof").isNotNull
    }
    carried.filter(col("__side") === 1)
      .select((left.columns.toIndexedSeq.map(col) ++
        rightPayload.map(p =>
          when(fresh, col("__asof").getField(p)).as(s"asof_$p"))): _*)
  }
}
