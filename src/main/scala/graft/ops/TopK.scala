package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Per-key top-k strategies.
  *
  * `viaWindow` is the declarative default (row_number ≤ k). Its cost is
  * a full sort of every partition's rows. `viaAggregator` keeps only a
  * k-bounded heap per key per partition (partial aggregation), so the
  * shuffle carries at most k rows per (key, map-partition) instead of
  * all rows — the SURVEY §7.4 optimization replacing the reference's
  * BoundedPriorityQueue-in-flatMap (reference: src/main/scala/ws/vinta/
  * albedo/recommenders/BoundedPriorityQueue.scala:16-54). Prefer it when
  * rows-per-key ≫ k (e.g. scoring 10^4 candidates per user, keeping 30).
  */
object TopK {

  /** Declarative window form: deterministic (score desc, item asc). */
  def viaWindow(df: DataFrame, keyCol: String, itemCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(scoreCol).desc, col(itemCol))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col(keyCol), col(itemCol), col(scoreCol), col("rn"))
  }

  /** Typed Aggregator with a k-bounded buffer; merge keeps the best k.
    * Deterministic under ties via (score desc, item asc) ordering. */
  private final class TopKAgg(k: Int)
      extends Aggregator[(Long, Double), List[(Double, Long)], Seq[(Double, Long)]] {
    // ascending by (score, -item) so head = weakest entry; keep size ≤ k
    private def ord: Ordering[(Double, Long)] =
      Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (s, -i) }
    private def insert(buf: List[(Double, Long)], e: (Double, Long)): List[(Double, Long)] = {
      val merged = (e :: buf).sorted(ord)
      if (merged.size > k) merged.drop(merged.size - k) else merged
    }
    def zero: List[(Double, Long)] = Nil
    def reduce(b: List[(Double, Long)], a: (Long, Double)): List[(Double, Long)] =
      insert(b, (a._2, a._1))
    def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] =
      b2.foldLeft(b1)(insert)
    def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r.reverse
    def bufferEncoder: Encoder[List[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Partial-aggregating form: shuffle carries ≤ k rows per key per map
    * partition. Output schema matches `viaWindow`. */
  def viaAggregator(df: DataFrame, keyCol: String, itemCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(col(keyCol).cast("long"), col(itemCol).cast("long"),
      col(scoreCol).cast("double")).as[(Long, Long, Double)]
    val agg = new TopKAgg(k).toColumn
    typed.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("topk"))
      .flatMap { case (key, topk) =>
        topk.zipWithIndex.map { case ((score, item), idx) =>
          (key, item, score, (idx + 1).toLong)
        }
      }
      .toDF(keyCol, itemCol, scoreCol, "rn")
  }
}
