package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mergeability contract behind q131: unioning per-partition HLL
  * sketches must give the same estimate as sketching the whole set —
  * that equality is what makes stored daily sketches a valid source
  * for ANY rollup window. */
class HllReaggSpec extends SparkSpec {

  import spark.implicits._

  test("union of partial sketches equals the sketch of the union") {
    val ids = (1L to 5000L).map(i => (i % 7, i % 900))
      .toDF("part", "user_id")
    val merged = ids.groupBy($"part")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .as[Double].head()
    val direct = ids
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
      .as[Double].head()
    assert(merged == direct, s"merge path $merged != direct $direct")
  }

  test("estimate lands within 5% of the exact distinct count") {
    val ids = (1L to 20000L).map(i => ((i * 2654435761L) % 3171))
      .toDF("user_id")
    val est = ids
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))"))
      .as[Double].head()
    val exact = ids.distinct().count()
    assert(math.abs(est - exact) <= 0.05 * exact,
      s"estimate $est vs exact $exact")
  }
}
