package graft.queries

import graft.SparkSpec

class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_percentile satisfies the GK rank guarantee: returned " +
      "value's rank within eps*N (+1 rank slack) of the target rank") {
    // GK with accuracy a guarantees the returned element's rank r obeys
    // |r - p*N| <= N/a. Checking VALUES against exact `percentile`
    // would conflate this with interpolation semantics (exact
    // interpolates between order statistics; approx returns a member
    // element), so the spec checks the rank directly: the returned
    // value's rank interval (n_lt, n_le] must intersect
    // [p*N - eps*N - 1, p*N + eps*N + 1]. Runs the production
    // (envelope = false) path — the sketch values only surface there
    // now that the gate's hashed output is envelope-only.
    import org.apache.spark.sql.functions._
    val eps = 1.0 / 10000 // matches the accuracy used in the gate
    val approx = Relational.percentilesApprox(spark, sf0001, envelope = false)
      .select($"o_orderpriority", $"p50", $"p90").as[(String, Double, Double)]
      .collect()
    assert(approx.nonEmpty)
    val orders = graft.sources.Tables.orders(spark, sf0001)
      .select($"o_orderpriority", $"o_totalprice").cache()
    try approx.foreach { case (prio, p50, p90) =>
      val r = orders.filter($"o_orderpriority" === prio)
        .agg(count(lit(1)).as("n"),
          sum(when($"o_totalprice" <= p50, 1L).otherwise(0L)).as("le50"),
          sum(when($"o_totalprice" < p50, 1L).otherwise(0L)).as("lt50"),
          sum(when($"o_totalprice" <= p90, 1L).otherwise(0L)).as("le90"),
          sum(when($"o_totalprice" < p90, 1L).otherwise(0L)).as("lt90"))
        .as[(Long, Long, Long, Long, Long)].head()
      val (n, le50, lt50, le90, lt90) = r
      val slack = eps * n + 1.0 // +1: the gate rounds values to 4 decimals
      assert(le50 >= 0.5 * n - slack && lt50 <= 0.5 * n + slack,
        s"$prio p50 rank ($lt50,$le50] outside 0.5*$n ± $slack")
      assert(le90 >= 0.9 * n - slack && lt90 <= 0.9 * n + slack,
        s"$prio p90 rank ($lt90,$le90] outside 0.9*$n ± $slack")
    } finally orders.unpersist()
  }

  test("percentile gate's envelope variant reports within_err for every group") {
    val rows = Relational.percentilesApprox(spark, sf0001)
      .select("o_orderpriority", "within_err").as[(String, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (p, w) => assert(w, s"$p: within_err false") }
  }

  test("approx IQR twin agrees with exact on outlier counts within the " +
      "fence-shift tolerance") {
    val exact = Relational.iqrOutliers(spark, sf0001)
      .select("l_returnflag", "n_outliers", "n_rows")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val approx = Relational.iqrOutliersApprox(spark, sf0001, envelope = false)
      .select("l_returnflag", "n_outliers", "n_rows")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (flag, (nA, rowsA)) =>
      val (nE, rowsE) = exact(flag)
      assert(rowsA == rowsE, s"$flag row counts differ")
      // a 1e-4-rank quartile shift can only reclassify points near the
      // fences; bound the disagreement at 1% of the group
      assert(math.abs(nA - nE).toDouble / rowsE < 0.01,
        s"$flag: approx=$nA exact=$nE rows=$rowsE")
    }
  }

  test("IQR gate's envelope variant: within_err true and count bounds ordered") {
    val rows = Relational.iqrOutliersApprox(spark, sf0001)
      .select("l_returnflag", "n_out_min", "n_out_max", "within_err")
      .as[(String, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (f, lo, hi, w) =>
      assert(lo <= hi, s"$f: n_out_min $lo > n_out_max $hi")
      assert(w, s"$f: within_err false")
    }
  }

  test("approx_count_distinct within default HLL error of exact") {
    val approx = Relational.approxDistinct(spark, sf0001, envelope = false)
      .as[(String, Long)].collect().toMap
    val exact = Relational.exactDistinctParts(spark, sf0001)
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    approx.foreach { case (flag, a) =>
      val e = exact(flag)
      val err = math.abs(a - e).toDouble / e
      assert(err < 0.1, s"$flag: approx=$a exact=$e err=$err")
    }
    Relational.approxDistinct(spark, sf0001)
      .select("l_returnflag", "within_err").as[(String, Boolean)].collect()
      .foreach { case (f, w) => assert(w, s"$f: in-gate within_err disagrees") }
  }
}
