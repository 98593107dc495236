package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact integer order-stat interpolation (late r17) — the shared seam
  * behind the q54b/q88b envelope gates. For a quantile q = nq/denom
  * over n sorted integer values v(0..n-1), the continuous-quantile
  * (`quantile_cont` / NumPy `linear`) value is
  *
  *   v(idx)·(denom − rem)/denom + v(idx+1)·rem/denom
  *   where pos = (n−1)·nq, idx = pos div denom, rem = pos mod denom
  *
  * — a rational with denominator `denom` whose NUMERATOR
  * `v(idx)·(denom−rem) + v(idx+1)·rem` is a plain BIGINT both Spark
  * and DuckDB compute bit-identically. Emitting the numerator instead
  * of the rounded double removes the cross-engine rounding-boundary
  * flake class the sf0.1 sweep caught (two engines summing/
  * interpolating in different float op orders disagree by 1 ulp and
  * flip `round(,4)` at a …5 boundary).
  *
  * Scale note: the per-group row_number concentrates each group in one
  * task — the same concentration class as the exact `percentile`
  * multiset buffer this replaces. Like it, this is gate/oracle
  * instrumentation; production paths use sketches (ADVICE r5 #3).
  */
object IntegerEnvelope {

  /** One row per group: `groupCol, lo, hi, n, q<nq>…` where q<nq> is
    * the BIGINT interpolation numerator at quantile nq/denom (true
    * value = q<nq> / (denom · unit scale of `valueCol`)). `valueCol`
    * must be integral (cast to long here). */
  def numerators(df: DataFrame, groupCol: String, valueCol: String,
      nqs: Seq[Int], denom: Int = 200): DataFrame = {
    require(nqs.forall(nq => nq > 0 && nq < denom), s"nq out of (0,$denom)")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val ranked = df
      .select(col(groupCol), col(valueCol).cast("long").as("__v"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("__v"))))
    // tie order among equal __v is arbitrary but harmless: swapping
    // equal values between ranks leaves every weighted sum unchanged
    def w(nq: Int): Column = expr(
      s"CASE WHEN __rk = ((__n - 1) * $nq) div $denom + 1 " +
        s"THEN __v * ($denom - ((__n - 1) * $nq) % $denom) " +
        s"WHEN __rk = ((__n - 1) * $nq) div $denom + 2 " +
        s"THEN __v * (((__n - 1) * $nq) % $denom) ELSE 0 END")
    val aggs = Seq(max(col("__v")).as("hi"), first(col("__n")).as("n")) ++
      nqs.map(nq => sum(w(nq)).as(s"q$nq"))
    ranked.join(broadcast(counts), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(min(col("__v")).as("lo"), aggs: _*)
  }
}
