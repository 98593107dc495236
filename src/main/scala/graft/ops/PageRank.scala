package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a directed edge list — the graph operator the
  * reference planned but never built (`/root/reference/README.md:158`
  * TODO "personalized pagerank"); completes the graph family beside
  * [[ConnectedComponents]].
  *
  * Integer-quantized power iteration: ranks live in fixed-point units
  * of `1/scale` (longs), every per-edge contribution is an integer
  * division `r DIV outdeg`, and the damping mix is
  * `base + (85·Σcontrib) DIV 100`. All-integer arithmetic makes each
  * iteration order-independent and bit-replayable by any engine with
  * 64-bit integer division (the DuckDB oracle unrolls the same
  * iterations as chained CTEs) — the same determinism tactic as the
  * micro-nat quantization in Quality.unigramPerplexity. Quantization
  * error per node-iteration is < indegree/scale — at scale 1e12,
  * noise in the 12th digit of a unit-mass rank.
  *
  * Simplified formulation (documented, mirrored in the oracle):
  * dangling-node mass is NOT redistributed — sinks keep receiving the
  * (1-d)/n base term and their inflow, they just re-emit nothing. Good
  * for relative ranking use; total mass decays by the dangling share.
  *
  * Scale design: per iteration one equi-join edges⋈ranks on src (both
  * sides partitionable by the join key), one shuffle agg on dst, one
  * left join back to the node set — all keyed shuffles, no driver
  * collection except the single node count. Lineage is truncated with
  * localCheckpoint every 4 iterations (the ALS/CC checkpoint policy —
  * iterative plans otherwise double in depth per round).
  */
object PageRank {

  /** @param edges (src, dst) long columns; parallel edges are counted
    *              as extra weight (dedup upstream if unwanted)
    * @param redistributeDangling true = textbook formulation: each
    *        iteration's dangling (sink) mass is shared equally across
    *        all nodes — computed IN-PLAN as a 1-row aggregate
    *        broadcast-crossed back in (no driver collect per
    *        iteration); mass is then conserved up to integer
    *        truncation. false (default, q104's oracled form) drops it.
    * @return (node, rank_q) — fixed-point rank in 1/scale units */
  def run(edges: DataFrame, iters: Int = 10,
      scale: Long = 1000000000000L,
      redistributeDangling: Boolean = false): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val out = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count() // bounded driver scalar: one long
    val base = (15L * scale) / (100L * n)
    var ranks = nodes.select(col("node"), lit(scale / n).as("r"))
    for (i <- 1 to iters) {
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .join(out, Seq("src"))
        .select(col("dst").as("node"), expr("r DIV outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      val joined = nodes.join(contribs, Seq("node"), "left")
      ranks =
        if (!redistributeDangling)
          joined.select(col("node"),
            (lit(base) + expr("(85 * coalesce(s, 0L)) DIV 100")).as("r"))
        else {
          // per-node dangling share, integer-exact: (Σ sink ranks) DIV n
          val dangling = ranks
            .join(out.withColumnRenamed("src", "node"), Seq("node"), "left_anti")
            .agg(coalesce(sum(col("r")), lit(0L)).as("dsum"))
          joined.crossJoin(broadcast(dangling))
            .select(col("node"),
              (lit(base) +
                expr(s"(85 * (coalesce(s, 0L) + dsum DIV $n)) DIV 100")).as("r"))
        }
      if (i % 4 == 0) ranks = ranks.localCheckpoint(true)
    }
    nodes.unpersist()
    ranks.select(col("node"), col("r").as("rank_q"))
  }
}
