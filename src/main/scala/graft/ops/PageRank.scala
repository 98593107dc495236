package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a directed edge list — classic AND personalized (the
  * `teleport` param), closing the reference's README TODO
  * (`/root/reference/README.md:158` "personalized pagerank") in full;
  * completes the graph family beside [[ConnectedComponents]].
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
  *
  * Measured non-optimization (r8): caching edges/out-degrees plus a
  * final eager checkpoint (so the caches could be released) was tried
  * and was consistently ~30% SLOWER at sf0.1 (4.6 → 6.1 s) — the
  * extra materialization outweighs re-scanning a vectorized parquet
  * source that the OS page cache already holds. On a real cluster
  * where the source is remote, revisit; at fixture scale, don't.
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
    * @param teleport PERSONALIZED PageRank (the reference README's
    *        actual TODO wording): a 1-column (`node`) preference set.
    *        The (1-d) teleport term lands only on these nodes —
    *        base = (15·scale) DIV (100·|S|) for v ∈ S, 0 elsewhere —
    *        and the walk starts there (r₀ = scale DIV |S| on S). With
    *        `redistributeDangling`, sink mass also returns to S, per
    *        the personalized teleport vector. Same all-integer
    *        arithmetic, so the q104b oracle replays it exactly.
    * @return (node, rank_q) — fixed-point rank in 1/scale units */
  def run(edges: DataFrame, iters: Int = 10,
      scale: Long = 1000000000000L,
      redistributeDangling: Boolean = false,
      teleport: Option[DataFrame] = None): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val out = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // (node, base, r0): uniform for classic PR, teleport-set-only for
    // personalized. Cached — it anchors every iteration's left join.
    val nodeBase = (teleport match {
      case None =>
        val n = nodes.count() // bounded driver scalar: one long
        nodes.select(col("node"),
          lit((15L * scale) / (100L * n)).as("base"),
          lit(scale / n).as("r0"))
      case Some(t) =>
        val tele = t.select(col("node").cast("long").as("node")).distinct()
        val m = tele.count() // bounded driver scalar: one long
        nodes.join(broadcast(tele.withColumn("__t", lit(1))), Seq("node"), "left")
          .select(col("node"),
            when(col("__t").isNotNull, lit((15L * scale) / (100L * m)))
              .otherwise(lit(0L)).as("base"),
            when(col("__t").isNotNull, lit(scale / m))
              .otherwise(lit(0L)).as("r0"))
    }).cache()
    // dangling-share denominator: all nodes for classic PR, the
    // teleport set for personalized (sink mass returns to S)
    val share: Long =
      if (!redistributeDangling) 0L
      else if (teleport.isEmpty) nodeBase.count()
      else nodeBase.filter(col("base") > 0).count()
    var ranks = nodeBase.select(col("node"), col("r0").as("r"))
    for (i <- 1 to iters) {
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .join(out, Seq("src"))
        .select(col("dst").as("node"), expr("r DIV outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      val joined = nodeBase.join(contribs, Seq("node"), "left")
      ranks =
        if (!redistributeDangling)
          joined.select(col("node"),
            (col("base") + expr("(85 * coalesce(s, 0L)) DIV 100")).as("r"))
        else {
          // per-node dangling share, integer-exact: (Σ sink ranks)
          // DIV |share set| — landing uniformly for classic PR, on
          // the teleport set only (base > 0) for personalized
          val dangling = ranks
            .join(out.withColumnRenamed("src", "node"), Seq("node"), "left_anti")
            .agg(coalesce(sum(col("r")), lit(0L)).as("dsum"))
          val dexp =
            if (teleport.isEmpty)
              s"(85 * (coalesce(s, 0L) + dsum DIV $share)) DIV 100"
            else
              s"(85 * (coalesce(s, 0L) + IF(base > 0, dsum DIV $share, 0L))) DIV 100"
          joined.crossJoin(broadcast(dangling))
            .select(col("node"), (col("base") + expr(dexp)).as("r"))
        }
      if (i % 4 == 0) ranks = Checkpoints.cut(ranks)
    }
    // r17 optimization round: cut the iterations left LAZY since the
    // last in-loop checkpoint BEFORE releasing nodeBase — the unpersist
    // below used to fire while the caller's plan was still unexecuted,
    // so the final (iters mod 4) rounds re-derived the whole nodeBase
    // subtree (nodes-distinct union + base/r0) from the source PER USE:
    // the q104 gate plan showed 8 parquet scans of events and ~12
    // exchanges for its last two iterations (plans/r17/
    // q104_pagerank_before.txt). Checkpointing here executes those
    // rounds while the cache is alive; the caller receives a plan that
    // reads materialized blocks (guide §2.4 — remove repeated subtree
    // shuffles outright).
    if (iters % 4 != 0) ranks = Checkpoints.cut(ranks)
    nodeBase.unpersist()
    ranks.select(col("node"), col("r").as("rank_q"))
  }
}
