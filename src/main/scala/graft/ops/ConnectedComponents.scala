package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list by hash-min label
  * propagation — the group-forming step a dedup pipeline runs after
  * candidate-pair generation (MinHash/SimHash emit PAIRS; retention
  * policy needs GROUPS: keep one canonical doc per component).
  *
  * Algorithm: every node starts labeled with its own id; each round a
  * node adopts the minimum label among itself and its neighbors; at
  * fixpoint every node carries the minimum node id reachable from it —
  * exactly the component representative.
  *
  * Scale shape (100 TB): each round is one shuffle join on the edge
  * list plus a min-aggregate — no driver-side graph state, no
  * collect. Rounds needed = the largest component's diameter; LSH dup
  * clusters are near-cliques (every member collides with the canon in
  * some band), so 2–4 rounds in practice. For adversarial long-chain
  * graphs the alternating large-star/small-star variant (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14)
  * converges in O(log² n) rounds with the same per-round join shape;
  * the hash-min form is kept here because dedup graphs are shallow and
  * the simpler plan wins. Lineage is cut every round with
  * localCheckpoint, else the iterated join plan grows unboundedly and
  * re-optimizes from scratch each action (NOTES_r1 ALS checkpoint
  * lesson applies to any driver-side iteration).
  */
object ConnectedComponents {

  /** Labels every node that appears in `edges` with its component's
    * minimum node id. Returns (id, component). Undirected: each input
    * pair is symmetrized internally.
    *
    * @param edges   two long-typed columns naming an undirected edge
    * @param maxIter hard round cap (convergence is checked each round;
    *                the cap only guards adversarial chain graphs)
    */
  def hashMin(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val fwd = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val adj = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()

    var labels = adj.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxIter) {
      // min label among each node's neighbors this round
      val nbrMin = adj.join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("comp")).as("nbr_min"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp"))
        .localCheckpoint()
      changed = next.join(labels.select(col("id"), col("comp").as("prev")), Seq("id"))
        .filter(col("comp") =!= col("prev")).count()
      labels = next
      round += 1
    }
    adj.unpersist()
    labels
  }
}
