package graft.ops

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val scale = 1000000000000L

  test("two-node cycle: symmetric ranks, mass conserved (no dangling)") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = PageRank.run(edges).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet == Set(1L, 2L))
    assert(r(1L) == r(2L), "symmetric cycle must rank equally")
    // no dangling nodes → total mass stays ~scale (integer-division
    // truncation loses < iters * n units)
    val total = r.values.sum
    assert(math.abs(total - scale) < 1000, s"mass drifted: $total")
  }

  test("star graph: hub outranks leaves; leaves equal") {
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val r = PageRank.run(edges).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L), "hub must outrank a leaf")
    assert(r(2L) == r(3L) && r(3L) == r(4L), "leaves must rank equally")
    // node 1 is dangling (no out-edges): its inflow is not re-emitted,
    // so total mass is strictly below scale
    assert(r.values.sum < scale)
  }

  test("dangling redistribution conserves mass on a sink-heavy graph") {
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val r = PageRank.run(edges, redistributeDangling = true)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // node 1 is a sink; with redistribution its mass is shared back,
    // so the total stays ~scale (truncation loses < iters*(n+1) units)
    val total = r.values.sum
    assert(math.abs(total - scale) < 1000, s"mass not conserved: $total")
    assert(r(1L) > r(2L) && r(2L) == r(3L) && r(3L) == r(4L))
    // and the simplified form on the same graph loses mass — the two
    // formulations must actually differ
    val simple = PageRank.run(edges).collect().map(_.getLong(1)).sum
    assert(simple < total)
  }

  test("deterministic across runs (integer-quantized iteration)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    val a = PageRank.run(edges).collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    val b = PageRank.run(edges).collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(a == b)
    assert(a.map(_._2).forall(_ > 0))
  }

  test("personalized: teleport set concentrates rank near the seeds") {
    // two disjoint cycles; seeds live in the first one
    val edges = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r = PageRank.run(edges, teleport = Some(seeds))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // the seed component holds ALL the mass; the unreachable cycle
    // gets exactly zero (no teleport base, no inflow from seeds)
    assert(r(1L) > 0 && r(2L) > 0)
    assert(r(10L) == 0 && r(11L) == 0,
      s"unreachable component must have zero personalized rank: $r")
    // seed keeps the teleport bonus over its non-seed neighbor
    assert(r(1L) > r(2L))
    // total mass ~scale (closed seed component, no dangling)
    assert(math.abs(r.values.sum - scale) < 1000)
  }

  test("personalized + dangling redistribution returns sink mass to seeds") {
    // seed 1 feeds sink 2; without redistribution the sink's mass
    // evaporates, with it the mass returns to the seed
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val lossy = PageRank.run(edges, teleport = Some(seeds))
      .collect().map(_.getLong(1)).sum
    val conserved = PageRank.run(edges, teleport = Some(seeds),
        redistributeDangling = true)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(math.abs(conserved.values.sum - scale) < 1000,
      s"mass not conserved: ${conserved.values.sum}")
    assert(lossy < conserved.values.sum)
    // sink mass teleports back to node 1 only, so the seed dominates
    assert(conserved(1L) > conserved(2L))
  }
}
