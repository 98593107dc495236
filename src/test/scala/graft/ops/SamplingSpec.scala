package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-group exact-k deterministic sampling ([[Sampling]], gate
  * q146): exact counts, strategy equivalence, layout independence,
  * seed sensitivity. */
class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val rows = (1L to 2000L).map(i => (i % 5, i))
    .toDF("grp", "id")

  test("exactly k per group; fewer only when the group is smaller") {
    val got = Sampling.viaWindow(rows, "grp", "id", k = 7, seed = "a")
    val per = got.groupBy($"grp").count().as[(Long, Long)].collect().toMap
    assert(per.size == 5 && per.values.forall(_ == 7L))
    val tiny = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("grp", "id")
    val gotTiny = Sampling.viaWindow(tiny, "grp", "id", k = 5, seed = "a")
    assert(gotTiny.count() == 3, "small groups keep everything")
  }

  test("window and k-bounded-Aggregator strategies are row-identical") {
    val a = Sampling.viaWindow(rows, "grp", "id", k = 9, seed = "eq")
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Sampling.viaAggregator(rows, "grp", "id", k = 9, seed = "eq")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.size == 45)
  }

  test("string group columns are rejected on the aggregator path") {
    val s = Seq(("web", 1L)).toDF("grp", "id")
    intercept[IllegalArgumentException] {
      Sampling.viaAggregator(s, "grp", "id", 1, "x")
    }
  }

  test("decimal group columns are rejected on the aggregator path") {
    // TopK.viaAggregator casts the group key to long — a decimal
    // group would silently truncate and change schema (ADVICE r9)
    val d = Seq((BigDecimal("1.5"), 1L)).toDF("grp", "id")
    intercept[IllegalArgumentException] {
      Sampling.viaAggregator(d, "grp", "id", 1, "x")
    }
  }

  test("sample is independent of physical layout") {
    val one = Sampling.viaWindow(rows.repartition(1), "grp", "id", 6, "lay")
      .as[(Long, Long, Long, Long)].collect().toSet
    val many = Sampling.viaWindow(rows.repartition(17, $"id"), "grp", "id", 6, "lay")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(one == many)
  }

  test("different seeds draw different samples") {
    def ids(seed: String) =
      Sampling.viaWindow(rows, "grp", "id", 20, seed)
        .select($"id").as[Long].collect().toSet
    val x = ids("s1"); val y = ids("s2")
    assert(x != y)
    // hash sampling ≈ uniform: overlap of two independent 100-of-2000
    // draws concentrates near 5 (100·100/2000); far from identical
    assert((x intersect y).size < 50)
  }
}
