package graft.reco

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StratifiedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def frame = (0L until 2000L)
    .map(i => (i, if (i % 4 == 0) "tail" else "head")).toDF("id", "stratum")

  test("per-stratum keep rates land near the requested fractions") {
    val out = Splits.stratifiedSampleBy(frame, "stratum", "id",
      Map("head" -> 0.3), defaultFrac = 1.0, seed = "s1")
    val byStratum = out.groupBy($"stratum").count()
      .as[(String, Long)].collect().toMap
    assert(byStratum("tail") == 500L) // defaultFrac 1.0 keeps everything
    val headRate = byStratum("head") / 1500.0
    assert(headRate > 0.25 && headRate < 0.35, s"head rate $headRate")
  }

  test("sampling is deterministic and partitioning-independent") {
    val a = Splits.stratifiedSampleBy(frame.repartition(7), "stratum", "id",
      Map("head" -> 0.3), 1.0, "s1").select($"id").as[Long].collect().sorted
    val b = Splits.stratifiedSampleBy(frame.coalesce(1), "stratum", "id",
      Map("head" -> 0.3), 1.0, "s1").select($"id").as[Long].collect().sorted
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }

  test("sampled set is a subset keyed only by hash bucket") {
    val kept = Splits.stratifiedSampleBy(frame, "stratum", "id",
      Map("head" -> 0.3), 1.0, "s1")
    val cut = Splits.hashBucketPortable($"id", "s1")
    val recheck = kept.filter(
      ($"stratum" === "head" && cut >= 300000L) ||
        ($"stratum" === "tail" && cut >= 1000000L))
    assert(recheck.count() == 0)
  }
}
