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

  test("temperature rebalance: dominant stratum capped at the smoothed " +
      "rate, tail kept whole, admission matches the hand math") {
    // head: 1600 rows x 10 units, tail: 400 rows x 10 units
    val df = (0L until 2000L)
      .map(i => (i, if (i < 1600) "head" else "tail", 10L))
      .toDF("id", "stratum", "units")
    val out = Splits.temperatureRebalance(df, "stratum", "id", "units", "t1")
    val rates = out.select($"stratum", $"keep_rate").distinct()
      .as[(String, Double)].collect().toMap
    // n_head=16000, n_tail=4000; w = floor(sqrt(n)*1000): 126491, 63245
    // p_head = 126491/189736; kr_head = p_head*20000/16000 = 0.8333356
    assert(rates("tail") == 1.0, s"tail must keep everything: $rates")
    assert(rates("head") == 0.833336, s"head rate wrong: $rates")
    // admission replays the portable hash against the integer cutoff
    val bad = out.filter($"admitted" =!=
      (Splits.hashBucketPortable($"id", "t1") <
        when($"stratum" === "head", 833336L).otherwise(1000000L)))
    assert(bad.count() == 0)
    // realized head rate is near the target
    val kept = out.filter($"admitted" && $"stratum" === "head").count()
    assert(kept > 1250 && kept < 1410, s"realized head keeps $kept")
  }
}
