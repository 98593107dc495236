package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of picks latest right ≤ left time; equal time included; none → null") {
    val left = Seq((1, 100L, "e1"), (1, 50L, "e2"), (2, 10L, "e3"))
      .toDF("k", "t", "tag")
    val right = Seq((1, 40L, "s40"), (1, 100L, "s100"), (2, 20L, "s20"))
      .toDF("k", "t", "state")
    val got = AsOfJoin.asOf(left, right, "k", "t", Seq("state"))
      .select("tag", "asof_state").as[(String, Option[String])]
      .collect().toMap
    assert(got("e1").contains("s100")) // equal timestamp eligible
    assert(got("e2").contains("s40"))  // latest ≤ 50
    assert(got("e3").isEmpty)          // no right row ≤ 10
  }

  test("tolerance nulls stale matches but keeps fresh ones") {
    val left = Seq((1, 50L, "fresh"), (1, 200L, "stale"), (1, 140L, "edge"))
      .toDF("k", "t", "tag")
    val right = Seq((1, 40L, "s40")).toDF("k", "t", "state")
    val got = AsOfJoin.asOf(left, right, "k", "t", Seq("state"),
        tolerance = Some(100L))
      .select("tag", "asof_state").as[(String, Option[String])]
      .collect().toMap
    assert(got("fresh").contains("s40"))   // 10 units old
    assert(got("edge").contains("s40"))    // exactly 100 units old (<=)
    assert(got("stale").isEmpty)           // 160 units old
  }

  test("multiple keys stay isolated") {
    val left = Seq((1, 10L, "a"), (2, 10L, "b")).toDF("k", "t", "tag")
    val right = Seq((1, 5L, "x")).toDF("k", "t", "state")
    val got = AsOfJoin.asOf(left, right, "k", "t", Seq("state"))
      .select("tag", "asof_state").as[(String, Option[String])]
      .collect().toMap
    assert(got("a").contains("x"))
    assert(got("b").isEmpty)
  }

  test("reserved internal payload field name is rejected loudly (ADVICE r8 #4)") {
    val left = Seq((1, 10L, "a")).toDF("k", "t", "tag")
    val right = Seq((1, 5L, "x")).toDF("k", "t", "__graft_asof_ts")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, "k", "t", Seq("__graft_asof_ts"))
    }
  }
}
