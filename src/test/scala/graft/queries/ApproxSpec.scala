package graft.queries

import graft.SparkSpec

class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within default HLL error of exact") {
    val rows = Relational.approxDistinct(spark, sf0001)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, approx, exact) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.1, s"$flag: approx=$approx exact=$exact err=$err")
    }
  }
}
