package graft.ops

import graft.SparkSpec

class IntegerEnvelopeSpec extends SparkSpec {

  /** Brute-force rational reference: sort, split pos = (n−1)·nq into
    * idx/rem, return the exact numerator. */
  private def brute(vals: Seq[Long], nq: Int, denom: Int): Long = {
    val s = vals.sorted
    val pos = (s.length - 1).toLong * nq
    val idx = (pos / denom).toInt
    val rem = pos % denom
    if (rem == 0) s(idx) * denom
    else s(idx) * (denom - rem) + s(idx + 1) * rem
  }

  test("property: numerators equal the brute-force rational " +
      "interpolation over random multisets (duplicates, negatives, " +
      "singleton and two-element groups, rem=0 edges)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // group sizes chosen to hit rem=0 (n−1 multiple of 200/gcd), tiny
    // groups, and generic sizes; values include duplicates + negatives
    val sizes = Seq(1, 2, 3, 5, 41, 200, 201, 400, 997)
    val data = sizes.zipWithIndex.flatMap { case (n, g) =>
      Seq.fill(n)((s"g$g", rnd.nextInt(2001).toLong - 1000L))
    }
    val df = data.toDF("grp", "v")
    val nqs = Seq(1, 49, 99, 101, 151, 199)
    val got = IntegerEnvelope.numerators(df, "grp", "v", nqs)
      .collect().map { r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2),
          nqs.indices.map(i => r.getLong(4 + i)))
      }.toMap
    val byGroup = data.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2) }
    assert(got.keySet == byGroup.keySet)
    byGroup.foreach { case (g, vals) =>
      val (lo, hi, qs) = got(g)
      assert(lo == vals.min && hi == vals.max, s"$g lo/hi")
      nqs.zip(qs).foreach { case (nq, q) =>
        assert(q == brute(vals, nq, 200),
          s"$g nq=$nq: got $q expected ${brute(vals, nq, 200)}")
      }
    }
  }

  test("numerator/denom reproduces the continuous-quantile value " +
      "(cross-check against the float formula on a clean case)") {
    import spark.implicits._
    // 5 values 0,10,20,30,40: q=0.495 -> pos=1.98 -> 10 + 0.98*10 = 19.8
    val df = Seq(0L, 10L, 20L, 30L, 40L).map(("g", _))
    val out = IntegerEnvelope.numerators(
      df.toDF("grp", "v"), "grp", "v", Seq(99)).collect().head
    val numer = out.getLong(4)
    assert(numer == 10L * (200 - 196) + 20L * 196) // idx=1, rem=196
    assert(math.abs(numer / 200.0 - 19.8) < 1e-9)
  }
}
