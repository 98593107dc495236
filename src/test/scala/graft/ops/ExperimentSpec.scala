package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** A/B readout ([[Experiment]], gate q152): assignment determinism,
  * count correctness on a hand-replayable corpus, z sign/significance
  * on planted uplift, null result on no effect. */
class ExperimentSpec extends SparkSpec {

  import spark.implicits._

  /** Events for 2000 units; conversion rate depends on the variant
    * the OPERATOR'S own assignment gives the unit (so the planted
    * effect is exact, not probabilistic). */
  private def corpus(treatRate: Int, controlRate: Int) = {
    val units = (1L to 2000L).toDF("user_id")
      .withColumn("treated",
        Experiment.assign(col("user_id"), "spec-seed") === "treatment")
    val ev = units
      .withColumn("event_type",
        when(col("treated") && pmod(col("user_id"), lit(100)) < treatRate,
          lit("purchase"))
          .when(!col("treated") && pmod(col("user_id"), lit(100)) < controlRate,
            lit("purchase"))
          .otherwise(lit("view")))
      .select(col("user_id"), col("event_type"))
    // every unit also gets a plain exposure event
    ev.union(units.select(col("user_id"), lit("view").as("event_type")))
  }

  test("assignment is deterministic and layout-independent") {
    val a = (1L to 500L).toDF("user_id")
      .select(col("user_id"), Experiment.assign(col("user_id"), "s").as("v"))
      .as[(Long, String)].collect().toMap
    val b = (1L to 500L).toDF("user_id").repartition(13)
      .select(col("user_id"), Experiment.assign(col("user_id"), "s").as("v"))
      .as[(Long, String)].collect().toMap
    assert(a == b)
    val nTreat = a.values.count(_ == "treatment")
    assert(nTreat > 200 && nTreat < 300, s"~50/50 split, got $nTreat/500")
  }

  test("planted uplift: counts exact, z positive and significant") {
    val row = Experiment.abSummary(corpus(30, 10), "user_id",
        "event_type", "purchase", "spec-seed").head()
    val (nC, convC, nT, convT) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(nC + nT == 2000)
    // replay the counts locally from the same assignment rule
    val expected = (1L to 2000L).map { u =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"spec-seed:$u".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      val treated = java.lang.Long.parseLong(hex, 16) % 1000000 < 500000
      val conv = if (treated) u % 100 < 30 else u % 100 < 10
      (treated, conv)
    }
    assert(nT == expected.count(_._1))
    assert(convT == expected.count(e => e._1 && e._2))
    assert(convC == expected.count(e => !e._1 && e._2))
    assert(row.getLong(7) > 1960, s"planted 3x uplift must be significant")
    assert(row.getBoolean(8))
    assert(row.getLong(6) > 0, "lift must be positive")
  }

  test("no planted effect: z hovers near zero, not significant") {
    // an exactly-balanced null: every arm converts its own 20% by
    // within-arm rank, so realized rates are equal BY CONSTRUCTION.
    // (A first cut used `u % 100 < 20` in both arms — that is NOT a
    // null: the finite hash split correlates with u's low digits and
    // the operator correctly measured z = 2.24 of pure assignment
    // noise. The z statistic tests realized rates, not intents.)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("treated")).orderBy(col("user_id"))
    val ev = (1L to 2000L).toDF("user_id")
      .withColumn("treated",
        Experiment.assign(col("user_id"), "spec-seed") === "treatment")
      .withColumn("rn", row_number().over(w))
      .withColumn("event_type",
        when(pmod(col("rn"), lit(5)) === 0, lit("purchase"))
          .otherwise(lit("view")))
      .select(col("user_id"), col("event_type"))
    val row = Experiment.abSummary(ev, "user_id",
        "event_type", "purchase", "spec-seed").head()
    assert(math.abs(row.getLong(7)) < 500, s"z_milli ${row.getLong(7)}")
    assert(!row.getBoolean(8))
  }
}
