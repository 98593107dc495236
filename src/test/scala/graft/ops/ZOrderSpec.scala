package graft.ops

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Z-order layout invariants: the interleave is a bijection on the
  * bucket grid, z-ordered files have tight envelopes on BOTH dims
  * (vs a time-ordered layout whose user envelope is the full domain),
  * and the distributed range-partitioned writer reproduces the tight
  * envelopes without any global window. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits exactly (hand-computed cases)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 8).as("z"))
    // z(3,5) : a bits 11 -> pos 0,2 ; b bits 101 -> pos 1,5 => 100111b = 39
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 1L, 2L, 39L, 65535L))
  }

  test("z-order layout prunes on the user dim where a time layout cannot") {
    val events = Tables.events(spark, sf0001)
    val zStats = ZOrder.layoutStats(events, rowsPerFile = 64, bits = 8)
      .collect()
    // expected fraction of files a `user_id = X` point query scans is
    // proportional to the mean per-file user-bucket span
    val zUserSpan = zStats.map(r => r.getLong(3) - r.getLong(2) + 1).sum
      .toDouble / zStats.length
    // same cut, ordered by time instead
    val tsOrdered = ZOrder.bucketedEvents(events, 8)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("hb"), col("event_id"))) - 1)
      .withColumn("file_id", expr("rn DIV 64"))
      .groupBy("file_id")
      .agg(min("ub").as("min_ub"), max("ub").as("max_ub"))
      .collect()
    val tsUserSpan = tsOrdered.map(r => r.getLong(2) - r.getLong(1) + 1).sum
      .toDouble / tsOrdered.length
    // the time layout's per-file user envelope is ~the whole domain; the
    // z layout must cut the expected user-predicate scan at least in half
    assert(zUserSpan * 2 < tsUserSpan,
      s"z user span $zUserSpan not < half ts user span $tsUserSpan")
  }

  test("repartitionByRange writer reproduces tight per-file envelopes " +
      "with no global window") {
    val events = Tables.events(spark, sf0001)
    val withZ = ZOrder.bucketedEvents(events, 8)
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    // the cluster path: range bins ARE the file bins — no window
    withZ.repartitionByRange(16, col("zv"))
      .sortWithinPartitions(col("zv"))
      .write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length >= 8, s"expected several part files, got ${files.length}")
    val spans = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("ub"), max("ub"), min("hb"), max("hb")).collect()(0)
      (r.getLong(1) - r.getLong(0) + 1, r.getLong(3) - r.getLong(2) + 1)
    }
    // every range-partitioned file must be clustered on the user dim:
    // average span well under the 256-bucket domain (a time-ordered
    // layout sits near 256)
    val avgUserSpan = spans.map(_._1).sum.toDouble / spans.length
    assert(avgUserSpan < 154, s"avg user span $avgUserSpan not clustered")
  }

  test("quantile binning beats equal-width on a planted skewed dimension") {
    // RANGE skew, the classic equal-width failure: one outlier id at
    // 10^9 stretches the observed domain so every normal user
    // (ids 1..200) collapses into user-bucket 0 — the z-curve
    // degenerates to hour-order for all of them and a cold-user
    // point query scans nearly every file. Equal-frequency bins by
    // RANK, which cannot see the outlier's magnitude: normal users
    // spread across the bucket space and their point queries prune.
    val rnd = new scala.util.Random(5)
    val rows = (0 until 4096).map { i =>
      val u = if (i % 43 == 0) 1000000000L else 1L + rnd.nextInt(200).toLong
      (i.toLong, u, i.toLong * 3600000000000L) // one event per hour step
    }
    val events = rows.toDF("event_id", "user_id", "ts_ns")
    def scanned(stats: Array[org.apache.spark.sql.Row],
        bucketOf: Long => Long, user: Long): Int = {
      val b = bucketOf(user)
      stats.count(r => r.getLong(2) <= b && b <= r.getLong(3))
    }
    val ew = ZOrder.layoutStats(events, rowsPerFile = 128, bits = 8).collect()
    val qn = ZOrder.layoutStatsQuantile(events, rowsPerFile = 128, bits = 8)
      .collect()
    // bucket of a given user under each scheme, read off the data
    val ewB = ZOrder.bucketedEvents(events, 8)
      .join(events.select($"event_id", $"user_id"), "event_id")
      .groupBy($"user_id").agg(min($"ub").as("b")).as[(Long, Long)]
      .collect().toMap
    val qnB = ZOrder.quantileBucketedEvents(events, 8)
      .join(events.select($"event_id", $"user_id"), "event_id")
      .groupBy($"user_id").agg(min($"ub").as("b")).as[(Long, Long)]
      .collect().toMap
    val coldUsers = (1L to 200L).filter(ewB.contains)
    val ewScan = coldUsers.map(u => scanned(ew, ewB, u)).sum.toDouble
    val qnScan = coldUsers.map(u => scanned(qn, qnB, u)).sum.toDouble
    // equal-width puts every normal user in bucket 0 (whole-corpus
    // scan); quantile must cut the summed scan at least in half
    assert(qnScan * 2 < ewScan,
      s"quantile layout must prune cold-user queries: $qnScan vs $ewScan")
    assert(coldUsers.forall(u => ewB(u) == 0L),
      "planting check: the outlier must collapse equal-width binning")

    // the SCALE path (QuantileDiscretizer sketch edges, no global
    // window) must deliver the same pruning win on the same corpus
    val sc = {
      val b = ZOrder.quantileBucketedEventsScale(events, 8)
      val stats = b.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("zv"), col("event_id"))) - 1)
        .withColumn("file_id", expr("rn DIV 128"))
        .groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"),
          min("ub").as("min_ub"), max("ub").as("max_ub"),
          min("hb").as("min_hb"), max("hb").as("max_hb"))
        .collect()
      val bk = b.join(events.select($"event_id", $"user_id"), "event_id")
        .groupBy($"user_id").agg(min($"ub").as("b")).as[(Long, Long)]
        .collect().toMap
      coldUsers.map(u => scanned(stats, bk, u)).sum.toDouble
    }
    assert(sc * 2 < ewScan,
      s"sketch-edge quantile layout must also prune: $sc vs $ewScan")
  }
}
