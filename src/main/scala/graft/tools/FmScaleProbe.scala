package graft.tools

import graft.ml.FmRanker
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale legs for the FM apply path (r13 — the q173 family's
  * "100 TB-safe?" row, measured like every other family's): amplify
  * the dumped sparse feature entries ×factor by shifting user ids per
  * copy (more users × the same candidate structure — the serving
  * shape: the MODEL is fixed, the scored population grows) and time
  * [[FmRanker.scoreEntries]] — the real operator — through the noop
  * sink at 1×, 10×, 100×. Every exchange is keyed by (user, repo) or
  * user; the coefficient dims ride broadcasts; expectation is a
  * sub-linear-to-linear wall-time exponent with no shape change.
  *
  * Usage: runMain graft.tools.FmScaleProbe  (fits + dumps first if the
  * fm_ranker dump dir is absent; factors via SPARK_GRAFT_FM_FACTORS)
  */
object FmScaleProbe {
  def main(args: Array[String]): Unit = {
    val factors = sys.env.getOrElse("SPARK_GRAFT_FM_FACTORS", "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-fm-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ensure the dump exists (one seeded fit; memoized thereafter)
    FmRanker.scoreReplay(spark).write.format("noop").mode("overwrite").save()
    val root = java.nio.file.Files.createTempDirectory("fm-scale").toString
    val sp0 = spark.read.parquet(s"${FmRanker.fmDir}/sparse.parquet")
    val mo = spark.read.parquet(s"${FmRanker.fmDir}/model.parquet")

    def stage(f: Int): DataFrame = {
      val p = s"$root/sp$f"
      (0 until f).map { k =>
        sp0.withColumn("user_id",
          col("user_id") + lit(k.toLong * 10000000L))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }

    // ---- FIT-path leg (VERDICT r13 next-round #2): the entity index
    // build — denseIndex over f× the fixture's user population. The old
    // global-window form funneled the dictionary through ONE task; the
    // zipWithIndex form is a keyed distinct + parallel sort + count
    // job, so wall time should stay near-flat in f on 32 cores.
    // Base population 1M synthetic ids (xxhash64-scrambled so the input
    // arrives unordered — the sort has real work to do), ×f up to 100M.
    val it1 = scala.collection.mutable.Map[Int, Double]()
    for (f <- factors) {
      val entities = spark.range(0, f.toLong * 1000000L)
        .select(xxhash64(col("id")).as("user_id"))
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = FmRanker.denseIndex(entities, "user_id", "uidx").count()
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[fmscale-fit] factor=$f indexed=$n%,d t=$dt%.2f s")
        dt
      }
      it1(f) = times.min
      val head = factors.head
      if (f > head && it1.contains(head))
        System.err.println(f"[fmscale-fit] factor=$f exp${head}_to_${f}=${
          math.log(it1(f) / it1(head)) / math.log(f.toDouble / head)}%.2f")
    }

    val t1 = scala.collection.mutable.Map[Int, Double]()
    for (f <- factors) {
      val sp = stage(f)
      val entries = sp.count()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        FmRanker.scoreEntries(sp, mo)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      t1(f) = times.min
      // exponent relative to the ACTUAL baseline factor (ADVICE r13 #3:
      // dividing by log(f) is only right when factors.head == 1)
      val head = factors.head
      val exp = if (f > head && t1.contains(head))
        f" exp${head}_to_${f}=${
          math.log(t1(f) / t1(head)) / math.log(f.toDouble / head)}%.2f"
      else ""
      System.err.println(f"[fmscale] factor=$f entries=$entries%,d " +
        f"t=${times.min}%.2f s (runs: ${times.map(t => f"$t%.2f").mkString(", ")})$exp")
    }
    spark.stop()
  }
}
