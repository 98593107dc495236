package graft.tools

import graft.fixtures.ScaleCorpus
import graft.ops.Skew
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted power-law skew probe (r10, VERDICT r9 "Next round" #7):
  * `SkewStressSpec` proves the salted shapes CORRECT; this measures
  * them. A hot key owning 80% of an amplified events table is joined
  * to a broadcast-ineligible dimension (threshold forced to −1, the
  * "dimension too big / executor too small" regime the salted join
  * exists for), naive vs AQE-skew-split vs salted, and a hot-key
  * collect_set naive vs salted. Times are best-of-2 through the noop
  * sink (Bench methodology); results land in SCALE.md §r10.
  *
  * Usage: SPARK_GRAFT_SCALE_FACTOR=10 runMain graft.tools.SkewProbe
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-skew-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("skew-probe").toString
    // 80% of rows on key 0, the rest uniform over 997 warm keys —
    // the reference's popular-repo shape, planted deterministically
    val ev = ScaleCorpus.amplifyEvents(
      Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts")),
      factor)
    ev.withColumn("k",
        when(pmod(col("event_id"), lit(10L)) < 8, lit(0L))
          .otherwise(pmod(col("user_id"), lit(997L)) + 1))
      .select(col("k"), col("event_id"), col("event_type"))
      .write.mode("overwrite").parquet(s"$root/big")
    val big = spark.read.parquet(s"$root/big")
    val dim = (0L to 997L).map(k => (k, s"dim_payload_$k")).toDF("k", "payload")
    dim.write.mode("overwrite").parquet(s"$root/dim")
    val dimT = spark.read.parquet(s"$root/dim")
    println(s"[skew] rows=${big.count()} hot_share=0.8 keys=998")

    def time(label: String)(mk: () => DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[skew] $label%-34s ${ts.min}%7.2f s")
    }

    def conf(k: String, v: String): Unit = spark.conf.set(k, v)
    // the dimension must NOT broadcast (the regime under test)
    conf("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val agg: DataFrame => DataFrame = j =>
      j.groupBy(col("event_type")).agg(count(lit(1)).as("n"),
        sum(length(col("payload"))).as("b"))

    conf("spark.sql.adaptive.skewJoin.enabled", "false")
    time("join naive (no AQE skew split)")(() => agg(big.join(dimT, Seq("k"))))
    conf("spark.sql.adaptive.skewJoin.enabled", "true")
    conf("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB")
    time("join naive (AQE skew split)")(() => agg(big.join(dimT, Seq("k"))))
    conf("spark.sql.adaptive.skewJoin.enabled", "false")
    time("join salted nSalts=32")(() =>
      agg(Skew.saltedEquiJoin(big, dimT, "k", 32)))
    conf("spark.sql.adaptive.skewJoin.enabled", "true")

    // hot-key set agg: per-task buffer is the skew (AQE cannot split
    // an aggregation buffer)
    time("collect_set naive")(() =>
      big.groupBy(col("k"))
        .agg(array_distinct(collect_list(col("event_id"))).as("s")))
    time("collect_set salted nSalts=32")(() =>
      Skew.saltedCollectSet(big, "k", "event_id", 32))
    spark.stop()
  }
}
