package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time selected registry queries.
  * Usage: runMain graft.tools.SpotBench <sfDir> <query...> */
object SpotBench {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSet
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.minPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_MIN_SCAN_PARTS", "1")) // match Bench
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // dev-only A/B hook: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // best-of-N per gate (the Bench methodology): the first run pays
    // codegen + file-index warmup, the min is the comparable statistic
    val passes = sys.env.getOrElse("SPARK_GRAFT_SPOT_PASSES", "2").toInt.max(1)
    for (q <- graft.SparkEntry.registry if names.contains(q.name)) {
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, dir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        // clear per-run, not per-gate: otherwise run 2 reuses run 1's
        // cached intermediates and the min is warm-cache, incomparable
        // with Bench (which clears after every pass)
        spark.catalog.clearCache()
        dt
      }
      println(f"[spot] ${q.name}: ${times.min}%.2f s (runs: ${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
