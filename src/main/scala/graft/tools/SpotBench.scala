package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time selected registry queries.
  * Usage: runMain graft.tools.SpotBench <sfDir> <query...> */
object SpotBench {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSet
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // best-of-2 per gate (the Bench methodology): the first run pays
    // codegen + file-index warmup, the min is the comparable statistic
    for (q <- graft.SparkEntry.registry if names.contains(q.name)) {
      val times = (1 to 2).map { _ =>
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
