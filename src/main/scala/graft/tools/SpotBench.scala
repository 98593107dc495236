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
    for (q <- graft.SparkEntry.registry if names.contains(q.name)) {
      val t0 = System.nanoTime()
      val n = q.run(spark, dir).count()
      println(f"[spot] ${q.name}: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
