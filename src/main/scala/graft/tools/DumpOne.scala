package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: dump selected registry queries to parquet without
  * running the whole Verify sweep.
  * Usage: runMain graft.tools.DumpOne <sfDir> <outDir> <name> [<name>...]
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.registry.filter(q => names.contains(q.name)).foreach { q =>
      q.run(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/${q.name}")
      println(s"[dump] wrote $outDir/${q.name}")
    }
    spark.stop()
  }
}
