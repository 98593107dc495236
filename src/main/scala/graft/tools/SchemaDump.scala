package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print schema + sample rows for each fixture table. */
object SchemaDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- graft.sources.Tables.all) {
      try {
        val df = graft.sources.Tables(spark, dir, t)
        println(s"=== $t ===")
        df.printSchema()
        df.show(3, 60, vertical = false)
      } catch {
        case e: Throwable => println(s"=== $t === READ FAILED: ${e.getMessage.take(300)}")
      }
    }
    spark.stop()
  }
}
