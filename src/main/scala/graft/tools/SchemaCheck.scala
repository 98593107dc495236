package graft.tools
import org.apache.spark.sql.SparkSession
object SchemaCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Reco.userRecentItems(spark, "/root/testdata/sf0.001").printSchema()
    graft.queries.Reco.balancedTrainingSet(spark, "/root/testdata/sf0.001").printSchema()
    spark.stop()
  }
}
