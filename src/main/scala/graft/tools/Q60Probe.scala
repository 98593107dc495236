package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: isolate q60 run-to-run drift — dumps the labeled
  * frame, the train split, and per-stage fitted dimensions so two
  * invocations can be diffed. Usage: runMain graft.tools.Q60Probe <outDir> */
object Q60Probe {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.ml.AlbedoRanker.labeledFeatureFrame(spark)
    base.select(col("user_id"), col("repo_id"), col("label"))
      .orderBy(col("user_id"), col("repo_id"), col("label"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/labeled")

    val data = base.repartition(4).cache()
    val Array(tr, te) = data.randomSplit(Array(0.8, 0.2), seed = 42)
    tr.select(col("user_id"), col("repo_id"), col("label"))
      .orderBy(col("user_id"), col("repo_id"), col("label"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/train")

    // distinct categorical cardinalities inside train — the OHE sizes
    val cats = Seq("user_account_type", "company_binned", "clean_location",
      "language_binned", "stars_band", "user_id_str", "repo_id_str")
    val counts = cats.map(c => c -> tr.select(col(c)).distinct().count())
    counts.foreach { case (c, n) => println(s"[probe] $c distinct=$n") }
    // CountVectorizer vocab (minDF=2) per list col: doc-frequency over rows
    Seq("recent_languages", "topics_list").foreach { c =>
      val v = tr.select(col("user_id"), col("repo_id"), explode(col(c)).as("t"))
        .distinct().groupBy(col("t")).count().filter(col("count") >= 2).count()
      println(s"[probe] $c vocab(minDF2)=$v")
    }
    // fit the actual feature stages and print every fitted dimension
    val boolCols = Seq("user_has_null", "has_ml", "has_fullstack",
      "has_backend", "has_phd", "repo_has_description",
      "repo_is_unmaintained", "repo_recently_pushed")
    val casted = boolCols.foldLeft(tr) { (df, c) =>
      df.withColumn(c, col(c).cast("double")) }
    val fitted = new org.apache.spark.ml.Pipeline()
      .setStages(graft.ml.AlbedoRanker.featureStages()).fit(casted)
    fitted.stages.foreach {
      case m: org.apache.spark.ml.feature.StringIndexerModel =>
        println(s"[probe] indexer ${m.getInputCol}: labels=${m.labelsArray.head.length}")
      case m: org.apache.spark.ml.feature.CountVectorizerModel =>
        println(s"[probe] cv ${m.getInputCol}: vocab=${m.vocabulary.length} [${m.vocabulary.sorted.mkString(",")}]")
      case m: org.apache.spark.ml.feature.OneHotEncoderModel =>
        println(s"[probe] ohe sizes=${m.categorySizes.mkString(",")}")
      case _ =>
    }
    val vecSize = fitted.transform(casted)
      .select(col("features")).head()
      .getAs[org.apache.spark.ml.linalg.Vector](0).size
    println(s"[probe] assembled=$vecSize")
    spark.stop()
  }
}
