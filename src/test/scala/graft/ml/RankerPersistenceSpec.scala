package graft.ml

import graft.SparkSpec
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.sql.functions._

/** ML persistence contract (#9) for the flagship pipeline: the full
  * feature PipelineModel (cross-feature SQLTransformers, indexers,
  * OHEs, CountVectorizers, tokenize→stopwords→Word2Vec, assembler)
  * must survive a save/load round-trip with byte-identical output —
  * the reference persists every builder's model through its snapshot
  * layer (Word2VecCorpusBuilder.scala, RankerTrainer save paths). */
class RankerPersistenceSpec extends SparkSpec {

  test("full feature pipeline save/load round-trip preserves features") {
    val boolCols = Seq("user_has_null", "has_ml", "has_fullstack",
      "has_backend", "has_phd", "repo_has_description",
      "repo_is_unmaintained", "repo_recently_pushed")
    val base0 = AlbedoRanker.labeledFeatureFrame(spark)
    val base = boolCols.foldLeft(base0) {
      (df, c) => df.withColumn(c, col(c).cast("double"))
    }.limit(2000).cache()

    val pipeline = new Pipeline().setStages(AlbedoRanker.featureStages())
    val model = pipeline.fit(base)

    val dir = java.nio.file.Files
      .createTempDirectory("ranker-model").toString
    model.write.overwrite().save(dir)
    val loaded = PipelineModel.load(dir)

    def featuresOf(m: PipelineModel) =
      m.transform(base)
        .select(col("user_id"), col("repo_id"), col("features"))
        .orderBy(col("user_id"), col("repo_id"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1),
          r.getAs[org.apache.spark.ml.linalg.Vector](2)))

    val orig = featuresOf(model)
    val rt = featuresOf(loaded)
    assert(orig.length == rt.length && orig.length > 0)
    orig.zip(rt).foreach { case ((u1, r1, v1), (u2, r2, v2)) =>
      assert(u1 == u2 && r1 == r2)
      assert(v1 == v2, s"feature vector drifted for ($u1,$r1)")
    }
  }
}
