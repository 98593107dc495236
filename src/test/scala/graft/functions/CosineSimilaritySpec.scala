package graft.functions

import graft.SparkSpec
import graft.llmops.Similarity
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches HOF cosine bit-for-bit on fixtures") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001).limit(50).cache()
    val a = emb.select($"vec_id".as("ida"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("idb"), $"embedding".as("vb"))
    val pairs = a.crossJoin(b).filter($"ida" < $"idb")
    val diff = pairs.select(
        Similarity.cosine($"va", $"vb").as("hof"),
        VectorFunctions.cosineNative($"va", $"vb").as("nat"))
      .filter($"hof" =!= $"nat").count()
    assert(diff == 0)
  }

  test("interpreted eval matches codegen result") {
    val got = Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
      .select(VectorFunctions.cosineNative($"a", $"b").as("c"))
      .as[Double].collect()(0)
    assert(math.abs(got - 24.0 / 25.0) < 1e-12)
    // direct interpreted path
    val e = CosineSimilarity(null, null)
    val x = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(3.0f, 4.0f))
    val y = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(4.0f, 3.0f))
    assert(math.abs(e.nullSafeEval(x, y).asInstanceOf[Double] - 24.0 / 25.0) < 1e-12)
  }

  test("zero vector yields 0.0") {
    val got = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(VectorFunctions.cosineNative($"a", $"b").as("c"))
      .as[Double].collect()(0)
    assert(got == 0.0)
  }

  test("SQL registration works") {
    VectorFunctions.register(spark)
    Seq((Array(1.0f), Array(1.0f))).toDF("a", "b").createOrReplaceTempView("vv")
    val got = spark.sql("SELECT cosine_native(a, b) AS c FROM vv")
      .as[Double].collect()(0)
    assert(got == 1.0)
  }

  test("wrong SQL arity is an AnalysisException naming the function, " +
      "never a silent arg drop or IndexOutOfBounds") {
    VectorFunctions.register(spark)
    Seq((Array(1.0f), Array(1.0f))).toDF("a", "b").createOrReplaceTempView("vv_arity")
    for (sql <- Seq(
        "SELECT cosine_native(a) FROM vv_arity",
        "SELECT cosine_native(a, b, a) FROM vv_arity")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(sql).collect()
      }
      assert(e.getMessage.contains("cosine_native"), s"for: $sql")
      assert(e.getMessage.contains("2"), s"expected arity missing for: $sql")
    }
  }

  test("GraftExtensions injects cosine_native at session build time") {
    import org.apache.spark.sql.SparkSession
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    try {
      // getOrCreate returns the existing default session untouched, so
      // clear both slots — the builder then constructs a NEW session on
      // the same SparkContext and applies the conf-wired extensions,
      // exactly the spark.sql.extensions deployment path
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      import s.implicits._
      Seq((Array(3.0f, 4.0f), Array(3.0f, 4.0f))).toDF("a", "b")
        .createOrReplaceTempView("vv_ext")
      val got = s.sql("SELECT cosine_native(a, b) AS c FROM vv_ext")
        .as[Double].collect()(0)
      assert(math.abs(got - 1.0) < 1e-12)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
