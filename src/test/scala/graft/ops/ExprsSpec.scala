package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExprsSpec extends SparkSpec {
  import spark.implicits._

  test("cleanCompany strips suffixes and defaults __empty") {
    val df = Seq("Acme Inc.", "foo.com", "formerly Bar LLC", "", null, "谷歌")
      .toDF("c").select(exprs.cleanCompany($"c").as("v"))
    val got = df.as[String].collect().toSeq
    assert(got(0) == "acme")
    assert(got(1) == "foo")
    assert(got(2) == "bar")
    assert(got(3) == "__empty")
    assert(got(4) == "__empty")
    assert(got(5) == "谷歌")
  }

  test("cleanLocation takes city before comma") {
    val df = Seq("San Francisco, CA", "Taipei City", "  ", null)
      .toDF("c").select(exprs.cleanLocation($"c").as("v"))
    val got = df.as[String].collect().toSeq
    assert(got(0) == "san francisco")
    assert(got(1) == "taipei")
    assert(got(2) == "__empty")
    assert(got(3) == "__empty")
  }

  test("emailDomain extracts domain") {
    val got = Seq("A@B.co", "nope", null).toDF("c")
      .select(exprs.emailDomain($"c").as("v")).as[String].collect().toSeq
    assert(got == Seq("b.co", "__empty", "__empty"))
  }

  test("indexInArrayOrPenalty matches reference 0-based/size+50 semantics") {
    val df = Seq(
      ("b", Seq("a", "b", "c")),  // index 1
      ("z", Seq("a", "b", "c"))   // 3 + 50
    ).toDF("item", "arr")
      .select(exprs.indexInArrayOrPenalty($"item", $"arr").as("v"))
    assert(df.as[Int].collect().toSeq == Seq(1, 53))
  }

  test("countInArray counts occurrences") {
    val df = Seq(("a", Seq("a", "b", "a"))).toDF("item", "arr")
      .select(exprs.countInArray($"item", $"arr").as("v"))
    assert(df.as[Int].collect().toSeq == Seq(2))
  }

  test("likeAny / containsAnyFlag") {
    val df = Seq("machine learning phd", "unrelated text").toDF("c").select(
      exprs.containsAnyFlag($"c", Seq("machine", "fullstack")).as("f"))
    assert(df.as[Double].collect().toSeq == Seq(1.0, 0.0))
  }

  test("numNonzerosOfVector counts dense and sparse non-zeros") {
    import org.apache.spark.ml.linalg.Vectors
    val df = Seq(
      Tuple1(Vectors.dense(0.0, 1.5, 0.0, -2.0)),
      Tuple1(Vectors.sparse(5, Seq((1, 3.0), (4, 0.0))))
    ).toDF("v").select(exprs.numNonzerosOfVector($"v").as("n"))
    assert(df.as[Int].collect().toSeq == Seq(2, 1))
  }

  test("FuncTransformer maps a column inside a pipeline stage") {
    val t = new graft.ml.FuncTransformer(c => org.apache.spark.sql.functions.upper(c))
      .setInputCol("s").setOutputCol("u")
    val out = t.transform(Seq("a", "b").toDF("s"))
    assert(out.select("u").as[String].collect().toSeq == Seq("A", "B"))
    // schema guard fires on a missing input column
    intercept[IllegalArgumentException] {
      t.transformSchema(Seq((1, "x")).toDF("a", "b").schema)
    }
  }
}
