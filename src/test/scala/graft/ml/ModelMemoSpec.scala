package graft.ml

import graft.SparkSpec

class ModelMemoSpec extends SparkSpec {

  test("same (session, key) fits once and returns the same instance") {
    var fits = 0
    def fit(): Integer = { fits += 1; Integer.valueOf(fits) }
    val a = ModelMemo.cached(spark, "memo-spec-a")(fit())
    val b = ModelMemo.cached(spark, "memo-spec-a")(fit())
    assert(a eq b)
    assert(fits == 1)
  }

  test("different keys and different sessions fit independently") {
    var fits = 0
    def fit(): Integer = { fits += 1; Integer.valueOf(fits) }
    ModelMemo.cached(spark, "memo-spec-b")(fit())
    ModelMemo.cached(spark, "memo-spec-c")(fit())
    assert(fits == 2)
    // a new session object must not see the first session's entry
    val s2 = spark.newSession()
    ModelMemo.cached(s2, "memo-spec-b")(fit())
    assert(fits == 3)
  }

  test("clear() drops all entries so the next call refits") {
    var fits = 0
    def fit(): Integer = { fits += 1; Integer.valueOf(fits) }
    ModelMemo.cached(spark, "memo-spec-d")(fit())
    ModelMemo.clear()
    ModelMemo.cached(spark, "memo-spec-d")(fit())
    assert(fits == 2)
  }

  test("a memoized fit may compose another memoized fit (reentrant)") {
    // would throw IllegalStateException / deadlock under a
    // computeIfAbsent-based memo; the fit runs outside the map lock
    var inner = 0
    val outer = ModelMemo.cached(spark, "memo-spec-outer") {
      val i = ModelMemo.cached(spark, "memo-spec-inner") {
        inner += 1; Integer.valueOf(41)
      }
      Integer.valueOf(i + 1)
    }
    assert(outer == 42 && inner == 1)
    // the inner entry was published independently
    assert(ModelMemo.cached(spark, "memo-spec-inner")(Integer.valueOf(-1)) == 41)
  }
}
