package graft.llmops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BudgetedSelectionSpec extends SparkSpec {

  import spark.implicits._

  test("greedy prefix of the quality order; overflow doc closes intake") {
    val docs = Seq(
      // source a: quality order 3(q=9,tok=5), 1(q=7,tok=4), 2(q=5,tok=4)
      (1L, "a", 7L, 4L), (2L, "a", 5L, 4L), (3L, "a", 9L, 5L),
      // source b fits entirely
      (4L, "b", 1L, 2L), (5L, "b", 2L, 3L)
    ).toDF("doc_id", "source", "q", "tok")
    val got = Quality.budgetedSelection(docs, "source", "doc_id",
        tokenExpr = col("tok"), qualityExpr = col("q"),
        budgetPerSource = 10L)
      .select($"doc_id", $"admitted").as[(Long, Boolean)].collect().toMap
    // a: 3 (cum 5) + 1 (cum 9) admitted; 2 overflows (cum 13)
    assert(got == Map(1L -> true, 2L -> false, 3L -> true,
      4L -> true, 5L -> true))
  }

  test("quality ties admit deterministically by id") {
    val docs = Seq((1L, "s", 5L, 6L), (2L, "s", 5L, 6L))
      .toDF("doc_id", "source", "q", "tok")
    val got = Quality.budgetedSelection(docs, "source", "doc_id",
        col("tok"), col("q"), budgetPerSource = 6L)
      .select($"doc_id", $"admitted").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false))
  }
}
