package graft.reco

import graft.SparkSpec

class RankingEvaluatorSpec extends SparkSpec {
  import spark.implicits._

  test("NDCG/P@k/MAP match hand-computed values") {
    // user 1: ranked [1,2,3], actual {2,4}
    //   DCG = 1/log2(3); IDCG = 1 + 1/log2(3); P@3 = 1/3; AP = (1/2)/2
    // user 2: ranked [5], actual {5} → ndcg 1, P@3 = 1/3, AP = 1
    val predicted = Seq(
      (1, 1, 3.0), (1, 2, 2.0), (1, 3, 1.0),
      (2, 5, 9.0)
    ).toDF("user_id", "item_id", "score")
    val actual = Seq((1, 2), (1, 4), (2, 5)).toDF("user_id", "item_id")

    val row = RankingEvaluator.evaluate(predicted, actual, 3).collect()(0)
    val log2_3 = math.log(3) / math.log(2)
    val ndcg1 = (1.0 / log2_3) / (1.0 + 1.0 / log2_3)
    assert(row.getAs[Long]("n_users") == 2)
    assert(math.abs(row.getAs[Double]("ndcg") - (ndcg1 + 1.0) / 2) < 1e-12)
    assert(math.abs(row.getAs[Double]("precision") - 1.0 / 3) < 1e-12)
    assert(math.abs(row.getAs[Double]("map") - (0.25 + 1.0) / 2) < 1e-12)
  }

  test("user with no hits contributes zero") {
    val predicted = Seq((1, 9, 1.0)).toDF("user_id", "item_id", "score")
    val actual = Seq((1, 2)).toDF("user_id", "item_id")
    val row = RankingEvaluator.evaluate(predicted, actual, 5).collect()(0)
    assert(row.getAs[Double]("ndcg") == 0.0)
    assert(row.getAs[Double]("map") == 0.0)
  }

  test("rank ties broken by item id deterministically") {
    // equal scores: item 2 must rank before item 7 (id asc tiebreak)
    val predicted = Seq((1, 7, 1.0), (1, 2, 1.0)).toDF("user_id", "item_id", "score")
    val actual = Seq((1, 2)).toDF("user_id", "item_id")
    val row = RankingEvaluator.evaluate(predicted, actual, 1).collect()(0)
    assert(row.getAs[Double]("ndcg") == 1.0) // item 2 took pos 1
  }
}
