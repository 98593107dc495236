package graft.reco

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NegativeBalancerSpec extends SparkSpec {
  import spark.implicits._

  // popularity: item 10 (3 users) > item 20 (2) > item 30 (1), ties none
  private def toy = Seq(
    (1, 10), (2, 10), (3, 10),
    (1, 20), (2, 20),
    (3, 30)
  ).toDF("user_id", "item_id")

  test("negatives never include the user's positives") {
    val negs = NegativeBalancer.negatives(toy, 100, 10.0)
    val leaked = negs.join(toy, Seq("user_id", "item_id")).count()
    assert(leaked == 0)
  }

  test("most-popular-first order and ratio bound") {
    // user 3 has positives {10, 30}, 2 of them → 2 negatives at ratio 1.0
    // popular order is [10, 20, 30]; minus positives = [20] → just item 20
    val negs = NegativeBalancer.negatives(toy, 100, 1.0)
      .filter($"user_id" === 3).select("item_id").as[Int].collect().toSeq
    assert(negs == Seq(20))
    // user 1 (positives {10,20}) → [30] at ratio 1.0 capped to 2 → [30]
    val negs1 = NegativeBalancer.negatives(toy, 100, 1.0)
      .filter($"user_id" === 1).select("item_id").as[Int].collect().toSeq
    assert(negs1 == Seq(30))
  }

  test("balance unions labeled positives and negatives") {
    val b = NegativeBalancer.balance(toy, 100, 1.0)
    assert(b.filter($"label" === 1.0).count() == 6)
    assert(b.filter($"label" === 0.0).count() > 0)
    assert(b.columns.toSeq == Seq("user_id", "item_id", "label"))
  }

  test("duplicate events do not inflate the negative count (set semantics)") {
    // n_pos must be DISTINCT positives (reference: positiveItems.size);
    // duplicating every event row must leave the negatives unchanged
    val doubled = toy.unionAll(toy)
    val once = NegativeBalancer.negatives(toy, 100, 1.0)
      .orderBy("user_id", "item_id").collect().toSeq
    val twice = NegativeBalancer.negatives(doubled, 100, 1.0)
      .orderBy("user_id", "item_id").collect().toSeq
    assert(once == twice)
  }

  test("positives outside the popular pool still bound the negative count") {
    // pool capped to 1 item: only item 10 is a candidate; user 3 has
    // positives {10, 30} → n_pos=2 but the pool minus positives is empty
    val negs = NegativeBalancer.negatives(toy, 1, 1.0)
    assert(negs.filter($"user_id" === 3).count() == 0)
    // a user with no positives in the pool gets the full pool up to n_pos
    val toy2 = Seq((1, 10), (2, 20), (2, 21)).toDF("user_id", "item_id")
    val n2 = NegativeBalancer.negatives(toy2, 1, 1.0)
      .filter($"user_id" === 2).select("item_id").as[Int].collect().toSeq
    assert(n2 == Seq(10)) // pool=[10], user 2 unseen, n_pos=2 → take [10]
  }
}
