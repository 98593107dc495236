package graft.reco

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed dice similarity + neighborhood transfer
  * (reference: train_user_cf.py:31-45). */
class UserCFSpec extends SparkSpec {
  import spark.implicits._

  //  u1: {a,b,c}  u2: {a,b}  u3: {b,c,d}  u4: {d}
  private lazy val inter = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "b"), (3L, "c"), (3L, "d"),
    (4L, "d")).toDF("user_id", "item_id")

  test("dice similarity matches hand computation") {
    val sims = UserCF.userSimilarity(inter)
      .select($"u", $"v", round($"sim", 6).as("sim"))
      .as[(Long, Long, Double)].collect()
      .map { case (u, v, s) => (u, v) -> s }.toMap
    // dice(u1,u2) = 2·|{a,b}| / (3+2)
    assert(sims((1L, 2L)) == 0.8)
    assert(sims((2L, 1L)) == 0.8)
    // dice(u1,u3) = 2·2/(3+3)
    assert(sims((1L, 3L)) == 0.666667)
    // dice(u2,u3) = 2·1/(2+3)
    assert(sims((2L, 3L)) == 0.4)
    // dice(u3,u4) = 2·1/(3+1)
    assert(sims((3L, 4L)) == 0.5)
    // no shared items → no pair row (sparse, never a dense matrix)
    assert(!sims.contains((1L, 4L)))
  }

  test("recommend: neighbors vote unseen items in, dice-weighted") {
    val users = Seq(2L).toDF("user_id")
    val recs = UserCF.recommend(inter, users, k = 5, topNeighbors = 2)
      .as[(Long, String, Double, Long)].collect().toSeq
    // u2's neighbors: u1 (0.8), u3 (0.4); unseen candidates:
    //   c ← u1 + u3 = 1.2,  d ← u3 = 0.4
    assert(recs == Seq((2L, "c", 1.2, 1L), (2L, "d", 0.4, 2L)))
  }

  test("capPerItem keeps each item's smallest user_ids") {
    val capped = UserCF.capPerItem(inter, 1)
      .as[(Long, String)].collect().toSet
    assert(capped == Set((1L, "a"), (1L, "b"), (1L, "c"), (3L, "d")))
  }
}
