package graft.reco

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ItemCFSpec extends SparkSpec {
  import spark.implicits._

  private def toy = Seq(
    (1, 10), (1, 20), (1, 30),
    (2, 10), (2, 20),
    (3, 20), (3, 30),
    (4, 10)
  ).toDF("user_id", "item_id")

  test("capPerUser keeps each user's `cap` smallest item_ids, deterministically") {
    val capped = ItemCF.capPerUser(toy, 2)
      .as[(Int, Int)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(capped(1) == Seq(10, 20)) // 30 dropped — smallest ids kept
    assert(capped(2) == Seq(10, 20))
    assert(capped(3) == Seq(20, 30))
    assert(capped(4) == Seq(10))
  }

  test("itemSimilarity matches hand-computed cosine; cap above degree is a no-op") {
    // cosine sim(10,20) = |{1,2}| / sqrt(pop10 * pop20) = 2 / sqrt(3*3)
    val sims = ItemCF.itemSimilarity(toy, maxItemsPerUser = 1000)
      .as[(Int, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(sims((10, 20)) - 2.0 / 3.0) < 1e-12)
    assert(math.abs(sims((20, 30)) - 2.0 / math.sqrt(3.0 * 2.0)) < 1e-12)
    // symmetric pairs both present
    assert(sims.contains((20, 10)) && sims((20, 10)) == sims((10, 20)))
    // cap = 1000 ≫ max degree (3): identical to uncapped semantics
    val relaxed = ItemCF.itemSimilarity(toy, maxItemsPerUser = 3)
      .as[(Int, Int, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(relaxed == sims)
  }

  test("tight cap bounds the self-join contribution of a hot user") {
    // user 1 capped to items {10, 20}: pair (10,30)/(20,30) now only from
    // user 3's (20,30); cooc(10,30) disappears entirely
    val sims = ItemCF.itemSimilarity(toy, maxItemsPerUser = 2)
      .as[(Int, Int, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(!sims.contains((10, 30)))
    // popularity denominator still uses UNCAPPED degrees (pop30 = 2)
    assert(math.abs(sims((20, 30)) - 1.0 / math.sqrt(3.0 * 2.0)) < 1e-12)
  }
}
