package graft.queries

import graft.SparkSpec

/** Quality-parity bands (BASELINE.md rows 1-4 lifecycle on the albedo
  * fixtures): every CG recommender's seeded NDCG@30 must stay inside
  * its pinned band — the hard assertion behind gate q90. */
class QualityParitySpec extends SparkSpec {

  // one evaluation (ALS fit included) shared by both tests
  private lazy val rows =
    QualityParity.cgQuality(spark, sf0001).collect()

  test("all CG recommenders score inside their pinned NDCG@30 bands") {
    assert(rows.length == 5) // popularity/curation/als/content + usercf (r8)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_band"),
        s"${r.getAs[String]("recommender")} NDCG@30=" +
          s"${r.getAs[Double]("ndcg")} escaped its band")
    }
  }

  test("evaluation set is non-trivial (time split leaves test users)") {
    val nUsers = rows.head.getAs[Long]("n_users")
    assert(nUsers > 100, s"only $nUsers test users — split degenerate")
  }
}
