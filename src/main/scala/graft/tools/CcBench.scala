package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: measure the hashMin vs largeStarSmallStar crossover on
  * chain-heavy graphs (VERDICT r4 stretch #9). Generates ~10^6-edge
  * graphs composed of disjoint chains of length L (diameter = L):
  * hashMin needs ~L rounds at one shuffle-join each, the Kiveris
  * alternating-star variant needs O(log² n) rounds at two shuffles
  * each — the trade flips once the diameter outgrows a small constant.
  *
  * Usage: runMain graft.tools.CcBench [lengths...]   (default 4 16 64 256)
  * Prints one line per (L, algo): seconds, n_components sanity.
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val lengths = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(4, 16, 64, 256)
    val totalEdges = 1000000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    for (l <- lengths) {
      val nChains = totalEdges / l
      // chain c owns ids [c*(l+1), c*(l+1)+l]; edge i links pos -> pos+1
      val edges = spark.range(nChains.toLong * l)
        .select(
          (col("id") / l).cast("long").as("c"),
          (col("id") % l).cast("long").as("p"))
        .select(
          (col("c") * (l + 1) + col("p")).as("src"),
          (col("c") * (l + 1) + col("p") + 1).as("dst"))
        .cache()
      edges.count() // materialize outside the timed region

      def time(name: String)(run: => Long): Unit = {
        val t0 = System.nanoTime()
        val nComp = run
        val dt = (System.nanoTime() - t0) / 1e9
        val ok = if (nComp == nChains) "ok" else s"WRONG (want $nChains)"
        println(f"[ccbench] L=$l%4d $name%-20s ${dt}%7.2f s  components=$nComp $ok")
      }
      time("hashMin") {
        graft.ops.ConnectedComponents.hashMin(edges, "src", "dst",
            maxIter = l + 5)
          .select("comp").distinct().count()
      }
      time("largeStarSmallStar") {
        graft.ops.ConnectedComponents.largeStarSmallStar(edges, "src", "dst")
          .select("comp").distinct().count()
      }
      edges.unpersist()
    }
    spark.stop()
  }
}
