package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  import spark.implicits._

  test("bins are contiguous, order-preserving, and byte-preserving") {
    val files = Seq(
      ("p1", 1L, 6L), ("p1", 2L, 6L), ("p1", 3L, 6L), ("p1", 4L, 6L),
      ("p1", 5L, 3L),
      ("p2", 1L, 2L), ("p2", 2L, 2L)
    ).toDF("part", "file_id", "bytes")
    val got = Compaction.planBins(files, "part", "file_id", "bytes", 10L)
      .orderBy("part", "bin")
      .select($"part", $"bin", $"n_files", $"total_bytes", $"first_file", $"last_file")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // p1 prefix: 0,6,12,18,24 -> bins 0,0,1,1,2
    assert(got == Seq(
      ("p1", 0L, 2L, 12L, 1L, 2L),
      ("p1", 1L, 2L, 12L, 3L, 4L),
      ("p1", 2L, 1L, 3L, 5L, 5L),
      ("p2", 0L, 2L, 4L, 1L, 2L)))
    // contiguity: each bin's first_file follows the previous bin's last
    got.groupBy(_._1).foreach { case (_, bins) =>
      bins.sliding(2).foreach {
        case Seq(a, b) => assert(b._5 == a._6 + 1, s"gap between $a and $b")
        case _ =>
      }
    }
    assert(got.map(_._4).sum == 6 * 4 + 3 + 4, "total bytes preserved")
  }

  test("all small inputs: bins under 2*target, cumulative fill, bounded count") {
    val target = 16L
    val files = (1L to 40L).map(i => ("p", i, 1L + (i * 7) % 9))
      .toDF("part", "file_id", "bytes")
    val totalBytes = 40L + (1L to 40L).map(i => (i * 7) % 9).sum
    val bins = Compaction.planBins(files, "part", "file_id", "bytes", target)
      .orderBy("bin").select($"bin", $"total_bytes").as[(Long, Long)]
      .collect().toSeq
    bins.foreach { case (_, t) =>
      assert(t < 2 * target, s"bin size $t >= 2*target")
    }
    // cumulative fill: bytes through bin b reach at least b*target
    bins.scanLeft(0L) { case (acc, (_, t)) => acc + t }.zipWithIndex
      .drop(1).foreach { case (cum, i) =>
        assert(cum >= bins(i - 1)._1 * target,
          s"cumulative $cum under-fills through bin ${bins(i - 1)._1}")
      }
    // output file count bound: at most ceil(total/target) bins
    assert(bins.size <= (totalBytes + target - 1) / target,
      s"${bins.size} bins exceeds ceil($totalBytes/$target)")
  }

  test("an oversized input passes through without swallowing neighbors") {
    val files = Seq(("p", 1L, 3L), ("p", 2L, 50L), ("p", 3L, 3L))
      .toDF("part", "file_id", "bytes")
    val got = Compaction.planBins(files, "part", "file_id", "bytes", 10L)
      .orderBy("bin").select($"bin", $"n_files", $"total_bytes")
      .as[(Long, Long, Long)].collect().toSeq
    // prefixes 0, 3, 53 -> bins 0, 0, 5: the 50-byte file shares only
    // the bin the small file already opened; file 3 starts fresh
    assert(got == Seq((0L, 2L, 53L), (5L, 1L, 3L)))
  }

  test("plan shuffles once on the partition key for the window") {
    val files = Seq(("p", 1L, 3L), ("p", 2L, 4L)).toDF("part", "file_id", "bytes")
    val plan = Compaction.planBins(files, "part", "file_id", "bytes", 10L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    // window on (part), aggregate on (part, bin) — at most two
    // metadata-sized exchanges
    assert(exchanges <= 2, s"unexpected shuffle count, plan:\n$plan")
  }
}
