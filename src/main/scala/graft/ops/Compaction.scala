package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planner — the OPTIMIZE step a 100 TB table
  * needs after streaming/CDC ingestion leaves thousands of KB-sized
  * files per partition. Plans which input files coalesce into which
  * output file; the rewrite itself is then an embarrassingly-parallel
  * per-bin concat.
  *
  * Binning rule (greedy, order-preserving): within each table
  * partition, files are taken in file-id order and file i goes to bin
  * `prefix_bytes(i) DIV target` (prefix = bytes of files BEFORE i).
  * Consequences:
  *  - bins are contiguous runs in file order (read locality, and
  *    min/max clustering stats survive compaction — the q112 z-order
  *    envelopes stay tight);
  *  - the output file count is bounded: at most
  *    ceil(partition_bytes / target) bins per partition, since a bin
  *    exists only where the byte prefix crosses a multiple of target;
  *  - when every input is smaller than `target`, every bin stays
  *    under 2·target, and the cumulative bytes through bin b reach at
  *    least b·target — individual bins CAN under-fill (a file that
  *    overshoots a boundary leaves less for the next bin), which is
  *    the standard trade for a closed-form parallel plan over a
  *    sequential first-fit loop;
  *  - an input already ≥ target effectively passes through (it fills
  *    one-plus bins on its own and never merges with a whole
  *    neighborhood).
  *
  * Scale shape: the planner runs over file METADATA (one row per
  * file — ~10⁶ rows for 100 TB of 100 MB files), not data. One
  * shuffle on the partition key; the cumulative-sum window and the
  * per-bin aggregate both live on it.
  */
object Compaction {

  /** @param files one row per input file: (partCol, fileCol, bytesCol)
    * @return one row per planned output file: partition, bin, n_files,
    *         total_bytes, first/last input file id */
  def planBins(files: DataFrame, partCol: String, fileCol: String,
      bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = Window.partitionBy(partCol).orderBy(fileCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("__cum", sum(col(bytesCol)).over(w))
      // integer DIV keeps the math exact at any table size (a double
      // division would lose bytes past 2^53)
      .withColumn("bin", expr(s"(__cum - $bytesCol) DIV $targetBytes"))
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(bytesCol)).as("total_bytes"),
        min(col(fileCol)).as("first_file"),
        max(col(fileCol)).as("last_file"))
  }
}
