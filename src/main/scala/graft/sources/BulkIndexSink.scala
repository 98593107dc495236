package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Search-index bulk sink — the reference's ES sync job
  * (app/management/commands/sync_data_to_es.py:18-50) re-expressed as a
  * Spark sink: each row becomes the two-line Elasticsearch `_bulk`
  * protocol unit (action metadata + source document), written as
  * partitioned text files an indexing fleet can POST as-is.
  *
  * Spark-first rationale: the Django job pages a SQL cursor in batches
  * of 500 on one machine; here serialization is a `to_json` projection
  * (codegen, distributed) and batching falls out of file partitioning —
  * `maxRecordsPerFile` bounds each bulk payload, executors write in
  * parallel, and a retrying indexer gets idempotency from the explicit
  * `_id` (ES bulk index is upsert-by-id, so replaying a file is safe —
  * the same at-least-once contract the reference relies on).
  *
  * No network I/O happens here (zero-egress build): the sink's contract
  * is the on-disk bulk payload, which is also what makes it testable —
  * the round-trip spec reads the files back and re-parses both lines.
  */
object BulkIndexSink {

  /** The reference's sync filter: 10 <= stars <= 290000, not a fork
    * (sync_data_to_es.py:18). */
  def syncFilter(stars: Column, isFork: Column): Column =
    stars.between(10, 290000) && !isFork

  /** Project `df` to bulk-protocol lines: `{"index":{"_index":…,"_id":…}}`
    * then the row as a JSON document. Kept as a DataFrame of lines so
    * callers can inspect/gate it before writing. */
  def toBulkLines(df: DataFrame, index: String, idCol: String): DataFrame = {
    val action = concat(
      lit(s"""{"index":{"_index":"$index","_id":""""),
      col(idCol).cast("string"), lit("\"}}"))
    val source = to_json(struct(df.columns.toIndexedSeq.map(col): _*))
    df.select(concat(action, lit("\n"), source).as("bulk_unit"))
  }

  /** Write bulk files under `path`: one text file per partition, at
    * most `maxDocsPerFile` documents each (one POST-able payload per
    * file). */
  def write(df: DataFrame, index: String, idCol: String, path: String,
      maxDocsPerFile: Int = 500): Unit =
    toBulkLines(df, index, idCol)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxDocsPerFile)
      .text(path)
}
