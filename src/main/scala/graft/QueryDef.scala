package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query exposed through [[SparkEntry]].
  *
  * @param name   stable key used by the driver's correctness gate
  * @param run    (session, sfDir) => result; sfDir points at the
  *               parquet fixture directory (TESTDATA.md)
  * @param oracle equivalent DuckDB SQL over the same tables; None for
  *               operators that are not SQL-expressible (driver then
  *               records a weaker rows-only check)
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
