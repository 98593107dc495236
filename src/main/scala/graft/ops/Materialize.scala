package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** Eager materialization for tiny gate results whose inputs are cached.
  *
  * Pattern (ADVICE r3 #5, generalized r5): a metrics-style gate fits
  * its models EAGERLY, so by the time it returns, the cached fixture
  * frames have done their job — but a lazily-returned plan would keep
  * referencing them, forcing the caches to outlive the call and pin
  * executor memory for the session. Collecting the handful of result
  * rows into a local relation lets the inputs unpersist NOW, and the
  * caller gets a plan with no upstream lineage at all.
  *
  * Only for results of bounded driver-safe size (metrics rows, grid
  * points) — never for row-scale data.
  */
object Materialize {

  /** Collect `out` into a local relation, then unpersist `caches`. */
  def localThenUnpersist(out: DataFrame, caches: Dataset[_]*): DataFrame = {
    val rows = out.collect()
    caches.foreach(_.unpersist())
    out.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), out.schema)
  }
}
