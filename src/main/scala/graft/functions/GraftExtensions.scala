package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Cluster deployment entry point for the engine's native extensions
  * (SURVEY §4 preference (c): SparkSessionExtensions registration).
  *
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions
  *
  * injects `cosine_native` (the codegen'd [[CosineSimilarity]]
  * expression) into every session's function registry at session build
  * time — SQL users get the fused-loop cosine without Scala access.
  * The per-session `VectorFunctions.register` path stays for
  * programmatic use; this class is the conf-wired equivalent.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("cosine_native"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_native"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorFunctions.buildChecked(exprs)))
  }
}
