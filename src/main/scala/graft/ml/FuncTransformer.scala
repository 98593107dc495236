package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Generic single-column map Transformer — the reference's
  * FuncTransformer (org/apache/spark/ml/feature/FuncTransformer.scala:45-140)
  * re-expressed Spark-first: instead of wrapping a UserDefinedFunction
  * (opaque to Catalyst, Java-serialized for persistence), it takes a
  * `Column => Column`, so the mapped expression stays inside codegen
  * and the optimizer can push/prune through it.
  *
  * Persistence delta (documented): the reference Java-serializes the
  * UDF closure, which breaks across Scala/Spark versions; pipelines
  * here that need persistable single-column transforms should use
  * SQLTransformer (a SQL string round-trips safely). FuncTransformer
  * is for in-session pipeline composition.
  */
class FuncTransformer(override val uid: String, func: Column => Column)
    extends Transformer {

  def this(func: Column => Column) =
    this(Identifiable.randomUID("funcTrans"), func)

  final val inputCol = new Param[String](this, "inputCol", "input column")
  final val outputCol = new Param[String](this, "outputCol", "output column")
  setDefault(inputCol -> "input", outputCol -> "output")

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  override def transform(dataset: Dataset[_]): DataFrame =
    dataset.withColumn($(outputCol), func(col($(inputCol))))

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(inputCol)),
      s"input column ${$(inputCol)} missing from ${schema.fieldNames.mkString(",")}")
    // output type is whatever the expression evaluates to; resolved at
    // transform time (the reference resolves via the UDF's dataType)
    schema
  }

  override def copy(extra: ParamMap): FuncTransformer =
    defaultCopy(extra)
}
