package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity over two
  * array<float> columns, with whole-stage codegen.
  *
  * The higher-order-function formulation (zip_with + aggregate in
  * [[graft.llmops.Similarity.cosine]]) materializes an intermediate
  * product array per row-pair; this expression is a single fused loop —
  * no allocation beyond the two primitive arrays — and generates
  * straight-line Java inside the stage (SURVEY.md §4: preference order
  * (b), custom Expression, for the ANN hot path).
  *
  * Arithmetic matches the HOF version exactly (float→double promotion,
  * sequential accumulation, dot/(√nx·√ny)) so swapping it in cannot
  * change oracle-checked results.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<float>; enforced by callers (ExpectsInputTypes
  // is private[sql] in Spark 4 so the mixin is unavailable here)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |float[] $x = $a.toFloatArray();
         |float[] $y = $b.toFloatArray();
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |int $n = java.lang.Math.min($x.length, $y.length);
         |for (int $i = 0; $i < $n; $i++) {
         |  double xi = (double) $x[$i]; double yi = (double) $y[$i];
         |  $dot += xi * yi; $nx += xi * xi; $ny += yi * yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0
         |  : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-API entry point for the native cosine. */
  def cosineNative(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Arity-checked builder shared by both SQL registration paths
    * (temp function here; conf-wired [[GraftExtensions]]): a wrong
    * SQL arity must be an analysis error naming the function and the
    * expected count — never a silent extra-arg drop or a raw
    * IndexOutOfBoundsException. */
  private[functions] def buildChecked(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`cosine_native`",
          "expectedNum" -> "2",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    CosineSimilarity(exprs.head, exprs(1))
  }

  /** Register `cosine_native` for SQL callers. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_native", buildChecked, "scala_udf")
}
