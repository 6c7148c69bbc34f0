package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for Σ aᵢ·bᵢ over two ARRAY<FLOAT>/<DOUBLE>
  * columns.
  *
  * The composable form (`zip_with` + `aggregate`) is a higher-order
  * function chain that Catalyst evaluates interpreted (CodegenFallback) —
  * lambda-per-element, boxing on every step. This expression generates a
  * tight primitive loop inside whole-stage codegen instead; on the
  * all-pairs similarity queries that's the hot inner kernel (64
  * multiply-adds × millions of pairs).
  *
  * Summation is the same left-to-right fold over double-cast elements as
  * the HOF version and the DuckDB oracle's ORDER BY i sum, so results are
  * bit-identical across all three FOR the embedding contract this engine
  * uses: fixed-length arrays with no null elements. Outside that contract
  * the edge semantics are defined (not an error) but differ from the HOF
  * form, which returns NULL: null elements read as 0.0, and
  * mismatched-length inputs dot over the common prefix (min length).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs ARRAY<FLOAT|DOUBLE> inputs, got " +
          s"${left.dataType.sql} / ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      // null slots read as 0.0 — matches the codegen path, where
      // UnsafeArrayData yields 0 for null primitive slots (a
      // GenericArrayData getFloat would NPE on the boxed null instead)
      val xv =
        if (x.isNullAt(i)) 0.0
        else if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv =
        if (y.isNullAt(i)) 0.0
        else if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayOps {

  private val fnName = "graft_dot"

  /** Register the expression in the session's function registry (idempotent)
    * — the public bridge from a custom Expression to the Column world.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => DotProduct(exprs(0), exprs(1)), "built-in")

  /** Column-level API for the native dot product (requires `register`). */
  def dot_native(a: Column, b: Column): Column = call_function(fnName, a, b)
}
