package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product (SURVEY.md §4.3 custom-`Expression` tier).
  *
  * Bit-compatible with the built-ins-composed
  * `aggregate(zip_with(a, b, (x,y) => x.double * y.double), 0.0, +)`
  * — a strict left-to-right double fold — but runs as one codegen'd
  * static call per row instead of re-entering the HOF interpreter per
  * element. Every similarity operator (brute-force kNN, SRP-LSH, IVF,
  * embedding near-dup) sits on this loop, so it is THE hot path of
  * the vector surface.
  */
object VectorExprs {

  /** Strict sequential Σ aᵢ·bᵢ in double. Mismatched lengths or a
    * null element yield null, matching the zip_with/aggregate
    * composition (zip_with pads with null, null poisons the fold). */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def dot_product(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(DotProductExpr(
      org.apache.spark.sql.graft.ColumnBridge.expression(a),
      org.apache.spark.sql.graft.ColumnBridge.expression(b)))
}

/** array<float|double> × array<float|double> → double. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(FloatType, _) => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _ => None
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (elemOk(left.dataType), elemOk(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires array<float|double> inputs, got " +
          s"${left.dataType} and ${right.dataType}")
    }

  private lazy val aFloat = elemOk(left.dataType).get
  private lazy val bFloat = elemOk(right.dataType).get

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dotCall = (a: String, b: String) =>
      s"graft.functions.VectorExprs.dot($a, $b, $aFloat, $bFloat)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $tmp = ${dotCall(a, b)};
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}
