package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingling (SURVEY.md §4.3 custom-`Expression` tier).
  *
  * Bit-compatible with the built-ins-composed
  * [[TextFunctions.wordShinglesOf]] (`transform(sequence(...),
  * i => concat_ws(" ", slice(t, i, n)))`), whose higher-order
  * functions run interpreted — one slice + concat interpreter
  * round-trip per shingle position. This expression emits all
  * shingles in a single codegen'd static call per row.
  */
object TextExprs {

  private val Space = UTF8String.fromString(" ")

  /** Sliding n-token shingles; fewer than n tokens collapse to one
    * whole-array shingle (matches `wordShinglesOf`'s `otherwise`
    * branch, including the empty-array → [""] case). */
  def shingles(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) {
      val parts = new Array[UTF8String](len)
      var i = 0
      while (i < len) { parts(i) = arr.getUTF8String(i); i += 1 }
      new GenericArrayData(Array[Any](UTF8String.concatWs(Space, parts: _*)))
    } else {
      val out = new Array[Any](len - n + 1)
      var i = 0
      while (i <= len - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(Space, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def word_shingles(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(WordShinglesExpr(
      org.apache.spark.sql.graft.ColumnBridge.expression(c), n))
}

/** array<string> tokens → array<string> sliding n-gram shingles. */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, "shingle size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    TextExprs.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}
