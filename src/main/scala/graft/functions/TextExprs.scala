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
    // null tokens → null parts, which concatWs skips — same as the
    // twin's concat_ws (and avoids undefined reads on UnsafeArrayData)
    def part(i: Int): UTF8String =
      if (arr.isNullAt(i)) null else arr.getUTF8String(i)
    if (len < n) {
      val parts = new Array[UTF8String](len)
      var i = 0
      while (i < len) { parts(i) = part(i); i += 1 }
      new GenericArrayData(Array[Any](UTF8String.concatWs(Space, parts: _*)))
    } else {
      val out = new Array[Any](len - n + 1)
      var i = 0
      while (i <= len - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = part(i + j); j += 1 }
        out(i) = UTF8String.concatWs(Space, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def word_shingles(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(WordShinglesExpr(
      org.apache.spark.sql.graft.ColumnBridge.expression(c), n))

  private val simhashMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 32-bit SimHash over a token array — native twin of
    * [[graft.operators.Dedup.simhash32Of]]: bit b is the majority
    * vote of md5-hex-digit-b's top bit over all tokens (ties and the
    * empty array set the bit, matching `2*ones >= n`). One md5 per
    * token total, vs one md5 per token PER BIT interpreted. */
  def simhash32(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](32)
    val d = simhashMd5.get()
    var i = 0
    while (i < n) {
      // null tokens cast no vote but still count toward n — the twin's
      // `filter` drops them (null predicate) while `size(toks)` keeps them
      if (arr.isNullAt(i)) { i += 1 }
      else {
      d.reset()
      val digest = d.digest(arr.getUTF8String(i).getBytes)
      var b = 0
      while (b < 32) {
        val byte = digest(b >> 1) & 0xff
        val nibble = if ((b & 1) == 0) byte >>> 4 else byte & 0xf
        if (nibble >= 8) counts(b) += 1
        b += 1
      }
      i += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (2 * counts(b) >= n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def simhash_32(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(Simhash32Expr(
      org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}

/** array<string> tokens → long 32-bit simhash signature. */
case class Simhash32Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_32 requires array<string>, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    TextExprs.simhash32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.simhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): Simhash32Expr =
    copy(child = newChild)

  override def prettyName: String = "simhash_32"
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
