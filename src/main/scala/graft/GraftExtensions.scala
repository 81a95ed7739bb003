package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions._

/** `SparkSessionExtensions` injector (SURVEY.md §4.3): registers every
  * native graft expression as a SQL function, so the SQL entry point
  * (SURVEY.md §3.3) reaches the same codegen'd kernels as the
  * DataFrame API:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)
  * // or: --conf spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT simhash_32(word_shingles(split(text,' '), 1)) ...")
  * }}}
  *
  * Int-parameterized expressions (shingle size, signature width) take
  * the parameter as an integer literal argument, resolved at plan
  * time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder))
    }
}

object GraftExtensions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** name → expression builder, shared by the session-extension
    * injector and the post-hoc registrar. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> {
      case Seq(c) => RollingHashExpr(c)
      case _ => throw new IllegalArgumentException("rolling_hash(str)")
    },
    "minhash_base_hashes" -> {
      case Seq(c) => MinhashBaseHashExpr(c)
      case _ => throw new IllegalArgumentException(
        "minhash_base_hashes(array<string>)")
    },
    "minhash_signature" -> ((es: Seq[Expression]) => es match {
      case Seq(c, k) => MinhashSigExpr(c, litInt(k, "numHashes"))
      case _ => throw new IllegalArgumentException(
        "minhash_signature(array<long>, numHashes)")
    }),
    "word_shingles" -> ((es: Seq[Expression]) => es match {
      case Seq(c, n) => WordShinglesExpr(c, litInt(n, "shingle size"))
      case _ => throw new IllegalArgumentException(
        "word_shingles(array<string>, n)")
    }),
    "simhash_32" -> {
      case Seq(c) => Simhash32Expr(c)
      case _ => throw new IllegalArgumentException("simhash_32(array<string>)")
    },
    "dot_product" -> {
      case Seq(a, b) => DotProductExpr(a, b)
      case _ => throw new IllegalArgumentException("dot_product(arr, arr)")
    })

  /** Post-hoc registration on an already-built session (tests,
    * notebooks) — same builders as the injector. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
