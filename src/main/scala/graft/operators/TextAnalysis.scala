package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions.TextFunctions._
import graft.functions.RollingHashExpr

/** Text-analysis operator suite over a `documents`-shaped table
  * (doc_id, text, …) — the language-ID / quality / token-count /
  * fingerprint stages of a training-data pipeline (SURVEY.md §7.5).
  *
  * Everything is a narrow per-row projection: no shuffle, scales
  * embarrassingly with input splits; the only wide stages are the
  * optional corpus-level aggregations the caller adds on top.
  */
object TextAnalysis {

  /** Per-document profile: counts, language guess, quality score,
    * fingerprints. Tokens are staged once; every downstream metric
    * reads the materialized array. */
  def profile(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("_toks", tokens(t))
      .withColumn("n_chars_measured", length(t).cast(LongType))
      .withColumn("n_tokens", size(col("_toks")).cast(LongType))
      .withColumn("mean_token_len", meanTokenLenOf(col("_toks")))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("lang_pred", langIdOf(col("_toks")))
      .withColumn("quality", qualityScoreOf(t, col("_toks")))
      .withColumn("fingerprint_md5", md5Fingerprint(t))
      .withColumn("fingerprint_roll", RollingHashExpr.rolling_hash(normalized(t)))
      .drop("_toks")
  }

  /** Corpus language histogram with mean quality per language. */
  def langHistogram(docs: DataFrame, textCol: String = "text"): DataFrame =
    profile(docs, textCol)
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
}
