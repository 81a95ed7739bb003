package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.functions.TextFunctions._

/** Unigram-LM tokenizer building blocks (Kudo 2018, arXiv 1804.10959
  * — the SentencePiece unigram model): a seed substring vocabulary
  * scored by corpus frequency, exact Viterbi segmentation of every
  * word under the vocabulary, and a hard-EM re-estimation pass that
  * recounts pieces from the Viterbi segments. The alternative
  * tokenizer family to [[TextAnalysis.bpeTrain]]'s merge-based BPE.
  *
  * Scale shape (the 100 TB contract):
  *  - all training state lives on the DISTINCT-WORD table (the same
  *    collapse BPE uses) — corpus size only affects the one
  *    tokenize+count pass that builds it;
  *  - the vocabulary is bounded (`vocabCap` + alphabet) and rides
  *    along as one broadcast scalar map; the Viterbi DP runs INSIDE
  *    a row via higher-order array expressions — zero shuffle, no
  *    driver loop, no UDF;
  *  - piece scores are fixed-point integers (1e-6 log-prob units),
  *    so segmentation decisions are bit-identical on any engine or
  *    partitioning — ties prefer the longer piece, then the earlier
  *    split, deterministically.
  */
object UnigramLm {

  /** Distinct-word table: (word, freq), capped at `maxWordLen` chars
    * (the DP bound; longer words would need a wider unroll in any
    * cross-engine twin). */
  def wordTable(docs: DataFrame, textCol: String = "text",
                maxWordLen: Int = 16): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("word"))
      .filter(length(col("word")) <= maxWordLen)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Seed vocabulary: every substring of length 1..`maxPieceLen`
    * counted across the corpus (weighted by word frequency, one
    * count per occurrence position); ALL single characters are kept
    * (so any word stays segmentable) plus the top-`vocabCap`
    * multi-character pieces by (count desc, piece asc). Scores are
    * fixed-point add-free unigram log-probs:
    * s = round(ln(cnt/total)·1e6) as BIGINT.
    * Output: (piece, cnt, s). */
  def seedVocab(words: DataFrame, maxPieceLen: Int = 5,
                vocabCap: Int = 200): DataFrame = {
    val subs = words
      .select(col("word"), col("freq"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("i"))
      .select(col("word"), col("freq"), col("i"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("i")))).as("l"))
      .select(col("word").substr(col("i") + 1, col("l")).as("piece"),
        col("freq"))
    val cnts = subs.groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val singles = cnts.filter(length(col("piece")) === 1)
    val multis = cnts.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(vocabCap)
    val vraw = singles.unionByName(multis)
    val tot = vraw.agg(sum(col("cnt")).as("tv"))
    vraw.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast(DoubleType) / col("tv").cast(DoubleType))
          * lit(1000000.0)).cast(LongType).as("s"))
  }

  /** Exact Viterbi segmentation of each word under `vocab`
    * ((piece, s) with integer scores): best[j] = max over splits of
    * best[i] + s(word[i..j]), ties to the longest piece (smallest
    * i). The DP folds over positions inside one higher-order
    * `aggregate` expression per row — the vocabulary joins in as a
    * broadcast scalar map, so the whole segmentation is a narrow
    * projection. Output: words' columns + (score, n_pieces, seg)
    * where `seg` is the space-joined piece sequence. */
  def viterbiSegment(words: DataFrame, vocab: DataFrame,
                     maxPieceLen: Int = 5): DataFrame = {
    val vm = vocab.agg(
      map_from_entries(collect_list(struct(col("piece"), col("s")))).as("vm"))
    val L = lit(maxPieceLen)
    val unreachable = lit(Long.MinValue / 2)
    val dp = aggregate(
      sequence(lit(1), length(col("word"))),
      array(struct(lit(0L).as("score"), lit(0).as("np"), lit("").as("seg"))),
      (acc: Column, j: Column) => {
        val bestInit =
          struct(unreachable.as("score"), lit(0).as("np"), lit("").as("seg"))
        val best = aggregate(
          sequence(greatest(lit(0), j - L), j - 1),
          bestInit,
          (b: Column, i: Column) => {
            val piece = col("word").substr(i + 1, j - i)
            val sp = element_at(col("vm"), piece)
            val prev = element_at(acc, i + 1)
            val cand = struct(
              (prev.getField("score") + sp).as("score"),
              (prev.getField("np") + 1).as("np"),
              when(prev.getField("np") === 0, piece)
                .otherwise(concat(prev.getField("seg"), lit(" "), piece))
                .as("seg"))
            when(sp.isNotNull &&
              cand.getField("score") > b.getField("score"), cand)
              .otherwise(b)
          })
        concat(acc, array(best))
      })
    words.crossJoin(broadcast(vm))
      .withColumn("_dp", element_at(dp, length(col("word")) + 1))
      .select(words.columns.map(col) :+
        col("_dp.score").as("score") :+
        col("_dp.np").cast(LongType).as("n_pieces") :+
        col("_dp.seg").as("seg"): _*)
  }

  /** Encode the corpus under a trained vocabulary: segment the
    * distinct-word table once (the same collapse [[TextAnalysis
    * .bpeEncode]] uses — corpus size never multiplies DP work), join
    * the per-word piece counts back onto the exploded corpus, and
    * aggregate per document. Documents whose text tokenizes to
    * nothing (and words beyond `maxWordLen`, which the word table
    * excludes) still appear, with zero counts, via the final left
    * join. Output: (id, n_words, n_pieces, n_chars, score). */
  def encode(docs: DataFrame, vocab: DataFrame, idCol: String = "doc_id",
             textCol: String = "text", maxWordLen: Int = 16,
             maxPieceLen: Int = 5): DataFrame = {
    val segmented = viterbiSegment(
        wordTable(docs, textCol, maxWordLen), vocab, maxPieceLen)
      .select(col("word"), col("n_pieces"), col("score"))
    val perDoc = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("word"))
      .join(segmented, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("_nw"), sum(col("n_pieces")).as("_np"),
        sum(length(col("word"))).as("_nc"), sum(col("score")).as("_ns"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_nw"), lit(0L)).as("n_words"),
        coalesce(col("_np"), lit(0L)).as("n_pieces"),
        coalesce(col("_nc"), lit(0L)).as("n_chars"),
        coalesce(col("_ns"), lit(0L)).as("score"))
  }

  /** Hard-EM M-step: recount pieces from the Viterbi segments
    * (weighted by word frequency) and re-score over the used-piece
    * total — the count table the next E-step would segment under.
    * Output: (piece, cnt, s). */
  def emRecount(segmented: DataFrame): DataFrame = {
    val used = segmented
      .select(col("freq"), explode(split(col("seg"), " ")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val tot = used.agg(sum(col("cnt")).as("tv"))
    used.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast(DoubleType) / col("tv").cast(DoubleType))
          * lit(1000000.0)).cast(LongType).as("s"))
  }
}
