package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.tokens

/** Text-analysis operators for training-data pipelines (builder brief):
  * language-ID (character n-gram heuristic), quality scoring, token
  * counting (whitespace + BPE-ish regex), rolling-hash fingerprinting.
  * Pure Column expressions.
  */
object TextAnalysis {

  /** Tiny per-language marker profiles (character n-grams / function words)
    * for a heuristic language scorer. Deliberately small + public-knowledge:
    * the classic stopword trick, not a trained model. */
  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " to ", " is ", "ing ", " that "),
    "es" -> Seq(" el ", " la ", " de ", " que ", " los ", "ción", " una "),
    "de" -> Seq(" der ", " die ", " und ", " das ", " ist ", "sch", " ein "),
    "fr" -> Seq(" le ", " la ", " les ", " des ", " est ", " une ", " que "),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "这"))

  /** Count of profile-marker hits for one language over lowercased text. */
  private def markerHits(text: Column, lang: String): Column =
    profiles(lang).map { m =>
      // occurrences of marker m: (len(text) - len(remove(m))) / len(m)
      ((length(text) - length(regexp_replace(text,
        java.util.regex.Pattern.quote(m), ""))) / m.length).cast("int")
    }.reduce(_ + _)

  /** Heuristic language id: argmax of marker hits; "und" when no evidence.
    * Returns (pred_lang, score) struct columns appended. */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val padded = concat(lit(" "), lower(col(textCol)), lit(" "))
    val scored = profiles.keys.toSeq.sorted.map(l =>
      struct(markerHits(padded, l).as("hits"), lit(l).as("lang")))
    df.withColumn("best", greatest(scored: _*))
      .withColumn("pred_lang",
        when(col("best.hits") > 0, col("best.lang")).otherwise("und"))
      .withColumn("lang_hits", col("best.hits"))
      .drop("best")
  }

  /** Quality features: length, word count, mean word length, alpha ratio,
    * punctuation ratio, stop-token ratio, repetition (1 - type/token). */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val stop = array(Seq("the", "a", "of", "to", "and", "in", "is", "that")
      .map(lit): _*)
    df.withColumn("n_chars_q", length(t))
      .withColumn("n_words", size(toks))
      .withColumn("mean_word_len",
        when(size(toks) === 0, 0.0)
          .otherwise(aggregate(toks, lit(0L), (a, x) => a + length(x)).cast("double") /
            size(toks).cast("double")))
      .withColumn("alpha_ratio",
        when(length(t) === 0, 0.0)
          .otherwise(length(regexp_replace(t, "[^A-Za-z]", "")).cast("double") /
            length(t).cast("double")))
      .withColumn("punct_ratio",
        when(length(t) === 0, 0.0)
          .otherwise(length(regexp_replace(t, "[^.,;:!?]", "")).cast("double") /
            length(t).cast("double")))
      .withColumn("stop_ratio",
        when(size(toks) === 0, 0.0)
          .otherwise(size(array_intersect(toks, stop)).cast("double") /
            size(array_distinct(toks)).cast("double")))
      .withColumn("repetition",
        when(size(toks) === 0, 0.0)
          .otherwise(lit(1.0) - size(array_distinct(toks)).cast("double") /
            size(toks).cast("double")))
  }

  /** Token counts two ways: whitespace words and BPE-ish subword pieces
    * (a regex over letter-runs/digit-runs/punct, the common pre-tokenizer
    * shape). `approx_bpe_tokens` ~ pieces + long-word splits. */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val pieces = filter(
      split(t, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"), x => x =!= "" && x =!= " ")
    df.withColumn("ws_tokens", size(tokens(t)))
      .withColumn("pieces", size(pieces))
      .withColumn("approx_bpe_tokens",
        // long alpha runs split ~ every 4 chars (BPE-ish amortized rate)
        aggregate(pieces, lit(0L),
          (acc, p) => acc + greatest(lit(1L), (length(p) / 4).cast("long"))).cast("long"))
  }

  /** Rolling-hash document fingerprints: hash every `w`-token window, keep
    * the minimum per document (winnowing-lite) plus head fingerprint. */
  def fingerprints(df: DataFrame, textCol: String, w: Int = 8): DataFrame = {
    val toks = tokens(col(textCol))
    val windows = when(size(toks) < w, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - (w - 1)),
        i => concat_ws(" ", slice(toks, i, lit(w)))))
    df.withColumn("fp_min", array_min(transform(windows, x => xxhash64(x))))
      .withColumn("fp_head", xxhash64(concat_ws(" ", slice(toks, lit(1), lit(w)))))
  }
}
