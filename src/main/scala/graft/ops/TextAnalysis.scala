package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Text-analysis operators for the training-data pipeline: language ID,
  * quality scoring, token counting, fingerprinting. All pure Catalyst
  * column expressions (whole-stage codegen; no UDFs), so they fuse into
  * the scan projection — one pass over the text column.
  */
object TextAnalysis {

  /** Marker-word sets for the n-gram/stopword language heuristic. Order is
    * the deterministic tie-break priority. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "fr" -> Seq("le", "la", "les", "des", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "los", "que", "las", "es")
  )

  private def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit(_)): _*)))

  /** Predicted language: argmax of marker counts with fixed priority order
    * on ties; "und" (undetermined) when no marker occurs. */
  def langId(text: Column): Column = {
    val toks = split(text, " ")
    val counts = LangMarkers.map { case (l, ms) => l -> markerCount(toks, ms) }
    val maxCount = counts.map(_._2).reduce((a, b) => greatest(a, b))
    // first matching language in declaration order wins ties
    counts.foldRight(lit("und")) { case ((l, c), elseCol) =>
      when(c === maxCount && maxCount > 0, lit(l)).otherwise(elseCol)
    }
  }

  /** Quality features per document (length/stopword-ratio heuristics used
    * by web-scale corpus filters). */
  def qualityFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = split(t, " ")
    val stop = LangMarkers.flatMap(_._2).distinct
    docs
      .withColumn("n_tokens", size(toks))
      .withColumn("n_chars_obs", length(t))
      .withColumn("mean_token_len",
        (length(t) - (size(toks) - 1)).cast("double") / size(toks))
      .withColumn("stopword_ratio",
        size(filter(toks, w => w.isin(stop.map(lit(_)): _*))).cast("double") /
          size(toks))
      .withColumn("distinct_token_ratio",
        size(array_distinct(toks)).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: length in range, some stopwords,
    * lexical diversity. Deterministic, monotone in its features. */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame =
    qualityFeatures(docs, textCol)
      .withColumn("quality",
        round(
          when(col("n_tokens") >= 10 && col("n_tokens") <= 10000, 0.4)
            .otherwise(0.0) +
            least(col("stopword_ratio") * 2, lit(0.3)) +
            col("distinct_token_ratio") * 0.3,
          6))

  /** Per-doc fingerprint (min-md5 over char 5-grams). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      TextFunctions.fingerprint5(col("text")).as("fingerprint"))
}
