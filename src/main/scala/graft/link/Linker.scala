package graft.link

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Gazetteer, Mention}

/** Entity-linking / canonicalization operators (SURVEY §2.4).
  *
  * The gazetteer is tiny (29 agencies) so every link is a broadcast
  * lookup — either a `typedLit` map probe (pure Catalyst, codegen'd) or a
  * broadcast hash join; there is never a big-big join in this layer.
  */
object Linker {

  /** L1: QID re-link pass (parity with `postprocess.py:54-66`): qid is
    * re-resolved from the gazetteer off the fine label's last dot segment;
    * `articleauthor`/`unk` stay NIL. Pure Catalyst map probe. */
  def relink(mentions: DataFrame): DataFrame = {
    val qidMap = typedLit(Gazetteer.WikidataIdsLower)
    val fine = lower(element_at(split(col("entity"), "\\."), -1))
    mentions.withColumn(
      "qid",
      when(fine.isin("articleauthor", "unk"), lit("NIL"))
        .otherwise(coalesce(qidMap(fine), lit("NIL"))))
  }

  /** L3: alias normalization with mixed-collection explode
    * (`preprocessing.ipynb cells 2,5`): a raw collection name maps to one
    * canonical agency or explodes to several (`afpreuters → [AFP,Reuters]`).
    * Input column `raw` → output rows with column `agency`. */
  def normalizeAliases(df: DataFrame, raw: String): DataFrame = {
    val single = typedLit(Gazetteer.AliasToCanonical)
    val mixed = typedLit(Gazetteer.MixedAliases.map { case (k, v) => k -> v })
    df.withColumn(
        "_agencies",
        coalesce(
          mixed(lower(col(raw))),
          array(coalesce(single(col(raw)), col(raw)))))
      .withColumn("agency", explode(col("_agencies")))
      .drop("_agencies")
  }

  /** L2: surface occurrence search — every occurrence of each mention's
    * surface in its article text becomes a mention
    * (`newsagency_ner.py:73-91,132-147`: `re.finditer(re.escape(surface))`).
    * Implemented as a typed flatMap over (mention, text) pairs; the caller
    * joins mentions back to articles first (url-partitioned equi-join).
    */
  def expandOccurrences(
      mentions: Dataset[Mention],
      articleText: DataFrame // (url, text)
  ): Dataset[Mention] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    mentions.toDF()
      .join(articleText.select(col("url"), col("text").as("_text")), "url")
      .select(col("url"), col("entity"), col("surface"), col("name"),
        col("qid"), col("confidence"), col("lang"), col("_text"))
      .as[(String, String, String, String, String, Double, String, String)]
      // group by article so the text is segmented ONCE per article, not
      // once per mention row (an article with hundreds of mentions would
      // re-segment the same text hundreds of times); sentence lookup per
      // occurrence is a binary search over start offsets. Segmentation
      // gives every expanded occurrence its TRUE sentence index and
      // sentence offsets (the source mention's sentenceIdx is wrong for
      // other occurrences).
      .groupByKey(_._1)
      .flatMapGroups { (url: String, rows: Iterator[(String, String, String,
          String, String, Double, String, String)]) =>
        val rs = rows.toSeq
        val text = rs.head._8
        val sents = graft.text.Segmenter.segmentRanges(text)
        val starts = new Array[Int](sents.length)
        var k = 0
        while (k < sents.length) { starts(k) = (sents(k) >>> 32).toInt; k += 1 }
        rs.iterator.flatMap { case (_, entity, surface, name, qid, conf, lang, _) =>
          occurrences(text, surface).map { case (s, e) =>
            val ins = java.util.Arrays.binarySearch(starts, s)
            val si = if (ins >= 0) ins else math.max(0, -ins - 2)
            val sentStart = if (starts.nonEmpty) starts(si) else 0
            Mention(url, entity, surface, name, qid,
              si, s - sentStart, e - sentStart, s, e, conf, lang,
              graft.core.ArticleId.mentionId(url, s, e, lang))
          }
        }
      }
      .dropDuplicates("id")
  }

  /** L4: sentence-level proximity pairs — consecutive mentions within the
    * same (url, sentence) whose character gap is ≤ `maxGap` (reference
    * `descriptive_analysis.ipynb cells 61-67`: zip of consecutive
    * lSentenceOffsets ≤ 30 chars, used to surface composite mentions like
    * "Reuters/AFP"). Window-lag formulation; no driver loop. */
  def adjacentPairs(mentions: DataFrame, maxGap: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("url"), col("sentenceIdx"))
      .orderBy(col("lOffset"))
    mentions
      .withColumn("_prevName", lag(col("name"), 1).over(w))
      .withColumn("_prevR", lag(col("rOffset"), 1).over(w))
      .where(col("_prevR").isNotNull &&
        col("lOffset") - col("_prevR") <= maxGap)
      .select(col("url"), col("sentenceIdx"),
        col("_prevName").as("name1"), col("name").as("name2"),
        (col("lOffset") - col("_prevR")).as("gap"))
  }

  /** All (start, end) occurrences of `needle` in `hay` (literal match). */
  def occurrences(hay: String, needle: String): Seq[(Int, Int)] = {
    if (needle.isEmpty) return Seq.empty
    val out = Seq.newBuilder[(Int, Int)]
    var from = 0
    var i = hay.indexOf(needle, from)
    while (i >= 0) {
      out += ((i, i + needle.length))
      from = i + 1
      i = hay.indexOf(needle, from)
    }
    out.result()
  }
}
