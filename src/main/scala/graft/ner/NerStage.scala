package graft.ner

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Article, ArticleId, Gazetteer, Mention}
import graft.text.{PunctTokenizer, Segmenter}

/** The flagship dataflow stage: `Dataset[Article] → Dataset[Mention]` via
  * `mapPartitions` with an executor-resident scorer (SURVEY M1-M10;
  * reference: `cli_tagger.py:108-239,294`).
  *
  * Scale design:
  *  - upstream filters (`lang`, `tp`) are plain Catalyst predicates so they
  *    push down to the scan — the reference filters post-parse in Python
  *    closures (`cli_tagger.py:279-282`), we do not reproduce that;
  *  - the stage is a narrow map over url-hash-partitioned input (the caller
  *    repartitions by `xxhash64(url)` per the north rule), no shuffle here;
  *  - mentions are never collected to the driver (the reference's
  *    `.compute()` at `cli_tagger.py:294-300` is the anti-pattern);
  *  - sentences are scored in fixed-size batches to amortize model-call
  *    overhead (`sentenceBatch`, analog of the TorchServe batch POST).
  */
object NerStage {

  /** Languages the model path supports (`cli_tagger.py:132`). */
  val SupportedLangs: Set[String] = Set("fr", "de")

  /** Content types kept (`cli_tagger.py:282`). */
  val KeptTypes: Set[String] = Set("ar", "page")

  /** Catalyst-pushed row gate: F1 + F2 of SURVEY §2.2. */
  def gate(articles: Dataset[Article]): Dataset[Article] =
    articles.filter(
      col("tp").isin(KeptTypes.toSeq: _*) &&
        col("lang").isin(SupportedLangs.toSeq: _*) &&
        col("text").isNotNull && length(col("text")) > 2)

  /** Detect mentions. `numPartitions <= 0` keeps the input partitioning.
    *
    * The scan is COLUMN-PRUNED to `(url, text, lang, tp)` before the object
    * boundary: a typed `Dataset[Article]` would materialize every column,
    * including `html` — on a real crawl corpus the html payload dominates
    * bytes (the input_hint table carries full page bodies), so NER reading
    * it would multiply scan volume by an order of magnitude. PlanSpec locks
    * `html`/`warc_ts` out of the ReadSchema. */
  def detect(
      articles: Dataset[Article],
      scorer: TokenScorer,
      numPartitions: Int = -1,
      sentenceBatch: Int = 64
  ): Dataset[Mention] = {
    val spark = articles.sparkSession
    import spark.implicits._
    val gated = gate(articles)
      .select(col("url"), col("text"), col("lang"), col("tp"))
      .as[(String, String, String, String)]
    val parted =
      if (numPartitions > 0) gated.repartition(numPartitions, xxhash64(col("url")))
      else gated
    parted.mapPartitions { it =>
      it.flatMap { case (url, text, lang, tp) =>
        detectOne(Article(url, null, null, text, lang, tp), scorer, sentenceBatch)
      }
    }
  }

  /** F3 post-filter (`cli_tagger.py:163-166`): the reference keeps a
    * surface iff it is not a bare punctuation char AND longer than one
    * char — which reduces to length > 1 (every `string.punctuation`
    * member is a single char). Shared by both detection paths, which
    * must stay mention-identical (NerSpec differential test). */
  @inline private[graft] def keepSurface(surface: String): Boolean =
    surface.length > 1

  /** Pure per-article detection — unit-testable without Spark. Dispatches
    * to the zero-allocation range path when the scorer supports it
    * (the alias trie does); model-backed scorers take the batched
    * string-token path. Both paths are mention-identical (differential
    * property test in NerSpec). */
  def detectOne(
      a: Article,
      scorer: TokenScorer,
      sentenceBatch: Int = 64
  ): Seq[Mention] = scorer match {
    case r: RangeTokenScorer => detectOneRanges(a, r)
    case _ => detectOneStrings(a, scorer, sentenceBatch)
  }

  /** Range fast path: segmentation, tokenization and trie matching all
    * work on `(start << 32) | end` offsets into the article text — the
    * only per-token allocations left are the output labels array entries
    * (shared constants) and, for matches only, the mention fields. The
    * round-1 profile put token substrings at ~65% of per-doc cost. */
  private[graft] def detectOneRanges(
      a: Article,
      scorer: RangeTokenScorer
  ): Seq[Mention] = {
    val text = a.text
    val sents = Segmenter.segmentRanges(text)
    val out = Seq.newBuilder[Mention]
    var labels = new Array[String](64)
    var confs = new Array[Double](64)
    var si = 0
    while (si < sents.length) {
      val sr = sents(si)
      val sentStart = (sr >>> 32).toInt
      val sentEnd = (sr & 0xffffffffL).toInt
      val toks = PunctTokenizer.tokenizeRanges(text, sentStart, sentEnd)
      val n = toks.length
      if (n > labels.length) {
        labels = new Array[String](math.max(n, labels.length * 2))
        confs = new Array[Double](labels.length)
      }
      scorer.scoreRanges(text, toks, n, labels, confs)
      // inline BIO decode over the arrays (the trie emits plain B-/I-/O)
      var i = 0
      while (i < n) {
        val t = labels(i)
        if (t.length > 2 && t.charAt(0) == 'B' && t.charAt(1) == '-') {
          val spanLabel = t.substring(2)
          val iTag = "I-" + spanLabel
          var j = i + 1
          var confSum = confs(i)
          while (j < n && labels(j) == iTag) { confSum += confs(j); j += 1 }
          val l = (toks(i) >>> 32).toInt
          val r = (toks(j - 1) & 0xffffffffL).toInt
          val entity = Gazetteer.normalizeLabel(spanLabel)
          val name = entity.split('.').last
          val surface = text.substring(l, r)
          if (keepSurface(surface)) {
            out += Mention(
              url = a.url,
              entity = entity,
              surface = surface,
              name = name,
              qid = Gazetteer.qidOf(entity),
              sentenceIdx = si,
              lSentenceOffset = l - sentStart,
              rSentenceOffset = r - sentStart,
              lOffset = l,
              rOffset = r,
              confidence = confSum / (j - i),
              lang = a.lang,
              id = ArticleId.mentionId(a.url, l, r, a.lang)
            )
          }
          i = j
        } else i += 1
      }
      si += 1
    }
    out.result()
  }

  /** String-token path (the batched model contract). */
  private[graft] def detectOneStrings(
      a: Article,
      scorer: TokenScorer,
      sentenceBatch: Int = 64
  ): Seq[Mention] = {
    val sents = Segmenter.segmentWithOffsets(a.text)
    val out = Seq.newBuilder[Mention]
    sents.zipWithIndex.grouped(math.max(1, sentenceBatch)).foreach { group =>
      val tokenized = group.map { case ((_, s), _) => PunctTokenizer.tokenize(s) }
      val scored = scorer.scoreBatch(tokenized.map(_.map(_.text)))
      group.zip(tokenized).zip(scored).foreach {
        case ((((sentStart, _), sentIdx), toks), labels) =>
          val tags = labels.map(_._1)
          val confs = labels.map(_._2)
          BioDecode.decode(toks, tags, confs).foreach { sp =>
            // label postprocess: ATB→ATS typo rewrite (cli_tagger.py:191-199)
            val entity = Gazetteer.normalizeLabel(sp.label)
            val name = entity.split('.').last
            val l = sentStart + sp.start
            val r = sentStart + sp.end
            val surface = a.text.substring(l, r)
            if (keepSurface(surface)) {
              out += Mention(
                url = a.url,
                entity = entity,
                surface = surface,
                name = name,
                qid = Gazetteer.qidOf(entity),
                sentenceIdx = sentIdx,
                lSentenceOffset = sp.start,
                rSentenceOffset = sp.end,
                lOffset = l,
                rOffset = r,
                confidence = sp.confidence,
                lang = a.lang,
                id = ArticleId.mentionId(a.url, l, r, a.lang)
              )
            }
          }
      }
    }
    out.result()
  }
}
