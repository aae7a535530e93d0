package graft.core

import java.sql.Timestamp

/** Core typed data model of the KG-construction engine.
  *
  * The input row mirrors the `input_hint` Iceberg table
  * `(url, warc_ts, html, text, lang)` plus the reference's content-type
  * discriminator `tp` (reference: `tests/na_tagger_in.jsonl`, field accesses
  * `lib/bert_classification/cli_tagger.py:130-131,282`).
  *
  * `text` is authoritative and must stay byte-identical to the reference's
  * `ft` tokenizer input per url (SURVEY §1.2); the only permitted transform
  * is the length-preserving control-char rule in [[graft.text.TextNorm]].
  */
final case class Article(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String,
    tp: String
)

/** One sentence of an article with its char offset into the article text.
  * Offset bookkeeping reproduces the reference's cumulative `+1` rule
  * (`cli_tagger.py:227`: `total_sentence_length += len(sentence) + 1`).
  */
final case class Sentence(url: String, idx: Int, start: Int, text: String)

/** A detected agency mention, carrying BOTH offset systems so all three
  * reference schema generations (SURVEY §1.3) are representable:
  *
  *  - generation 1, sentence-offset form (`cli_tagger.py:211-222`):
  *    `lSentenceOffset`/`rSentenceOffset` + [[idGen1]]'s 8-field grammar;
  *  - generation 2, article-offset form (`postprocess.py:54-66`): `lOffset`/
  *    `rOffset` + the 5-field `id` carried here;
  *  - generation 3, nested 2024 form (`tests/na_tagger_out.jsonl`): rollup
  *    via `JsonlArticles.writeNested2024`.
  *
  * `entity` is the fine BIO-stripped label (`org.ent.pressagency.<Agency>`),
  * `surface` the raw text slice `[lOffset, rOffset)`, `qid` the linked
  * Wikidata id or "NIL", `confidence` the mean span score.
  * `id = <url>:<lOffset>:<rOffset>:newsag:bert_<lang>`. Sentence offsets of
  * mentions produced by article-level occurrence expansion are recomputed
  * from the segmenter (see `Linker.expandOccurrences`).
  */
final case class Mention(
    url: String,
    entity: String,
    surface: String,
    name: String,
    qid: String,
    sentenceIdx: Int,
    lSentenceOffset: Int,
    rSentenceOffset: Int,
    lOffset: Int,
    rOffset: Int,
    confidence: Double,
    lang: String,
    id: String
) {
  /** Generation-1 composite id (`cli_tagger.py:220-222`):
    * `<url>:<sent>:<lSent>:<rSent>:<lArt>:<rArt>:newsag:bert_<lang>`. */
  def idGen1: String =
    ArticleId.mentionIdGen1(url, sentenceIdx, lSentenceOffset,
      rSentenceOffset, lOffset, rOffset, lang)
}

/** A (subject, predicate, object) triple of the materialized graph.
  * Predicates used: `mentions_agency` (article → agency QID) and
  * `alias` (agency QID → observed surface form). SURVEY §3.4.
  */
final case class Triple(subj: String, pred: String, obj: String)

/** Token-index span used by the seqeval/HIPE-style scorer
  * (reference: `HIPE-scorer/hipe_evaluation/utils.py:11`). */
final case class Span(eType: String, start: Int, end: Int, text: String)

/** Gold mention emitted by the synthetic corpus generator, same seed as the
  * article text (SURVEY §7.1 `synth`). Offsets are char offsets into `text`. */
final case class GoldMention(
    url: String,
    lOffset: Int,
    rOffset: Int,
    surface: String,
    entity: String,
    qid: String
)

/** Agency dimension row: existence interval semantics from
  * `notebooks/4_analysis/network_analysis.ipynb cells 7-9`
  * (defaults 1840/2020; Havas end 1944; Europapress 1918-1941). */
final case class AgencyMeta(
    agency: String,
    qid: String,
    country: String,
    startYear: Int,
    endYear: Int
)

/** One token of a CoNLL/HIPE TSV document
  * (13 columns, `lib/bert_classification/dataset.py:4-16`). */
final case class TsvToken(
    docId: String,
    segId: Long,
    tokIdx: Int,
    token: String,
    neCoarseLit: String,
    neFineLit: String,
    nelLit: String,
    misc: String,
    isEndOfSentence: Boolean,
    nelMeto: String = "_",
    // OCR-INFO cell (col 11) — carries the `LEDx.xx` normalized-
    // Levenshtein noise annotation the scorer's --noise_level slices
    // filter on (utils.py:202)
    ocrInfo: String = "_",
    // document date from the `# date = YYYY-MM-DD` metadata row — the
    // scorer's --time_period slice axis (utils.py:152-158,207); its
    // fallback when the comment exists but holds no date is 2022-01-01
    date: String = "2022-01-01"
) {
  /** Parsed LED noise level, `LED(\d+(\.\d+)?)` over OCR-INFO
    * (utils.py:200-205): None when absent — the noise filter KEEPS
    * un-annotated tokens (utils.py:236). */
  def led: Option[Double] =
    TsvToken.LedRe.findFirstMatchIn(ocrInfo).map(_.group(1).toDouble)
}

object TsvToken {
  private val LedRe = "LED(\\d+(\\.\\d+)?)".r
}
