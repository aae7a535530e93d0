package graft.text

/** Deterministic rule-based sentence segmenter (pysbd-subset).
  *
  * The reference segments with `pysbd.Segmenter(lang, clean=False)`
  * (`cli_tagger.py:37-40,136`) and tracks article offsets with the
  * cumulative rule `total += len(sentence) + 1` (`cli_tagger.py:227`),
  * which assumes sentences are joined by exactly one separator char.
  *
  * This implementation segments on terminal punctuation (`.`, `!`, `?`, `…`)
  * followed by whitespace and an upper-case/digit sentence opener, with
  * abbreviation guards — and returns TRUE char offsets into the article
  * (scan-based, not cumulative), so the invariant
  * `article.text.substring(start, start + sent.length) == sent` always
  * holds (the reference asserts the analogous slice invariant at
  * `single_task/newsagency_ner.py:145-147`). On single-space-joined text the
  * true offsets coincide with the reference's `+1` cumulative rule — locked
  * by a property test.
  */
object Segmenter {

  /** Abbreviations that do not end a sentence (fr/de subset of pysbd's
    * lists — public pysbd language modules). */
  private val Abbrev: Set[String] = Set(
    "m", "mm", "mme", "mlle", "dr", "prof", "st", "etc", "cf", "ca",
    "nr", "no", "art", "vol", "p", "pp", "bzw", "z.b", "u.a", "d.h",
    "usw", "ggf", "abs", "hr", "fr", "frs"
  )

  private def isTerminal(c: Char): Boolean =
    c == '.' || c == '!' || c == '?' || c == '…'

  private def isOpener(c: Char): Boolean =
    c.isUpper || c.isDigit || c == '«' || c == '"' || c == '„'

  /** Word immediately preceding position `i` (exclusive), lower-cased,
    * trailing dot stripped. */
  private def precedingWord(text: String, i: Int): String = {
    var e = i
    var s = e
    while (s > 0 && !text.charAt(s - 1).isWhitespace) s -= 1
    text.substring(s, e).toLowerCase.stripSuffix(".")
  }

  /** Range form of [[segmentWithOffsets]] — sentence boundaries as packed
    * `(start << 32) | end` longs with NO substring allocation; the NER hot
    * path works on ranges into the article text (substrings were ~65% of
    * per-doc cost, round-1 profile). */
  def segmentRanges(text: String): Array[Long] = {
    if (text.isEmpty) return Array.emptyLongArray
    val out = new scala.collection.mutable.ArrayBuffer[Long](8)
    var sentStart = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (isTerminal(c)) {
        // lookahead: whitespace then an opener char ends the sentence,
        // unless the terminal dot closes a known abbreviation or a
        // single-letter initial (e.g. "A. F. P.")
        var k = i + 1
        var sawSpace = false
        while (k < n && text.charAt(k).isWhitespace) { k += 1; sawSpace = true }
        val opens = k < n && sawSpace && isOpener(text.charAt(k))
        val w = if (c == '.') precedingWord(text, i) else ""
        val isAbbrev = c == '.' && (Abbrev(w) || w.length == 1)
        if (opens && !isAbbrev) {
          out += (sentStart.toLong << 32) | (i + 1).toLong
          sentStart = k
          i = k
        } else i += 1
      } else i += 1
    }
    if (sentStart < n) {
      var hasContent = false
      var p = sentStart
      while (p < n && !hasContent) { hasContent = !text.charAt(p).isWhitespace; p += 1 }
      if (hasContent) out += (sentStart.toLong << 32) | n.toLong
    }
    out.toArray
  }

  /** Segment `text` into (startOffset, sentenceText) pairs. Offsets are
    * exact; sentence texts are verbatim slices (no trimming beyond the
    * inter-sentence whitespace, which belongs to no sentence). */
  def segmentWithOffsets(text: String): Seq[(Int, String)] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(
      segmentRanges(text).map { r =>
        val s = (r >>> 32).toInt
        val e = (r & 0xffffffffL).toInt
        (s, text.substring(s, e))
      })

  def segment(text: String): Seq[String] = segmentWithOffsets(text).map(_._2)
}
