package graft.text

/** The reference's punctuation tokenizer: every `string.punctuation` char is
  * padded with spaces, then the string is whitespace-split (3 identical
  * copies in the reference: `cli_tagger_no_torch_serve.py:158-161`,
  * `model_handler.py:24-28`, `single_task/newsagency_ner.py:60-64`).
  *
  * This implementation produces the same token stream AND true char offsets
  * into the input (the reference recovers offsets after the fact via
  * `re.finditer`, `newsagency_ner.py:73-91`; we carry them through instead,
  * so `input.substring(start, end) == token` by construction).
  */
object PunctTokenizer {

  final case class Token(text: String, start: Int, end: Int)

  /** Python `str.split()` whitespace: `Character.isWhitespace` misses
    * U+00A0 (NBSP) and other Unicode space separators that Python treats
    * as whitespace — plausible in OCR'd historical text — so the predicate
    * also includes `isSpaceChar`. */
  @inline private def isSplitSpace(c: Char): Boolean =
    Character.isWhitespace(c) || Character.isSpaceChar(c)

  def tokenize(s: String): IndexedSeq[Token] = {
    // array-backed (Vector builders cost ~2x in the NER hot path)
    val out = new scala.collection.mutable.ArrayBuffer[Token](
      math.max(8, s.length / 5))
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (isSplitSpace(c)) i += 1
      else if (TextNorm.isPunct(c)) {
        out += Token(String.valueOf(c), i, i + 1)
        i += 1
      } else {
        val start = i
        while (i < n && !isSplitSpace(s.charAt(i)) && !TextNorm.isPunct(s.charAt(i)))
          i += 1
        out += Token(s.substring(start, i), start, i)
      }
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out.toArray)
  }

  /** Plain token strings, byte-compatible with the reference's
    * `tokenize(text)` list. */
  def tokens(s: String): IndexedSeq[String] = tokenize(s).map(_.text)

  /** Range form over `text[from, until)`: token boundaries as packed
    * `(start << 32) | end` longs with ABSOLUTE offsets into `text` and no
    * substring allocation — the NER hot path's tokenizer (substrings were
    * the round-1 profile's dominant cost). Same split semantics as
    * [[tokenize]], property-locked in TextSpec. */
  def tokenizeRanges(text: String, from: Int, until: Int): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](
      math.max(8, (until - from) / 5))
    var i = from
    while (i < until) {
      val c = text.charAt(i)
      if (isSplitSpace(c)) i += 1
      else if (TextNorm.isPunct(c)) {
        out += (i.toLong << 32) | (i + 1).toLong
        i += 1
      } else {
        val start = i
        while (i < until && !isSplitSpace(text.charAt(i)) &&
          !TextNorm.isPunct(text.charAt(i))) i += 1
        out += (start.toLong << 32) | i.toLong
      }
    }
    out.toArray
  }
}
