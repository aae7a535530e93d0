package graft.ner

import graft.text.PunctTokenizer.Token

/** BIO tag-sequence → span decoding.
  *
  * Reference semantics (`model_handler.py:31-72` ==
  * `cli_tagger_no_torch_serve.py:164-205`): rewrite `S- → B-` and
  * `E- → I-`, then group a `B-X` followed by contiguous `I-X` into one
  * span. The reference routes this through nltk's `conlltags2tree`; only
  * adjacency and labels matter, so we group directly (SURVEY M8).
  */
object BioDecode {

  /** A decoded span over token indices [firstTok, lastTok] with char
    * offsets into the tokenized string and mean confidence
    * (`newsagency_ner.py:138`: `np.average` over span token scores). */
  final case class DecodedSpan(
      label: String,
      firstTok: Int,
      lastTok: Int,
      start: Int,
      end: Int,
      confidence: Double
  )

  private def normalizeTag(tag: String): String =
    if (tag.startsWith("S-")) "B-" + tag.substring(2)
    else if (tag.startsWith("E-")) "I-" + tag.substring(2)
    else tag

  /** Decode one sentence. `tokens` carries true char offsets; `tags` and
    * `scores` are parallel to it. */
  def decode(
      tokens: IndexedSeq[Token],
      tags: IndexedSeq[String],
      scores: IndexedSeq[Double]
  ): Seq[DecodedSpan] = {
    require(tokens.length == tags.length, "tokens/tags length mismatch")
    val out = Seq.newBuilder[DecodedSpan]
    var i = 0
    val n = tokens.length
    while (i < n) {
      val t = normalizeTag(tags(i))
      if (t.startsWith("B-")) {
        val label = t.substring(2)
        var j = i + 1
        while (j < n && normalizeTag(tags(j)) == "I-" + label) j += 1
        val confs = (i until j).map(scores)
        out += DecodedSpan(
          label, i, j - 1,
          tokens(i).start, tokens(j - 1).end,
          confs.sum / confs.length)
        i = j
      } else i += 1
    }
    out.result()
  }
}
