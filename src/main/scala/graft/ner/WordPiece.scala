package graft.ner

/** Deterministic WordPiece tokenizer + subword→word realignment — the
  * JVM side of the ONNX bundle contract (SURVEY M6/M7).
  *
  * Reference behavior: HuggingFace tokenizer with `padding="max_length"`,
  * `truncation=True` (`cli_tagger_no_torch_serve.py:289-297`), and
  * first-wordpiece-label-per-word realignment via `word_ids()`
  * (`realign`, `cli_tagger_no_torch_serve.py:208-226`; overflow → `O`).
  *
  * Algorithm (public WordPiece semantics): greedy longest-match-first over
  * a vocabulary; non-initial pieces carry the `##` prefix; words with no
  * match become `[UNK]`. The vocabulary ships with the exported model; CI
  * uses toy vocabularies.
  */
final class WordPiece(
    vocab: Map[String, Int],
    unkToken: String = "[UNK]",
    maxInputCharsPerWord: Int = 100
) extends Serializable {

  /** One encoded wordpiece: its token string, vocab id, and the index of
    * the source word (`word_ids()` analog). */
  final case class Piece(token: String, id: Int, wordIdx: Int)

  def tokenizeWord(word: String, wordIdx: Int): Seq[Piece] = {
    if (word.length > maxInputCharsPerWord)
      return Seq(Piece(unkToken, vocab.getOrElse(unkToken, -1), wordIdx))
    val out = Seq.newBuilder[Piece]
    var start = 0
    var bad = false
    while (start < word.length && !bad) {
      var end = word.length
      var cur: String = null
      while (end > start && cur == null) {
        val sub = (if (start > 0) "##" else "") + word.substring(start, end)
        if (vocab.contains(sub)) cur = sub else end -= 1
      }
      if (cur == null) bad = true
      else {
        out += Piece(cur, vocab(cur), wordIdx)
        start = end
      }
    }
    if (bad) Seq(Piece(unkToken, vocab.getOrElse(unkToken, -1), wordIdx))
    else out.result()
  }

  /** Encode a pre-tokenized sentence with truncation to `maxLen` pieces
    * (special tokens excluded — the model wrapper adds [CLS]/[SEP]). */
  def encode(words: Seq[String], maxLen: Int = 512): IndexedSeq[Piece] =
    words.zipWithIndex
      .flatMap { case (w, i) => tokenizeWord(w, i) }
      .take(maxLen)
      .toIndexedSeq
}

object WordPiece {

  /** M7: first-wordpiece label per word; words whose pieces were truncated
    * away get `O` (`cli_tagger_no_torch_serve.py:208-226`). */
  def realign(
      pieceLabels: IndexedSeq[(String, Double)],
      pieceWordIds: IndexedSeq[Int],
      nWords: Int
  ): IndexedSeq[(String, Double)] = {
    require(pieceLabels.length == pieceWordIds.length)
    val out = Array.fill[(String, Double)](nWords)(("O", 0.0))
    val seen = new Array[Boolean](nWords)
    var i = 0
    while (i < pieceLabels.length) {
      val w = pieceWordIds(i)
      if (w >= 0 && w < nWords && !seen(w)) {
        out(w) = pieceLabels(i)
        seen(w) = true
      }
      i += 1
    }
    out.toIndexedSeq
  }
}
