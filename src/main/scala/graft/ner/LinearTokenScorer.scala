package graft.ner

import graft.core.Gazetteer
import graft.text.PunctTokenizer

/** A tiny hand-weighted linear token-classification model that exercises
  * the FULL batched tensor path of the production contract (SURVEY M6, M7,
  * M10): WordPiece encode → fixed-shape `[batch][maxLen]` id tensor →
  * per-piece logits → softmax confidences → first-piece-per-word realign →
  * word-level BIO labels.
  *
  * This is the in-sandbox stand-in for an ONNX-exported BERT encoder
  * (reference export: `lib/bert_classification/export_models.py:78-106`;
  * batched inference: `cli_tagger_no_torch_serve.py:289-348`): swapping
  * the `logits` method for an ONNX session call changes nothing upstream —
  * the batch shape, vocabulary plumbing, realignment and confidence flow
  * are identical. Unlike [[AliasTrieScorer]], confidences here are genuine
  * softmax probabilities that vary with the weight mass per label.
  *
  * The weights are derived deterministically from the gazetteer:
  *  - the first wordpiece of a word that starts an alias carries weight on
  *    that agency's `B-` label;
  *  - a (previous word's last piece → current word's first piece) bigram
  *    inside an alias carries larger weight on the `I-` label, so
  *    continuation words prefer `I-` over `B-` exactly when preceded by
  *    the alias prefix (a genuinely contextual decision);
  *  - every known piece carries a small `O` baseline.
  * Aliases of agencies outside the 43-label space are skipped — like the
  * reference model, the scorer cannot predict labels it was not trained on.
  */
final class LinearTokenScorer extends TokenScorer {

  import LinearTokenScorer._

  @transient private lazy val model: Model = buildModel()

  override def score(tokens: IndexedSeq[String]): IndexedSeq[(String, Double)] =
    scoreBatch(Seq(tokens)).head

  override def scoreBatch(
      batch: Seq[IndexedSeq[String]]): Seq[IndexedSeq[(String, Double)]] = {
    val m = model
    val bSize = batch.length
    val encoded = batch.map(words => m.wp.encode(words, MaxLen))

    // the fixed-shape id tensor — the analog of the model server's padded
    // input_ids batch (seq len 128, padding="max_length")
    val ids = Array.ofDim[Int](bSize, MaxLen)
    var b = 0
    while (b < bSize) {
      val pieces = encoded(b)
      var t = 0
      while (t < pieces.length) { ids(b)(t) = pieces(t).id; t += 1 }
      b += 1
    }

    val nLabels = Gazetteer.LabelSpace.length
    batch.indices.map { i =>
      val pieces = encoded(i)
      val row = ids(i)
      val pieceLabels = new Array[(String, Double)](pieces.length)
      var t = 0
      var prevId = PadId
      while (t < pieces.length) {
        val id = row(t)
        val logits = new Array[Double](nLabels)
        val uni = m.uni(id)
        var l = 0
        while (l < nLabels) { logits(l) = uni(l); l += 1 }
        m.bi.get((prevId.toLong << 32) | (id & 0xffffffffL)).foreach { bw =>
          var k = 0
          while (k < nLabels) { logits(k) += bw(k); k += 1 }
        }
        // softmax with max-shift for stability; confidence = max prob
        var mx = logits(0); l = 1
        while (l < nLabels) { if (logits(l) > mx) mx = logits(l); l += 1 }
        var z = 0.0
        l = 0
        while (l < nLabels) { z += math.exp(logits(l) - mx); l += 1 }
        var best = 0; var bestV = logits(0)
        l = 1
        while (l < nLabels) {
          if (logits(l) > bestV) { best = l; bestV = logits(l) }
          l += 1
        }
        val conf = math.exp(bestV - mx) / z
        pieceLabels(t) = (Gazetteer.LabelSpace(best), conf)
        prevId = id
        t += 1
      }
      WordPiece.realign(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(pieceLabels),
        pieces.map(_.wordIdx), batch(i).length)
    }
  }
}

object LinearTokenScorer {

  /** Fixed sequence length, as the reference's chosen inference models
    * (`max_sequence_length_128`, BASELINE.md). */
  val MaxLen = 128
  val PadId = 0
  val UnkId = 1

  private[ner] final case class Model(
      wp: WordPiece,
      uni: Array[Array[Double]],
      bi: Map[Long, Array[Double]]
  )

  private val OWeight = 2.0
  private val BWeight = 6.0
  // must dominate any accumulated B mass on a shared piece ("Havas" collects
  // B weight from several aliases), so alias-internal bigrams always flip a
  // continuation word to I-
  private val IWeight = 20.0

  /** Wordpiece split policy for the toy vocabulary: words of ≥ 7 chars are
    * forced into (4-char prefix, ##suffix) so the multi-piece encode +
    * first-piece realign path is genuinely exercised; shorter words are
    * whole pieces. (4 chars keeps "Agence"/"Agenzia" first pieces distinct.) */
  private def piecesOfWord(w: String): Seq[String] =
    if (w.length >= 7) Seq(w.substring(0, 4), "##" + w.substring(4))
    else Seq(w)

  private[ner] def buildModel(): Model = {
    val aliasWords: Seq[(Seq[String], String)] = Gazetteer.SurfaceAliases.toSeq
      .sortBy(_._1)
      .map { case (surface, agency) =>
        (PunctTokenizer.tokens(surface).toSeq, agency)
      }

    // vocabulary: PAD, UNK, every piece of every alias word, plus
    // single-char fallback pieces (real WordPiece vocabs contain all
    // characters, so greedy longest-match can always decompose a word —
    // without them, greedy eats "Hava" out of "Havaas" and dead-ends on
    // the "##as" suffix, collapsing the word to [UNK])
    val distinctWords = aliasWords.flatMap(_._1).distinct
    val vocabPieces = distinctWords.flatMap(piecesOfWord)
    val charPieces = distinctWords.flatten.distinct
      .flatMap(c => Seq(c.toString, "##" + c))
    val vocab: Map[String, Int] =
      (Seq("[PAD]", "[UNK]") ++ (vocabPieces ++ charPieces).distinct)
        .zipWithIndex.toMap
    val wp = new WordPiece(vocab, unkToken = "[UNK]")

    val nLabels = Gazetteer.LabelSpace.length
    val uni = Array.fill(vocab.size)(new Array[Double](nLabels))
    // every known piece gets the O baseline; PAD/UNK are O-only
    uni.foreach(w => w(Gazetteer.LabelToId("O")) = OWeight)

    val bi = scala.collection.mutable.HashMap.empty[Long, Array[Double]]
    def biKey(prev: Int, cur: Int): Long = (prev.toLong << 32) | (cur & 0xffffffffL)

    aliasWords.foreach { case (words, agency) =>
      val bLabel = s"B-org.ent.pressagency.$agency"
      val iLabel = s"I-org.ent.pressagency.$agency"
      // skip agencies outside the trained label space (like the reference)
      if (Gazetteer.LabelToId.contains(bLabel)) {
        val wordPieces = words.map(w => wp.tokenizeWord(w, 0))
        val firstIds = wordPieces.map(_.head.id)
        val lastIds = wordPieces.map(_.last.id)
        uni(firstIds.head)(Gazetteer.LabelToId(bLabel)) += BWeight
        var k = 1
        while (k < words.length) {
          val key = biKey(lastIds(k - 1), firstIds(k))
          val w = bi.getOrElseUpdate(key, new Array[Double](nLabels))
          w(Gazetteer.LabelToId(iLabel)) += IWeight
          k += 1
        }
      }
    }
    Model(wp, uni, bi.toMap)
  }
}
