package graft.ner

import graft.core.Gazetteer
import graft.text.PunctTokenizer

/** The model-inference contract of the NER stage.
  *
  * One scorer instance lives per executor (the reference keeps a
  * process-global model singleton, `cli_tagger_no_torch_serve.py:85-155`);
  * [[NerStage]] calls `scoreBatch` with fixed-size sentence batches, the
  * analog of the reference's batched TorchServe POST
  * (`cli_tagger.py:144-152`).
  *
  * Implementations must be deterministic: same token sequence → same
  * (BIO label, confidence) sequence.
  */
trait TokenScorer extends Serializable {

  /** Per-token (BIO label, confidence) for one tokenized sentence. */
  def score(tokens: IndexedSeq[String]): IndexedSeq[(String, Double)]

  /** Batched entry point (override for real model runtimes where batching
    * amortizes per-call cost). */
  def scoreBatch(batch: Seq[IndexedSeq[String]]): Seq[IndexedSeq[(String, Double)]] =
    batch.map(score)
}

/** Deterministic alias-trie scorer — the sandbox/CI stand-in for the
  * ONNX-exported BERT encoder (SURVEY §7.1 item 4). Mirrors the reference's
  * own shipped dictionary baseline (`data/baseline-pred/`, imported at
  * `model_evaluations.ipynb cell 8`).
  *
  * A token-level trie over [[Gazetteer.SurfaceAliases]] (each alias
  * tokenized with the reference's punctuation tokenizer) is matched
  * greedily longest-first at each position; matched runs get
  * `B-org.ent.pressagency.<Agency>` / `I-...` labels.
  */
final class AliasTrieScorer extends TokenScorer {

  import AliasTrieScorer._

  @transient private lazy val trie: TrieNode = buildTrie()

  override def score(tokens: IndexedSeq[String]): IndexedSeq[(String, Double)] = {
    val n = tokens.length
    // one shared tuple for the (overwhelmingly common) O case — a fresh
    // tuple per token is measurable garbage at corpus scale
    val out = Array.fill[(String, Double)](n)(AliasTrieScorer.Outside)
    var i = 0
    while (i < n) {
      var node = trie
      var j = i
      var bestEnd = -1
      var bestAgency: String = null
      var bestConf = 0.0
      var continue = true
      while (continue && j < n) {
        node.children.get(tokens(j)) match {
          case Some(child) =>
            if (child.agency != null) {
              bestEnd = j
              bestAgency = child.agency
              bestConf = child.confidence
            }
            node = child
            j += 1
          case None => continue = false
        }
      }
      if (bestEnd >= 0) {
        val label = s"org.ent.pressagency.$bestAgency"
        out(i) = (s"B-$label", bestConf)
        var k = i + 1
        while (k <= bestEnd) { out(k) = (s"I-$label", bestConf); k += 1 }
        i = bestEnd + 1
      } else i += 1
    }
    out.toIndexedSeq
  }
}

object AliasTrieScorer {

  /** Confidence assigned to `O` tokens and to matches. Canonical surfaces
    * score higher than OCR variants (the golden fixture records 0.975 for
    * the noisy `Havaas`, `tests/na_tagger_out.jsonl:1`). */
  val OutsideConfidence = 0.999
  val CanonicalConfidence = 0.99
  val VariantConfidence = 0.975
  private[ner] val Outside: (String, Double) = ("O", OutsideConfidence)

  final class TrieNode extends Serializable {
    val children = scala.collection.mutable.HashMap.empty[String, TrieNode]
    var agency: String = _
    var confidence: Double = 0.0
  }

  private[ner] def buildTrie(): TrieNode = {
    val root = new TrieNode
    Gazetteer.SurfaceAliases.foreach { case (surface, agency) =>
      val toks = PunctTokenizer.tokens(surface)
      var node = root
      toks.foreach { t =>
        node = node.children.getOrElseUpdate(t, new TrieNode)
      }
      node.agency = agency
      node.confidence =
        if (surface == agency) CanonicalConfidence else VariantConfidence
    }
    root
  }
}

/** Placeholder for the production path: a batched ONNX-Runtime session per
  * executor scoring wordpiece tensors (exported as in the reference's
  * `export_models.py:78-106`, served in-process instead of TorchServe —
  * SURVEY M1-M3). The ONNX runtime is not bundled in this build; the class
  * documents the contract and fails loudly if constructed without it.
  * The batched tensor wiring itself (encode → fixed-shape batch → logits →
  * softmax → realign → decode) is exercised end-to-end by
  * [[LinearTokenScorer]], whose `logits` computation is the single line an
  * ONNX session call would replace.
  */
final class OnnxTokenScorer(modelPath: String) extends TokenScorer {
  override def score(tokens: IndexedSeq[String]): IndexedSeq[(String, Double)] =
    throw new UnsupportedOperationException(
      s"ONNX Runtime is not available in this build (model=$modelPath). " +
        "Use AliasTrieScorer, or add onnxruntime to the executor classpath.")
}
