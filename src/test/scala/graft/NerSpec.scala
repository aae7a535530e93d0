package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Article, ArticleId, Gazetteer}
import graft.ner.{AliasTrieScorer, BioDecode, NerStage}
import graft.text.PunctTokenizer

class NerSpec extends AnyFunSuite {

  private val scorer = new AliasTrieScorer

  // --- gazetteer semantics (cli_tagger.py:42-74,191-209) ---

  test("qidOf links known agencies, NILs articleauthor/unk/unknown") {
    assert(Gazetteer.qidOf("org.ent.pressagency.Havas") == "Q2826560")
    assert(Gazetteer.qidOf("org.ent.pressagency.Reuters") == "Q130879")
    assert(Gazetteer.qidOf("org.ent.pressagency.Europapress") == "NIL")
    assert(Gazetteer.qidOf("pers.ind.articleauthor") == "NIL")
    assert(Gazetteer.qidOf("org.ent.pressagency.unk") == "NIL")
    assert(Gazetteer.qidOf("org.ent.pressagency.NotAnAgency") == "NIL")
  }

  test("ATB→ATS typo rewrite") {
    assert(Gazetteer.normalizeLabel("org.ent.pressagency.ATB-SDA") ==
      "org.ent.pressagency.ATS-SDA")
    assert(Gazetteer.normalizeLabel("org.ent.pressagency.Havas") ==
      "org.ent.pressagency.Havas")
  }

  // --- article id grammar ---

  test("article id parse/format roundtrip") {
    val id = ArticleId.format("GDL", 1930, 10, 11, "a", 11)
    assert(id == "GDL-1930-10-11-a-i0011")
    val p = ArticleId.parse(id).get
    assert(p.newspaper == "GDL" && p.year == 1930 && p.decade == 1930 &&
      p.date == "1930-10-11")
    assert(ArticleId.parse("not-an-id").isEmpty)
    assert(ArticleId.country("GDL") == "CH")
    assert(ArticleId.country("luxwort") == "LU")
  }

  // --- BIO decode (model_handler.py:31-72) ---

  test("BIO decode groups B-/I- runs, rewrites S-/E-") {
    val toks = PunctTokenizer.tokenize("selon United Press hier Havas demain")
    val tags = IndexedSeq("O", "S-x.y.UP-UPI", "E-x.y.UP-UPI", "O", "B-x.y.Havas", "O")
    val scores = IndexedSeq(0.9, 0.8, 0.6, 0.9, 0.7, 0.9)
    val spans = BioDecode.decode(toks, tags, scores)
    assert(spans.length == 2)
    val up = spans.head
    assert(up.label == "x.y.UP-UPI" && up.firstTok == 1 && up.lastTok == 2)
    assert(math.abs(up.confidence - 0.7) < 1e-12) // mean(0.8, 0.6)
    assert(spans(1).label == "x.y.Havas" && spans(1).firstTok == 4)
  }

  test("BIO decode: I- without preceding B- of same type is not a span start") {
    val toks = PunctTokenizer.tokenize("a b c")
    val tags = IndexedSeq("I-x.A", "B-x.A", "I-x.B")
    val spans = BioDecode.decode(toks, tags, IndexedSeq(1, 1, 1))
    // orphan I-x.A ignored; B-x.A starts a span; I-x.B does not continue it
    assert(spans.length == 1 && spans.head.firstTok == 1 && spans.head.lastTok == 1)
  }

  // --- alias-trie scorer ---

  test("trie matches canonical, OCR-variant, dotted and multi-token aliases") {
    def labelsOf(s: String): Seq[String] =
      scorer.score(PunctTokenizer.tokens(s)).map(_._1)
    assert(labelsOf("selon Reuters hier") ==
      Seq("O", "B-org.ent.pressagency.Reuters", "O"))
    assert(labelsOf("selon Havaas hier").count(_ != "O") == 1)
    // "A.F.P." tokenizes to 6 tokens, all inside the span
    val afp = labelsOf("selon A.F.P. hier")
    assert(afp(1) == "B-org.ent.pressagency.AFP")
    assert(afp.slice(2, 7).forall(_ == "I-org.ent.pressagency.AFP"))
    // multi-token alias
    val up = labelsOf("laut United Press gestern")
    assert(up == Seq("O", "B-org.ent.pressagency.UP-UPI",
      "I-org.ent.pressagency.UP-UPI", "O"))
    // no match on filler
    assert(labelsOf("le gouvernement annonce").forall(_ == "O"))
  }

  test("trie is greedy-longest: 'Agence Havas' wins over bare 'Havas'") {
    val labels = scorer.score(PunctTokenizer.tokens("selon Agence Havas hier")).map(_._1)
    assert(labels == Seq("O", "B-org.ent.pressagency.Havas",
      "I-org.ent.pressagency.Havas", "O"))
  }

  // --- detectOne end to end (pure, no Spark) ---

  test("detectOne: offsets slice back to the surface, ids follow the grammar") {
    val text = "Le ministre annonce selon Reuters une loi. La suite vient ici selon Havaas demain."
    val a = Article("GDL-1930-10-11-a-i0011", null, Array.empty, text, "fr", "ar")
    val ms = NerStage.detectOne(a, scorer)
    assert(ms.length == 2)
    ms.foreach { m =>
      assert(text.substring(m.lOffset, m.rOffset) == m.surface)
      assert(m.id == s"${a.url}:${m.lOffset}:${m.rOffset}:newsag:bert_fr")
    }
    assert(ms.map(_.name).sorted == Seq("Havas", "Reuters"))
    assert(ms.find(_.name == "Havas").get.surface == "Havaas")
    assert(ms.find(_.name == "Havas").get.qid == "Q2826560")
    assert(ms.find(_.name == "Havas").get.sentenceIdx == 1)
    // generation-1 (sentence-offset) form: offsets slice the SENTENCE, and
    // the 8-field id follows cli_tagger.py:220-222
    val sents = graft.text.Segmenter.segmentWithOffsets(text)
    ms.foreach { m =>
      val (sentStart, sent) = sents(m.sentenceIdx)
      assert(sent.substring(m.lSentenceOffset, m.rSentenceOffset) == m.surface)
      assert(m.lOffset == sentStart + m.lSentenceOffset)
      assert(m.idGen1 == s"${a.url}:${m.sentenceIdx}:${m.lSentenceOffset}:" +
        s"${m.rSentenceOffset}:${m.lOffset}:${m.rOffset}:newsag:bert_fr")
    }
  }

  test("detectOne drops nothing valid and finds nothing in empty text") {
    val a = Article("JDG-1951-02-26-a-i0080", null, Array.empty,
      "DERNIERES NOUVELLES ", "fr", "ar")
    assert(NerStage.detectOne(a, scorer).isEmpty)
  }

  test("range fast path ≡ string path: mention-identical on adversarial synthetic text") {
    val rng = new scala.util.Random(2023)
    val aliasPool = graft.core.Gazetteer.SurfaceAliases.keys.toSeq.sorted
    val fillers = Seq("le", "ministre", "annonce", "selon", "la", "dépêche",
      "hier", "M.", "Dupont", "a", "dit", "que", "(", ")", ",", "1936",
      "Agence", "Havas", "Reu", "ters", "A.F.P", "…", "«citation»")
    (1 to 200).foreach { caseIdx =>
      val nWords = 1 + rng.nextInt(60)
      val words = (0 until nWords).map { _ =>
        if (rng.nextInt(4) == 0) aliasPool(rng.nextInt(aliasPool.length))
        else fillers(rng.nextInt(fillers.length))
      }
      val sep = () => rng.nextInt(6) match {
        case 0 => ". "
        case 1 => "  "
        case 2 => " "
        case _ => " "
      }
      val text = words.map(w => w + sep()).mkString
      val a = Article(s"GDL-1930-10-11-a-i$caseIdx", null, Array.empty, text, "fr", "ar")
      val fast = NerStage.detectOne(a, scorer)
      val slow = NerStage.detectOneStrings(a, scorer)
      assert(fast == slow, s"case $caseIdx diverged on text: $text")
    }
  }

  // --- batched tensor path: WordPiece encode → logits → softmax →
  //     realign → decode (LinearTokenScorer, M6/M7/M10) ---

  private val linear = new graft.ner.LinearTokenScorer

  test("linear scorer: multi-piece word scores through encode+realign, real softmax conf") {
    // "Reuters" is deliberately split (Reu, ##ters) by the toy vocab, so a
    // correct label on the word proves first-piece realignment works
    val out = linear.score(PunctTokenizer.tokens("selon Reuters hier"))
    assert(out.map(_._1) ==
      Seq("O", "B-org.ent.pressagency.Reuters", "O"))
    val conf = out(1)._2
    // genuine softmax probability — not one of the trie's constants
    assert(conf > 0.5 && conf < 1.0)
    assert(conf != graft.ner.AliasTrieScorer.CanonicalConfidence &&
      conf != graft.ner.AliasTrieScorer.VariantConfidence)
    // O tokens carry real probabilities too
    assert(out(0)._2 > 0.0 && out(0)._2 < 1.0)
  }

  test("linear scorer: bigram context makes continuation words I-, not B-") {
    // "Havas" alone is B-; preceded by "Agence" (the alias "Agence Havas")
    // the bigram weight flips it to I- — a contextual decision the tensor
    // path must express
    val alone = linear.score(PunctTokenizer.tokens("selon Havas hier"))
    assert(alone.map(_._1) == Seq("O", "B-org.ent.pressagency.Havas", "O"))
    val ctx = linear.score(PunctTokenizer.tokens("selon Agence Havas hier"))
    assert(ctx.map(_._1) == Seq("O",
      "B-org.ent.pressagency.Havas", "I-org.ent.pressagency.Havas", "O"))
    // decoded span covers both words
    val toks = PunctTokenizer.tokenize("selon Agence Havas hier")
    val spans = BioDecode.decode(toks, ctx.map(_._1), ctx.map(_._2))
    assert(spans.length == 1)
    assert(spans.head.label == "org.ent.pressagency.Havas")
  }

  test("linear scorer: batch path equals per-sentence path; fixed-shape truncation → O") {
    val sents = Seq(
      "selon Reuters hier",
      "Agence Havas annonce",
      "rien ici").map(PunctTokenizer.tokens)
    assert(linear.scoreBatch(sents) == sents.map(linear.score))
    // a sentence longer than MaxLen pieces: overflow words realign to O
    val long = IndexedSeq.fill(graft.ner.LinearTokenScorer.MaxLen + 10)("mot") ++
      IndexedSeq("Reuters")
    val out = linear.score(long)
    assert(out.length == long.length)
    assert(out.last._1 == "O") // truncated away, not hallucinated
  }

  test("detectOne with the linear scorer matches the trie on unambiguous text") {
    val text = "Le ministre annonce selon Reuters une loi. La suite selon Agence Havas demain."
    val a = Article("GDL-1930-10-11-a-i0011", null, Array.empty, text, "fr", "ar")
    val viaLinear = NerStage.detectOne(a, linear)
    val viaTrie = NerStage.detectOne(a, scorer)
    assert(viaLinear.map(m => (m.surface, m.entity, m.lOffset, m.rOffset)) ==
      viaTrie.map(m => (m.surface, m.entity, m.lOffset, m.rOffset)))
    // confidences flow from the softmax, not from constants
    assert(viaLinear.map(_.confidence).forall(c => c > 0.0 && c < 1.0))
    assert(viaLinear.map(_.confidence) != viaTrie.map(_.confidence))
  }
}
