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
  }

  test("detectOne drops nothing valid and finds nothing in empty text") {
    val a = Article("JDG-1951-02-26-a-i0080", null, Array.empty,
      "DERNIERES NOUVELLES ", "fr", "ar")
    assert(NerStage.detectOne(a, scorer).isEmpty)
  }
}
