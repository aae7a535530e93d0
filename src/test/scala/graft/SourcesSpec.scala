package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ConllTsvReader
import graft.link.Linker
import org.apache.spark.sql.functions._

class SourcesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("CoNLL/HIPE TSV parser: documents, segments, tokens, spans") {
    val content =
      """# language = fr
        |# newspaper = GDL
        |# document_id = GDL-1936-05-02-a-i0001
        |TOKEN	NE-COARSE-LIT	X	NE-FINE-LIT	X	X	X	NEL-LIT	X	X	SEG	X	MISC
        |Selon	O	O	O	O	O	O	_	_	_	_	_	_
        |Havas	B-org	O	B-org.ent.pressagency.Havas	O	O	O	Q2826560	_	_	_	_	_
        |hier	O	O	O	O	O	O	_	_	_	EndOfSentence	_	_
        |Fin	O	O	O	O	O	O	_	_	_	_	_	_
        |
        |# document_id = GDL-1936-05-03-a-i0002
        |Reuters	B-org	O	B-org.ent.pressagency.Reuters	O	O	O	Q130879	_	_	_	_	_
        |et	O	O	O	O	O	O	_	_	_	_	_	_
        |Havas	B-org	O	B-org.ent.pressagency.Havas	O	O	O	Q2826560	_	_	EndOfSentence	_	_
        |""".stripMargin
    val toks = ConllTsvReader.parse(content)
    // header line "TOKEN ..." is data-shaped; the reference's reader skips
    // it because real files never include it — ours parses rows only, so
    // craft asserts around real rows:
    val doc1 = toks.filter(_.docId == "GDL-1936-05-02-a-i0001")
    val doc2 = toks.filter(_.docId == "GDL-1936-05-03-a-i0002")
    assert(doc2.length == 3)
    assert(doc1.count(_.segId == 0) >= 3)
    assert(doc1.exists(t => t.token == "Fin" && t.segId == 1))
    val spans = ConllTsvReader.goldSpans(doc2)
    assert(spans.map(_.eType) ==
      Seq("org.ent.pressagency.Reuters", "org.ent.pressagency.Havas"))
  }

  test("CoNLL reader over the reference's committed gold TSV (dev, fr+de)") {
    val fr = "/root/reference/data/annotated_data/fr/newsagency-data-dev-fr.tsv"
    val de = "/root/reference/data/annotated_data/de/newsagency-data-dev-de.tsv"
    assume(new java.io.File(fr).exists() && new java.io.File(de).exists())
    val ds = ConllTsvReader.read(spark, fr, de)
    val n = ds.count()
    assert(n > 10000, s"expected >10k tokens, got $n")
    val docs = ds.select("docId").distinct().count()
    assert(docs > 50, s"expected >50 docs, got $docs")
    import spark.implicits._
    val mentions = ds.groupByKey(_.docId)
      .flatMapGroups((_, it) => ConllTsvReader.goldSpans(it.toSeq.sortBy(_.tokIdx)))
    val m = mentions.count()
    info(s"dev gold: $n tokens, $docs docs, $m fine-LIT mention spans")
    assert(m > 50)
  }

  test("alias normalization explodes mixed collections") {
    import spark.implicits._
    val df = Seq("Reuter", "afpreuters", "Havasagentur", "Unknown")
      .toDF("raw")
    val out = Linker.normalizeAliases(df, "raw")
      .select("raw", "agency").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(
      ("Reuter", "Reuters"),
      ("afpreuters", "AFP"), ("afpreuters", "Reuters"),
      ("Havasagentur", "Havas"),
      ("Unknown", "Unknown")))
  }

  test("relink rewrites qid from the fine label (postprocess parity)") {
    import spark.implicits._
    val df = Seq(
      ("org.ent.pressagency.Havas", "WRONG"),
      ("org.ent.pressagency.Europapress", "WRONG"),
      ("pers.ind.articleauthor", "WRONG")).toDF("entity", "qid")
    val out = Linker.relink(df).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("org.ent.pressagency.Havas") == "Q2826560")
    assert(out("org.ent.pressagency.Europapress") == "NIL")
    assert(out("pers.ind.articleauthor") == "NIL")
  }

  test("surface occurrence expansion finds every literal occurrence") {
    assert(Linker.occurrences("abcabcab", "ab") == Seq((0, 2), (3, 5), (6, 8)))
    assert(Linker.occurrences("aaa", "aa") == Seq((0, 2), (1, 3)))
    assert(Linker.occurrences("abc", "") == Seq.empty)
  }
}
