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

  // --- S8: UIMA CAS XMI reader (convert_xmi2clef_format.py:128-310) ---

  private val xmiDir =
    "/root/reference/data/annotation/minireference_for_IA_agreement/IA_fr/xmi"

  test("XMI: real committed export parses — sofa text, segment counts") {
    assume(new java.io.File(xmiDir).isDirectory)
    val f = s"$xmiDir/EXP-1991-07-02-a-i0038.xmi"
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
    val (doc, ents) = graft.sources.XmiReader.parse("EXP-1991-07-02-a-i0038", bytes)
    assert(doc.text.startsWith("Les médecins sont scandalisés"))
    assert(doc.nSegments == 65)
    assert(doc.newspaper == "EXP" && doc.date == "1991-07-02")
    assert(!doc.tooNoisy)
    assert(ents.isEmpty) // pre-annotation export carries no agency layer
  }

  test("XMI: entity mapping, offsets, LED and the too_noisy flag") {
    // synthetic CAS export in the WebAnno shape the converter documents
    val text = "Selon Reuter- hier. Havas aussi."
    val xmi =
      s"""<?xml version='1.0' encoding='UTF-8'?>
         |<xmi:XMI xmlns:xmi="http://www.omg.org/XMI" xmlns:cas="http:///uima/cas.ecore" xmlns:type="http:///de/tudarmstadt/ukp/dkpro/core/api/segmentation/type.ecore" xmlns:custom="http:///webanno/custom.ecore" xmi:version="2.0">
         |  <cas:NULL xmi:id="0"/>
         |  <type:Sentence xmi:id="2" begin="0" end="19" sofa="1"/>
         |  <type:Sentence xmi:id="3" begin="20" end="32" sofa="1"/>
         |  <custom:PySBDSegment xmi:id="4" begin="0" end="19" sofa="1"/>
         |  <custom:ImpressoNewsAgencies xmi:id="10" sofa="1" begin="6" end="13" value="Reuters" noisy_ocr="true" transcript="Reuters" wikidata_id="Q130879"/>
         |  <custom:ImpressoNewsAgencies xmi:id="11" sofa="1" begin="20" end="25" value="Havas"/>
         |  <custom:ImpressoNewsAgencies xmi:id="12" sofa="1" begin="0" end="5" value="pers.ind.articleauthor"/>
         |  <custom:ImpressoNewsAgencies xmi:id="13" sofa="1" begin="26" end="31" value="comp.AFP.Reuters"/>
         |  <custom:ImpressoNewsAgencies xmi:id="14" sofa="1" begin="10" end="5" value="Reuters"/>
         |  <cas:Sofa xmi:id="1" sofaNum="1" sofaID="_InitialView" mimeType="text/plain" sofaString="$text"/>
         |</xmi:XMI>""".stripMargin
    val (doc, ents) = graft.sources.XmiReader.parse(
      "GDL-1930-10-11-a-i0011", xmi.getBytes("UTF-8"))
    assert(doc.text == text && doc.nSegments == 2 && doc.nAutoSentences == 1)
    val byId = ents.map(e => e.xmiId -> e).toMap
    // the reversed-span annotation (id 14) is skipped, not fatal
    assert(ents.length == 4 && !byId.contains(14L))
    val reuter = byId(10L)
    assert(reuter.entityFine == "org.ent.pressagency.Reuters" &&
      reuter.entityCoarse == "org")
    assert(reuter.surface == "Reuter-" && reuter.noisyOcr)
    // hyphen-clean then normalized levenshtein: "Reuter" vs "Reuters" = 1/7
    assert(math.abs(reuter.levenshteinNorm - 1.0 / 7.0) < 1e-12)
    assert(reuter.wikidataId == "Q130879")
    assert(byId(11L).levenshteinNorm == 0.0 && byId(11L).wikidataId == "NIL")
    assert(byId(12L).entityFine == "pers.ind.articleauthor" &&
      byId(12L).entityCoarse == "pers")
    assert(byId(13L).compound)

    // document-level OCRNoise flag
    val noisy = xmi.replace("<cas:NULL xmi:id=\"0\"/>",
      "<cas:NULL xmi:id=\"0\"/><custom:OCRNoise xmi:id=\"9\" sofa=\"1\" begin=\"0\" end=\"0\" not_usable=\"true\"/>")
    val (noisyDoc, _) = graft.sources.XmiReader.parse(
      "GDL-1930-10-11-a-i0011", noisy.getBytes("UTF-8"))
    assert(noisyDoc.tooNoisy)
  }

  test("XMI: Spark binaryFile reader over the committed export directory") {
    assume(new java.io.File(xmiDir).isDirectory)
    val docs = graft.sources.XmiReader.readDocuments(spark, xmiDir)
    val n = docs.count()
    assert(n == 48, s"expected 48 xmi files, got $n")
    assert(docs.filter(_.text.nonEmpty).count() == n)
    assert(graft.sources.XmiReader.readEntities(spark, xmiDir).count() == 0)
  }
}
