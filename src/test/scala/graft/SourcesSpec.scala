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

  // --- XMI → CoNLL conversion parity (convert_xmi2clef_format.py) -------

  /** A committed annotated_data document block: from its `# language` line
    * to the blank line before the next document (the concatenated corpus
    * drops the per-document `# global.columns` header). */
  private def committedBlock(tsvFile: String, docId: String): String = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(tsvFile)), "UTF-8")
    txt.split("(?m)(?=^# language = )")
      .find(_.contains(s"document_id = $docId"))
      .map(_.replaceAll("\\n+$", "\n"))
      .getOrElse(fail(s"$docId not in $tsvFile"))
  }

  /** Rebuild a fully-annotated WebAnno XMI from a curated TSV document
    * block. The repo's 96 committed XMIs are all PRE-annotation exports
    * (Sentence + ImpressoImages layers only — no Token, no entity layer),
    * so the annotated XMI sources of `data/annotated_data` were never
    * committed and a direct (xmi → tsv) golden pair cannot exist. This
    * reconstruction inverts the converter's own documented semantics
    * (token offsets from NoSpaceAfter, segments from the iiif comments,
    * PySBD ends from EndOfSentence, entities from the fine-LIT BIO runs),
    * producing an XMI that the converter must map back to the EXACT
    * committed bytes — a round-trip that exercises reader + converter on
    * real curated data. */
  private def reconstructXmi(block: String): (String, Array[Byte]) = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace("\"", "&quot;").replace("'", "&apos;")
    val lines = block.stripLineEnd.split("\n").toSeq
    val docId = lines.find(_.startsWith("# document_id = ")).get
      .substring("# document_id = ".length)
    var pos = 0
    var xmiId = 100
    val sb = new StringBuilder
    val text = new StringBuilder
    var segStart = -1
    var segIiif = "_"
    var lastTokEnd = -1
    var entStart = -1
    var entValue: String = null
    var entTranscript = ""
    def ann(s: String): Unit = { sb.append("  ").append(s).append('\n') }
    def closeEntity(): Unit = if (entStart >= 0) {
      val noisy = if (entTranscript.nonEmpty)
        s""" noisy_ocr="true" transcript="${esc(entTranscript)}"""" else ""
      ann(s"""<custom:ImpressoNewsAgencies xmi:id="${xmiId}" sofa="1" begin="$entStart" end="$lastTokEnd" value="${esc(entValue)}"$noisy/>""")
      xmiId += 1; entStart = -1; entValue = null; entTranscript = ""
    }
    def closeSegment(): Unit = if (segStart >= 0) {
      ann(s"""<type:Sentence xmi:id="$xmiId" begin="$segStart" end="$lastTokEnd" sofa="1"/>""")
      xmiId += 1
      if (segIiif != "_") {
        ann(s"""<custom:ImpressoImages xmi:id="$xmiId" sofa="1" begin="$segStart" end="$segStart" link="${esc(segIiif)}"/>""")
        xmiId += 1
      }
      segStart = -1
    }
    lines.foreach { line =>
      if (line.startsWith("# segment_iiif_link = ")) {
        closeEntity(); closeSegment()
        segIiif = line.substring("# segment_iiif_link = ".length)
      } else if (!line.startsWith("#") && line.nonEmpty) {
        val c = line.split("\t", -1)
        val (tok, fineLit, render, seg, ocr) = (c(0), c(3), c(9), c(10), c(11))
        val b = pos
        text.append(tok)
        pos += tok.length
        if (!render.split('|').contains("NoSpaceAfter")) {
          text.append(' '); pos += 1
        }
        if (segStart < 0) segStart = b
        // entity runs on the fine-LIT BIO column
        if (fineLit.startsWith("B-")) {
          closeEntity()
          entStart = b
          val fine = fineLit.substring(2)
          entValue =
            if (fine == "pers.ind.articleauthor") fine
            else fine.stripPrefix("org.ent.pressagency.")
          ocr.split('|').find(_.startsWith("Transcript:"))
            .foreach(t => entTranscript = t.substring("Transcript:".length))
        } else if (!fineLit.startsWith("I-")) closeEntity()
        lastTokEnd = b + tok.length
        ann(s"""<type:Token xmi:id="$xmiId" begin="$b" end="$lastTokEnd" sofa="1"/>""")
        xmiId += 1
        if (seg.split('|').contains("EndOfSentence")) {
          ann(s"""<custom:PySBDSegment xmi:id="$xmiId" begin="0" end="$lastTokEnd" sofa="1"/>""")
          xmiId += 1
        }
      }
    }
    closeEntity(); closeSegment()
    val xml = "<?xml version='1.0' encoding='UTF-8'?>\n" +
      """<xmi:XMI xmlns:xmi="http://www.omg.org/XMI" xmlns:cas="http:///uima/cas.ecore" xmlns:type="http:///type.ecore" xmlns:custom="http:///webanno/custom.ecore" xmi:version="2.0">""" +
      "\n" + sb.toString() +
      s"""  <cas:Sofa xmi:id="1" sofaNum="1" sofaID="_InitialView" mimeType="text/plain" sofaString="${esc(text.toString)}"/>""" +
      "\n</xmi:XMI>"
    (docId, xml.getBytes("UTF-8"))
  }

  private def roundTrip(tsvFile: String, docId: String, lang: String): Unit = {
    assume(new java.io.File(tsvFile).isFile)
    val golden = committedBlock(tsvFile, docId)
    val (id, xmiBytes) = reconstructXmi(golden)
    assert(id == docId)
    val full = graft.sources.XmiReader.parseFull(docId, xmiBytes)
    val mine = graft.sources.XmiToConll.convert(full, lang)
      .linesIterator.filterNot(_.startsWith("# global.columns"))
      .mkString("", "\n", "\n")
    if (mine != golden) {
      val m = mine.linesIterator.toSeq
      val g = golden.linesIterator.toSeq
      val i = m.zip(g).indexWhere { case (a, b) => a != b }
      info(s"first diff at line $i (mine ${m.length} vs golden ${g.length} lines)")
      if (i >= 0 && i < math.min(m.length, g.length)) {
        info(s"mine:   ${m(i)}")
        info(s"golden: ${g(i)}")
      }
    }
    assert(mine == golden, s"$docId round-trip not byte-identical")
  }

  test("XMI→CoNLL round-trip: byte-identical to the committed curated TSV (DTT doc)") {
    roundTrip("/root/reference/data/annotated_data/de/newsagency-data-dev-de.tsv",
      "DTT-1954-10-16-a-i0191", "de")
  }

  test("XMI→CoNLL round-trip: byte-identical to the committed curated TSV (luxwort doc)") {
    roundTrip("/root/reference/data/annotated_data/de/newsagency-data-dev-de.tsv",
      "luxwort-1934-12-10-a-i0005", "de")
  }

  test("XMI→CoNLL: partials, transcripts, nesting, compounds, NEL misses") {
    // "Selon Reuters-Havas hier AFPx Schmidt."
    //  0     6      13     20   25   30
    val text = "Selon Reuters-Havas hier AFPx Schmidt."
    val xmi =
      s"""<?xml version='1.0' encoding='UTF-8'?>
         |<xmi:XMI xmlns:xmi="http://www.omg.org/XMI" xmlns:cas="http:///uima/cas.ecore" xmlns:type="http:///t.ecore" xmlns:custom="http:///webanno/custom.ecore" xmi:version="2.0">
         |  <type:Sentence xmi:id="2" begin="0" end="39" sofa="1"/>
         |  <type:Token xmi:id="20" end="5" sofa="1"/>
         |  <type:Token xmi:id="21" begin="6" end="19" sofa="1"/>
         |  <type:Token xmi:id="22" begin="20" end="24" sofa="1"/>
         |  <type:Token xmi:id="23" begin="25" end="29" sofa="1"/>
         |  <type:Token xmi:id="24" begin="30" end="37" sofa="1"/>
         |  <type:Token xmi:id="25" begin="37" end="38" sofa="1"/>
         |  <custom:PySBDSegment xmi:id="4" begin="0" end="38" sofa="1"/>
         |  <custom:ImpressoNewsAgencies xmi:id="10" sofa="1" begin="6" end="13" value="Reuters" noisy_ocr="true" transcript="Reuter"/>
         |  <custom:ImpressoNewsAgencies xmi:id="11" sofa="1" begin="14" end="19" value="Havas"/>
         |  <custom:ImpressoNewsAgencies xmi:id="12" sofa="1" begin="6" end="19" value="comp.Reuters.Havas"/>
         |  <custom:ImpressoNewsAgencies xmi:id="13" sofa="1" begin="25" end="29" value="AFPX"/>
         |  <custom:ImpressoNewsAgencies xmi:id="14" sofa="1" begin="30" end="37" value="pers.ind.articleauthor"/>
         |  <cas:Sofa xmi:id="1" sofaNum="1" sofaID="_InitialView" mimeType="text/plain" sofaString="$text"/>
         |</xmi:XMI>""".stripMargin
    val full = graft.sources.XmiReader.parseFull("GDL-1930-01-01-a-i0001",
      xmi.getBytes("UTF-8"))
    val lines = graft.sources.XmiToConll.convertLines(full, "fr")
    val rows = lines.filterNot(_.startsWith("#")).map(_.split("\t", -1))
    val byTok = rows.map(r => r(0) -> r).toMap

    // token "Reuters-Havas" covers TWO entities starting inside it:
    // Reuters (6-13) wins (earliest start, longest), Havas (14-19) is the
    // NESTED second match; the compound lands in NE-FINE-COMP; boundary
    // mismatch (ent end 13 < tok end 19) → Partial-0:7; transcript+LED;
    // Reuters NEL hit
    val rh = byTok("Reuters-Havas")
    assert(rh(1) == "B-org" && rh(3) == "B-org.ent.pressagency.Reuters")
    assert(rh(5) == "B-org.ent.pressagency.comp.Reuters.Havas")
    assert(rh(6) == "B-org.ent.pressagency.Havas") // nested = 2nd match
    assert(rh(7) == "Q130879" && rh(8) == "_")
    // flags: seg sorts EndOfSentence? no (not last-end) — Partial only;
    // ocr sorts Transcript before LED (LED forced last)
    assert(rh(10) == "Partial-0:7", rh(10))
    // LED of "Reuters" vs "Reuter" = 1/7 = 0.142857 → %.2f = 0.14
    assert(rh(11) == "Transcript:Reuter|LED0.14", rh(11))

    // unknown agency value AFPX: labeled but NEL misses → "_", and the
    // source list gets "unk"
    val afpx = byTok("AFPx")
    assert(afpx(3) == "B-org.ent.pressagency.AFPX" && afpx(7) == "_")
    // articleauthor: pers coarse, never linked
    val author = byTok("Schmidt")
    assert(author(1) == "B-pers" && author(3) == "B-pers.ind.articleauthor")
    assert(author(7) == "_")
    // document-final "." : NoSpaceAfter (end of text) + EndOfLine, sorted
    val dot = byTok(".")
    assert(dot(9) == "EndOfLine|NoSpaceAfter", dot(9))
    // PySBD end at 38 → EndOfSentence on the final token
    assert(dot(10) == "EndOfSentence")
    // token with absent begin attribute (= 0, XMI omits zero ints)
    assert(byTok("Selon")(9) == "_")
    // multi-agency source line: known QID + "unk", sorted, comma-joined
    assert(lines.exists(_ == "# news-agency-as-source = Q130879, unk"),
      lines.filter(_.startsWith("# news")).mkString)
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
