package graft.sources

import java.io.ByteArrayInputStream

import scala.collection.mutable

import javax.xml.parsers.DocumentBuilderFactory

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.w3c.dom.Element

/** S8: UIMA CAS XMI reader — the annotation-tool export format
  * (INCEpTION/WebAnno), closing the last SURVEY §2 source row.
  *
  * Semantics mirror the reference converter
  * (`lib/inception_postprocessing/convert_xmi2clef_format.py:128-310`):
  *  - document text is the CAS `sofaString`;
  *  - a document-level `OCRNoise` flag with `not_usable=true` marks the
  *    document `too_noisy` (the converter discards it);
  *  - `ImpressoNewsAgencies` annotations carry (value, begin, end,
  *    noisy_ocr, transcript, wikidata_id); label mapping:
  *    `pers.ind.articleauthor` stays fine=value/coarse=pers, anything else
  *    becomes fine=`org.ent.pressagency.<value>`/coarse=org, compounds are
  *    values starting with `comp` (`convert_xmi2clef_format.py:229-247`);
  *  - noisy entities get a normalized Levenshtein distance vs their manual
  *    transcript after hyphen cleaning (`helpers.py:55-70`) — the LED
  *    metric the sliced HIPE evaluation buckets on;
  *  - surface = covered text with newlines stripped
  *    (`convert_xmi2clef_format.py:248`).
  *
  * The Spark shape: `binaryFile` scan → per-file DOM parse in
  * `mapPartitions` (annotation exports are small single-article files) →
  * typed Datasets. Parsing is namespace-prefix based (`cas:`/`type:`/
  * `custom:`), matching the WebAnno export layout.
  */
object XmiReader {

  final case class XmiDocument(
      docId: String,
      newspaper: String,
      date: String,
      text: String,
      tooNoisy: Boolean,
      nSegments: Int,
      nTokens: Int,
      nAutoSentences: Int
  )

  final case class XmiEntity(
      docId: String,
      xmiId: Long,
      entityFine: String,
      entityCoarse: String,
      compound: Boolean,
      lOffset: Int,
      rOffset: Int,
      surface: String,
      noisyOcr: Boolean,
      transcript: String,
      levenshteinNorm: Double,
      wikidataId: String
  )

  /** Normalized Levenshtein after hyphen cleaning (`helpers.py:55-70`;
    * `stringdist.levenshtein_norm` divides by the longer length). */
  private[sources] def levenshteinNormScala(a: String, b: String): Double = {
    def clean(s: String): String = s.replaceAll("[-¬]\\s*", "")
    val x = clean(a)
    val y = clean(b)
    val n = x.length
    val m = y.length
    if (math.max(n, m) == 0) return 0.0
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      cur(0) = i
      var k = 1
      while (k <= m) {
        val cost = if (x.charAt(i - 1) == y.charAt(k - 1)) 0 else 1
        cur(k) = math.min(math.min(cur(k - 1) + 1, prev(k) + 1), prev(k - 1) + cost)
        k += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m).toDouble / math.max(n, m)
  }

  final case class XmiToken(begin: Int, end: Int, surface: String)

  final case class XmiSegment(
      begin: Int,
      end: Int,
      iiif: String,
      tokens: IndexedSeq[XmiToken]
  )

  /** Complete parse result — everything the TSV converter
    * ([[XmiToConll]]) needs. */
  final case class XmiFull(
      doc: XmiDocument,
      entities: Seq[XmiEntity],
      segments: IndexedSeq[XmiSegment],
      autoSentenceEnds: Set[Int]
  )

  /** Parse one XMI file. `docId` is the filename stem
    * (`NP-YYYY-MM-DD-e-iNNNN`). */
  def parse(docId: String, bytes: Array[Byte]): (XmiDocument, Seq[XmiEntity]) = {
    val f = parseFull(docId, bytes)
    (f.doc, f.entities)
  }

  def parseFull(docId: String, bytes: Array[Byte]): XmiFull = {
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(false)
    // annotation exports are trusted local files, but keep the parser inert
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))

    def elems(tag: String): Seq[Element] = {
      val nl = doc.getElementsByTagName(tag)
      (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
    }
    def attr(e: Element, name: String): String =
      if (e.hasAttribute(name)) e.getAttribute(name) else null

    val text = elems("cas:Sofa").headOption
      .flatMap(e => Option(attr(e, "sofaString"))).getOrElse("")
    val tooNoisy = elems("custom:OCRNoise")
      .exists(e => attr(e, "not_usable") == "true")

    val parts = docId.split("-")
    val newspaper = parts.headOption.getOrElse(docId)
    val date = if (parts.length >= 4) parts.slice(1, 4).mkString("-") else ""

    // malformed annotations (reversed/negative/out-of-range spans) are
    // SKIPPED, not fatal — the converter wraps each entity in try/except
    // and logs (`convert_xmi2clef_format.py:228,294-296`); one bad
    // annotation must not kill the ingest job
    val entities = elems("custom:ImpressoNewsAgencies").flatMap { e =>
      val value = Option(attr(e, "value")).getOrElse("")
      val (fine, coarse) =
        if (value == "pers.ind.articleauthor") (value, "pers")
        else (s"org.ent.pressagency.$value", "org")
      // non-numeric begin/end/xmi:id skip the annotation (toIntOption →
      // -1), matching the converter's per-entity try/except — one
      // malformed attribute must not fail the whole file's ingest task,
      // the same policy the out-of-range guard below already applies.
      // ABSENT begin/end mean 0: XMI omits zero-valued int attributes.
      val begin =
        if (!e.hasAttribute("begin")) 0
        else attr(e, "begin").toIntOption.getOrElse(-1)
      val end =
        if (!e.hasAttribute("end")) 0
        else attr(e, "end").toIntOption.getOrElse(-1)
      if (begin < 0 || end < begin || end > text.length) None
      else Some {
      val surface = text.substring(begin, end).replace("\n", "")
      val noisy = attr(e, "noisy_ocr") == "true"
      val transcript = attr(e, "transcript")
      // helpers.py semantics: distance computed whenever a transcript is
      // present (noisy or not, the converter logs and computes); 0 otherwise
      val led =
        if (transcript != null && transcript.nonEmpty)
          levenshteinNormScala(surface, transcript)
        else 0.0
      XmiEntity(
        docId = docId,
        xmiId = Option(attr(e, "xmi:id")).flatMap(_.toLongOption).getOrElse(-1L),
        entityFine = fine,
        entityCoarse = coarse,
        compound = value.startsWith("comp"),
        lOffset = begin,
        rOffset = end,
        surface = surface,
        noisyOcr = noisy,
        transcript = if (transcript == null) "" else transcript,
        levenshteinNorm = led,
        wikidataId = Option(attr(e, "wikidata_id")).getOrElse("NIL")
      )
      }
    }

    // XMI serialization omits zero-valued int attributes (a doc-initial
    // begin="0" is simply absent) — absent means 0, present-but-garbled
    // means skip
    def intAt(e: Element, name: String): Option[Int] =
      if (!e.hasAttribute(name)) Some(0) else e.getAttribute(name).toIntOption

    val tokens = elems("type:Token").flatMap { e =>
      for {
        b <- intAt(e, "begin")
        en <- intAt(e, "end")
        if b >= 0 && en >= b && en <= text.length
      } yield XmiToken(b, en, text.substring(b, en))
    }.sortBy(_.begin)

    // sorted by offset like tokens/segments: cassis' select_covered
    // iterates annotations in offset order, not XMI element order, and the
    // converter takes the FIRST covered image — file order would diverge
    // when a segment covers several images serialized out of order
    val images = elems("custom:ImpressoImages").flatMap { e =>
      for {
        b <- intAt(e, "begin")
        en <- intAt(e, "end")
        link <- Option(attr(e, "link"))
      } yield (b, en, link)
    }.sortBy(i => (i._1, i._2))

    val segments = elems("type:Sentence").flatMap { e =>
      for {
        b <- intAt(e, "begin")
        en <- intAt(e, "end")
      } yield {
        // covered = within the segment's span (cassis select_covered);
        // empty covered text is skipped (convert_xmi2clef_format.py:181)
        val segToks = tokens
          .filter(t => t.begin >= b && t.end <= en && t.surface.nonEmpty)
          .toIndexedSeq
        // first image annotation within the segment that carries a link
        // (the converter's for/break; none → "_")
        val iiif = images.find(i => i._1 >= b && i._2 <= en)
          .map(_._3).getOrElse("_")
        XmiSegment(b, en, iiif, segToks)
      }
    }.sortBy(_.begin).toIndexedSeq

    val autoEnds = elems("custom:PySBDSegment")
      .flatMap(e => intAt(e, "end")).toSet

    val d = XmiDocument(
      docId = docId,
      newspaper = newspaper,
      date = date,
      text = text,
      tooNoisy = tooNoisy,
      nSegments = segments.size,
      nTokens = elems("type:Token").size,
      nAutoSentences = elems("custom:PySBDSegment").size)
    XmiFull(d, entities, segments, autoEnds)
  }

  private def parsedFiles(spark: SparkSession, glob: String) = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xmi")
      .load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (path, bytes) =>
          val name = path.substring(path.lastIndexOf('/') + 1)
          val docId = name.split("\\.").head
          parse(docId, bytes)
        }
      }
  }

  /** One row per XMI document; `too_noisy` documents are KEPT with the
    * flag set (the converter's discard is a downstream filter). */
  def readDocuments(spark: SparkSession, glob: String): Dataset[XmiDocument] = {
    import spark.implicits._
    parsedFiles(spark, glob).map(_._1)
  }

  /** One row per entity annotation, usable-document entities only by
    * default (matches the converter's `too_noisy` discard). */
  def readEntities(spark: SparkSession, glob: String,
      dropNoisyDocs: Boolean = true): Dataset[XmiEntity] = {
    import spark.implicits._
    parsedFiles(spark, glob)
      .filter(p => !dropNoisyDocs || !p._1.tooNoisy)
      .flatMap(_._2)
  }
}
