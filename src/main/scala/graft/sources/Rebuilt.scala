package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** One positioned token of a rebuilt content item page: image coordinates
  * `c = [x, y, w, h]`, character offset `s` into the fulltext, length `l`,
  * optional hyphenation halves `hy1`/`hy2` (`ContentItem.py`
  * `index_coordinates`, lib/inception_preprocessing/ContentItem.py:11-31). */
final case class PageToken(
    c: Seq[Int],
    s: Int,
    l: Int,
    hy1: Option[Boolean],
    hy2: Option[Boolean])

/** One facsimile page: canonical page id + its positioned tokens
  * (`ppreb` entries, ContentItem.py:143). */
final case class RebuiltPage(id: String, t: Seq[PageToken])

/** The FULL rebuilt content item (`ContentItemCase.FULL`,
  * ContentItem.py:119-148): canonical id, language, type, title,
  * fulltext, and the break-offset arrays — `lb` line breaks, `pb`
  * paragraph breaks, `rb` region breaks (char offsets into `ft`, strictly
  * increasing, each level a subset of the finer one) — plus the pages
  * with per-token image coordinates. Field names follow the reference's
  * JSON keys so `from_json` maps the on-wire form directly. */
final case class RebuiltItem(
    id: String,
    lg: Option[String],
    tp: String,
    t: Option[String],
    ft: String,
    lb: Seq[Int],
    pb: Seq[Int],
    rb: Seq[Int],
    ppreb: Seq[RebuiltPage])

/** Build, serialize, and read FULL rebuilt content items.
  *
  * The coordinate contract (ContentItem.py:178-190 `get_coordinates`):
  * offsets refer to the RAW `ft`. Length-changing normalization
  * (`TextNorm.removeSpaceBeforePunctuation`) must therefore run AFTER any
  * coordinate consumption — or the offsets must be remapped; the
  * length-preserving fold (`TextNorm.foldAccents` on precomposed Latin
  * text) keeps them valid (property-tested in RebuiltSpec). */
object Rebuilt {

  /** Deterministic FULL layout for a text: single-space tokens become
    * positioned page tokens on a fixed-metric grid (8px/char, 14px line
    * pitch), lines wrap greedily at `lineWidth` chars, every 3rd line
    * ends a paragraph, every 2nd paragraph a region, every 5 lines a
    * page. Pure function of (id, text) — partition-invariant. */
  def fromText(id: String, lg: String, tp: String, text: String,
      lineWidth: Int = 60): RebuiltItem = {
    // token offsets under single-space semantics
    val toks = Seq.newBuilder[(Int, Int)] // (start, len)
    var i = 0
    var start = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        if (i > start) toks += ((start, i - start))
        start = i + 1
      }
      i += 1
    }
    val tokens = toks.result()

    // greedy line wrap: a line ends when the NEXT token would cross
    // lineWidth chars from the line start
    val lineEnds = Seq.newBuilder[Int]
    val lineOf = new Array[Int](tokens.length)
    var lineIdx = 0
    var lineStart = 0
    tokens.zipWithIndex.foreach { case ((s, l), ti) =>
      if (s + l - lineStart > lineWidth && s > lineStart) {
        lineEnds += s - 1 // the space before this token
        lineIdx += 1
        lineStart = s
      }
      lineOf(ti) = lineIdx
    }
    if (text.nonEmpty) lineEnds += text.length
    val lb = lineEnds.result()
    val pb = lb.zipWithIndex.collect {
      case (e, i) if i % 3 == 2 || i == lb.length - 1 => e
    }.distinct
    val rb = pb.zipWithIndex.collect {
      case (e, i) if i % 2 == 1 || i == pb.length - 1 => e
    }.distinct

    val lineStartOffset = scala.collection.mutable.Map(0 -> 0)
    lb.zipWithIndex.foreach { case (e, i) => lineStartOffset(i + 1) = e + 1 }
    // hyphenation halves, the OCR line-wrap case: a '-'-terminated token
    // at the END of a line is the first half of a split word (hy1); the
    // FIRST token of the next line is its continuation (hy2)
    val hy1s = tokens.indices.map { ti =>
      val (s, l) = tokens(ti)
      l > 1 && text.charAt(s + l - 1) == '-' &&
        ti + 1 < tokens.length && lineOf(ti + 1) != lineOf(ti)
    }
    val hy2s = tokens.indices.map(ti => ti > 0 && hy1s(ti - 1))
    val pages = tokens.zipWithIndex
      .groupBy { case (_, ti) => lineOf(ti) / 5 }
      .toSeq.sortBy(_._1)
      .map { case (pageIdx, toksOnPage) =>
        RebuiltPage(
          f"$id-p${pageIdx + 1}%04d",
          toksOnPage.map { case ((s, l), ti) =>
            val line = lineOf(ti)
            val x = 40 + 8 * (s - lineStartOffset(line))
            val y = 60 + 14 * (line % 5)
            PageToken(Seq(x, y, 8 * l, 12), s, l,
              if (hy1s(ti)) Some(true) else None,
              if (hy2s(ti)) Some(true) else None)
          })
      }
    RebuiltItem(id, Option(lg).filter(_.nonEmpty), tp,
      Some(s"title $id"), text, lb, pb, rb, pages)
  }

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Serialize to the reference's FULL JSON form (`to_json`,
    * ContentItem.py:151-168). */
  def toJson(item: RebuiltItem): String = {
    val sb = new StringBuilder(item.ft.length * 2 + 256)
    sb.append("{\"id\":\"").append(esc(item.id)).append('"')
    item.lg.foreach(l => sb.append(",\"lg\":\"").append(esc(l)).append('"'))
    sb.append(",\"tp\":\"").append(esc(item.tp)).append('"')
    item.t.foreach(t => sb.append(",\"t\":\"").append(esc(t)).append('"'))
    sb.append(",\"ft\":\"").append(esc(item.ft)).append('"')
    def ints(key: String, xs: Seq[Int]): Unit =
      sb.append(",\"").append(key).append("\":[")
        .append(xs.mkString(",")).append(']')
    ints("lb", item.lb); ints("pb", item.pb); ints("rb", item.rb)
    sb.append(",\"ppreb\":[")
    item.ppreb.zipWithIndex.foreach { case (p, pi) =>
      if (pi > 0) sb.append(',')
      sb.append("{\"id\":\"").append(esc(p.id)).append("\",\"t\":[")
      p.t.zipWithIndex.foreach { case (tok, ti) =>
        if (ti > 0) sb.append(',')
        sb.append("{\"c\":[").append(tok.c.mkString(","))
          .append("],\"s\":").append(tok.s)
          .append(",\"l\":").append(tok.l)
        tok.hy1.foreach(v => sb.append(",\"hy1\":").append(v))
        tok.hy2.foreach(v => sb.append(",\"hy2\":").append(v))
        sb.append('}')
      }
      sb.append("]}")
    }
    sb.append("]}")
    sb.toString
  }

  def toJsonBytes(item: RebuiltItem): Array[Byte] =
    toJson(item).getBytes("UTF-8")

  val schema: org.apache.spark.sql.types.StructType =
    Encoders.product[RebuiltItem].schema

  /** Parse a binary/string JSON column of FULL rebuilt items into the
    * typed Dataset — the `html` payload of the `input_hint` table carries
    * exactly this form for OCR-born corpora. Malformed payloads yield
    * null ids (PERMISSIVE), filterable upstream. */
  def parse(df: DataFrame, jsonCol: String): Dataset[RebuiltItem] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(from_json(col(jsonCol).cast("string"), schema).as("r"))
      .select(col("r.*"))
      .as[RebuiltItem]
  }

  /** Catalyst form of `get_coordinates` (ContentItem.py:178-190): the
    * positioned tokens of `pages` fully inside `[l, r)` — span→image
    * coordinate lookup (IIIF region links) as a pure column expression,
    * usable per-row without exploding the page structure. */
  def coordsForSpan(pages: Column, l: Column, r: Column): Column =
    filter(
      flatten(transform(pages, p => p.getField("t"))),
      tok => tok.getField("s") >= l &&
        (tok.getField("s") + tok.getField("l")) <= r)

  /** Driver-side `get_coordinates` for one item. */
  def coordsForSpan(item: RebuiltItem, start: Int, end: Int): Seq[PageToken] =
    item.ppreb.flatMap(_.t).filter(t => t.s >= start && t.s + t.l <= end)
}
