package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.TsvToken

/** CoNLL/HIPE TSV reader (SURVEY S5; reference `_read_conll`,
  * `lib/bert_classification/dataset.py:19-118`).
  *
  * The format is stateful (documents delimited by `# document_id = ...`
  * comment rows, segments by blank lines / `EndOfSentence` flags), so a
  * line-parallel `spark.read.text` would split documents across partitions.
  * Files are small annotation artifacts (≤ thousands of docs), so each file
  * is read whole via the `binaryFile` source and parsed with one stateful
  * pass per file inside `flatMap` — parallel across files, sequential
  * within, exactly the granularity the format allows.
  */
object ConllTsvReader {

  /** 13 columns, `dataset.py:4-16`. */
  val Columns: Seq[String] = Seq(
    "TOKEN", "NE-COARSE-LIT", "NE-COARSE-METO", "NE-FINE-LIT",
    "NE-FINE-METO", "NE-FINE-COMP", "NE-NESTED", "NEL-LIT", "NEL-METO",
    "RENDER", "SEG", "OCR-INFO", "MISC")

  def read(spark: SparkSession, paths: String*): Dataset[TsvToken] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .load(paths: _*)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        parse(new String(bytes, "UTF-8"))
      }
  }

  /** Pure parser — unit-testable without Spark. */
  def parse(content: String): Seq[TsvToken] = {
    val out = Seq.newBuilder[TsvToken]
    var docId: String = ""
    var segId: Long = 0L
    var tokIdx: Int = 0
    var lastWasBoundary = true
    // scorer semantics (utils.py:152-158): the date STICKS until the next
    // `# date` row (it is not reset per document); a date row without a
    // parseable YYYY-MM-DD falls back to 2022-01-01
    var date: String = "2022-01-01"
    val dateRe = "\\d{4}-\\d{2}-\\d{2}".r
    content.linesIterator.foreach { line =>
      if (line.startsWith("#")) {
        // `# key = value` metadata rows (convert_xmi2clef_format.py:417-442);
        // hipe2022-era files namespace the key (`# hipe2022:document_id = …`)
        val kv = line.drop(1).split("=", 2)
        val key = kv(0).trim
        if (kv.length == 2 &&
          (key == "document_id" || key.endsWith(":document_id"))) {
          docId = kv(1).trim
          segId = 0L
          tokIdx = 0
          lastWasBoundary = true
        } else if (key == "date" || key.endsWith(":date")) {
          // regex over whatever follows (the reference searches the whole
          // comment line, utils.py:152-158); a '# date' row without '='
          // or without a parseable date falls back like the reference
          date = dateRe.findFirstIn(if (kv.length == 2) kv(1) else "")
            .getOrElse("2022-01-01")
        }
      } else if (line.trim.isEmpty) {
        if (!lastWasBoundary) { segId += 1; lastWasBoundary = true }
      } else if (line.startsWith("TOKEN\tNE-COARSE-LIT")) {
        () // canonical column-header row (full prefix: a document may
      //    legitimately contain the bare token "TOKEN")
      } else {
        val cols = line.split("\t", -1)
        def at(i: Int): String = if (i < cols.length) cols(i) else ""
        // 13-col newsagency files carry the flag in SEG (col 10); 10-col
        // hipe2022 files carry it in MISC (last col) — accept either
        val eos = cols.exists(_.contains("EndOfSentence"))
        out += TsvToken(
          docId = docId,
          segId = segId,
          tokIdx = tokIdx,
          token = at(0),
          neCoarseLit = at(1),
          neFineLit = at(3),
          // empty link cells (truncated/malformed rows) default to "_":
          // a bare "" would slip past NelEval's NonTags filter and enter
          // the tag universe as a scoreable link
          nelLit = if (at(7).isEmpty) "_" else at(7),
          misc = if (cols.length >= 13) at(12) else cols.last,
          isEndOfSentence = eos,
          nelMeto = if (at(8).isEmpty) "_" else at(8),
          // OCR-INFO exists only in the 13-col newsagency format; the
          // 10-col hipe2022 layout has none → LED stays None and the
          // noise filter keeps the token (utils.py KeyError branch)
          ocrInfo = if (cols.length >= 13) at(11) else "_",
          date = date)
        tokIdx += 1
        lastWasBoundary = false
        if (eos) { segId += 1; lastWasBoundary = true }
      }
    }
    out.result()
  }

  /** Collect BIO(ES)-labeled spans from the token stream — gold spans for
    * the scorer (analog of `collect_named_entities`,
    * `HIPE-scorer/hipe_evaluation/utils.py:272-331`). `column` selects the
    * annotation layer (fine-LIT by default; coarse for HIPE parity). */
  def goldSpansBy(tokens: Seq[TsvToken],
      column: TsvToken => String): Seq[graft.core.Span] = {
    // mirrors collect_named_entities (utils.py:272-331) exactly: a span
    // closes on O; ANY non-O tag opens a span when none is open (a stray
    // I-X after O starts an X entity); a type change or a B- prefix while
    // one is open closes it and opens the next
    def norm(l: String): String =
      if (l.startsWith("S-")) "B-" + l.substring(2)
      else if (l.startsWith("E-")) "I-" + l.substring(2)
      else l
    def typeOf(l: String): String =
      if (l.length > 2 && (l.startsWith("B-") || l.startsWith("I-"))) l.substring(2)
      else l
    val out = Seq.newBuilder[graft.core.Span]
    var openType: String = null
    var openFrom = -1
    def close(until: Int): Unit = {
      if (openType != null) {
        out += graft.core.Span(openType,
          tokens(openFrom).tokIdx, tokens(until).tokIdx,
          tokens.slice(openFrom, until + 1).map(_.token).mkString(" "))
        openType = null
      }
    }
    var i = 0
    val n = tokens.length
    while (i < n) {
      val lbl = norm(column(tokens(i)))
      if (lbl == "O" || lbl.isEmpty || lbl == "_") close(i - 1)
      else {
        val t = typeOf(lbl)
        if (openType == null) { openType = t; openFrom = i }
        else if (t != openType || lbl.startsWith("B-")) {
          close(i - 1); openType = t; openFrom = i
        }
      }
      i += 1
    }
    close(n - 1)
    out.result()
  }

  def goldSpans(tokens: Seq[TsvToken]): Seq[graft.core.Span] =
    goldSpansBy(tokens, _.neFineLit)
}
