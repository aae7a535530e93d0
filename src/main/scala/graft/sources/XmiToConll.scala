package graft.sources

import scala.collection.mutable

import graft.core.Gazetteer
import graft.sources.XmiReader.{XmiEntity, XmiFull, XmiSegment, XmiToken}

/** XMI → HIPE-TSV document converter — the Scala counterpart of the
  * reference's `convert_xmi2clef_format.py` (convert_data:313-416,
  * get_document_metadata:417-442, lookup_entity:445-497, lookup_nel:499-539,
  * set_special_flags:541-608, assemble_entity_label:611-636), golden-
  * compared byte-for-byte against a committed `data/annotated_data` document
  * produced from its committed XMI source (SourcesSpec).
  *
  * Faithfully replicated quirks:
  *  - the `literal` entity flag is hardcoded false at read time
  *    (read_xmi:248), so every non-compound match lands in the LIT columns
  *    via the `if not literals` swap and the METO columns are always `O`/`_`;
  *  - the NESTED column is computed BEFORE that swap from the second
  *    non-compound match;
  *  - B vs I: a token gets `B` when the entity STARTS inside it
  *    (`tok.start <= ent.start < tok.end`) and `I` when it continues one
  *    (`ent.start <= tok.start < ent.end`) — matches are ordered by
  *    (entity start, longest span first);
  *  - NEL is a direct `WIKIDATA_IDs[fine.split('.')[-1]]` lookup, `_` on
  *    miss (so `articleauthor` is `_`, never NIL);
  *  - flags sort alphabetically per column with any `LED…` flag forced
  *    last; empty columns render `_`;
  *  - `NoSpaceAfter` also fires at end-of-text (Python `text[end:end+1]`
  *    yields `""` ≠ `" "`);
  *  - `LED` is printed `%.2f` with Python's round-half-even.
  *
  * The one deliberate divergence: `# news-agency-as-source` joins a SORTED
  * set — the reference joins a Python `set` whose iteration order is
  * process-specific (PYTHONHASHSEED), i.e. its own output is not
  * reproducible run-to-run for multi-agency documents.
  */
object XmiToConll {

  private val ColLabels = ConllTsvReader.Columns

  private def label(m: Option[(String, XmiEntity)], fine: Boolean): String =
    m.map { case (iob, e) =>
      s"$iob-${if (fine) e.entityFine else e.entityCoarse}"
    }.getOrElse("O")

  private def led2(x: Double): String =
    new java.math.BigDecimal(x)
      .setScale(2, java.math.RoundingMode.HALF_EVEN).toPlainString

  private def formatFlags(flags: Seq[String]): String =
    if (flags.isEmpty) "_"
    else flags.sortBy(f => if (f.contains("LED")) "Z" else f).mkString("|")

  /** Convert one parsed document to TSV lines (no trailing newline). */
  def convertLines(full: XmiFull, lang: String): Seq[String] = {
    val text = full.doc.text
    val ents = full.entities.sortBy(e => (e.lOffset, -e.rOffset))
    val body = mutable.Buffer.empty[String]
    val agencies = mutable.SortedSet.empty[String]

    full.segments.foreach { seg =>
      body += s"# segment_iiif_link = ${seg.iiif}"
      seg.tokens.zipWithIndex.foreach { case (tok, iTok) =>
        val matches = ents.flatMap { e =>
          if (tok.begin <= e.lOffset && e.lOffset < tok.end) Some(("B", e))
          else if (e.lOffset <= tok.begin && tok.begin < e.rOffset)
            Some(("I", e))
          else None
        }
        val compounds = matches.filter(_._2.compound)
        val nonLit = matches.filterNot(_._2.compound)
        // NESTED from the pre-swap non-literal list (convert_data:338)
        val fine2 =
          if (nonLit.length > 1) label(Some(nonLit(1)), fine = true) else "O"
        // literal is always false at read time → everything is LIT
        val lits = nonLit
        val coarseLit = label(lits.headOption, fine = false)
        val fineLit = label(lits.headOption, fine = true)
        val comp = label(compounds.headOption, fine = true)
        val mainLit = lits.headOption.map(_._2)

        val nelLit = mainLit.map { e =>
          val agency = e.entityFine.split('.').last
          Gazetteer.WikidataIds.getOrElse(agency, "_").split('/').last
        }.getOrElse("_")

        // RENDER: space-after / end-of-line
        val render = mutable.Buffer.empty[String]
        val after =
          if (tok.end < text.length) text.substring(tok.end, tok.end + 1)
          else ""
        if (after != " ") render += "NoSpaceAfter"
        if (iTok == seg.tokens.length - 1) render += "EndOfLine"

        // SEG: partial entity coverage + auto sentence boundary
        val segf = mutable.Buffer.empty[String]
        mainLit.foreach { e =>
          if (e.rOffset < tok.end || e.lOffset > tok.begin) {
            val s = e.lOffset - tok.begin
            val en = math.min(tok.surface.length, e.rOffset - tok.begin)
            segf += s"Partial-$s:$en"
          }
        }
        if (full.autoSentenceEnds.contains(tok.end)) segf += "EndOfSentence"

        // OCR-INFO: LED + transcript, only when an entity covers the token
        val ocr = mutable.Buffer.empty[String]
        mainLit.foreach { e =>
          ocr += s"LED${led2(e.levenshteinNorm)}"
          if (e.transcript.nonEmpty) ocr += s"Transcript:${e.transcript}"
        }

        body += Seq(
          tok.surface, coarseLit, "O", fineLit, "O", comp, fine2,
          nelLit, "_",
          formatFlags(render.toSeq), formatFlags(segf.toSeq),
          formatFlags(ocr.toSeq), "_"
        ).mkString("\t")

        if (coarseLit.contains("org"))
          agencies += (if (nelLit != "_") nelLit else "unk")
      }
    }

    val meta = Seq(
      "# global.columns = " + ColLabels.mkString(" "),
      s"# language = $lang",
      s"# newspaper = ${full.doc.newspaper}",
      s"# date = ${full.doc.date}",
      s"# document_id = ${full.doc.docId}",
      "# news-agency-as-source = " +
        (if (agencies.isEmpty) "_" else agencies.mkString(", "))
    )
    meta ++ body.toSeq
  }

  /** Full TSV text with `\n` line endings (the committed corpora's form). */
  def convert(full: XmiFull, lang: String): String =
    convertLines(full, lang).mkString("", "\n", "\n")
}
