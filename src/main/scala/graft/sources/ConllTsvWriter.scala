package graft.sources

import graft.core.TsvToken

/** HIPE prediction-TSV formatter (SURVEY K2; reference writers
  * `convert_xmi2clef_format.py:784-787` and the prediction writer
  * `lib/bert_classification/utils.py:81-127`, which replaces the
  * NE-FINE-LIT column with the model's label and keeps everything else).
  *
  * QUOTE_NONE + tab separation, `# key = value` metadata rows, blank line
  * between documents, `EndOfSentence` flags preserved — golden-parity
  * format for scoring with the HIPE scorer.
  */
object ConllTsvWriter {

  /** Format one document: tokens in order, with `predLabels(i)` replacing
    * the fine-LIT column of token i (length must match). */
  def formatDoc(
      docId: String,
      language: String,
      tokens: Seq[TsvToken],
      predLabels: Seq[String]
  ): String = {
    require(tokens.length == predLabels.length,
      s"token/label length mismatch: ${tokens.length} vs ${predLabels.length}")
    val sb = new StringBuilder
    sb.append(s"# language = $language\n")
    sb.append(s"# document_id = $docId\n")
    tokens.zip(predLabels).foreach { case (t, lbl) =>
      // 13 columns (dataset.py:4-16): TOKEN, COARSE-LIT, COARSE-METO,
      // FINE-LIT(pred), FINE-METO, FINE-COMP, NESTED, NEL-LIT, NEL-METO,
      // RENDER, SEG, OCR-INFO, MISC
      sb.append(t.token).append('\t')
        .append(t.neCoarseLit).append('\t').append("O").append('\t')
        .append(lbl).append('\t')
        .append("O").append('\t').append("O").append('\t').append("O").append('\t')
        .append(t.nelLit).append('\t').append("_").append('\t').append("_").append('\t')
        .append(if (t.isEndOfSentence) "EndOfSentence" else "_").append('\t')
        .append("_").append('\t')
        .append(t.misc).append('\n')
      if (t.isEndOfSentence) () // segment structure carried by the flag
    }
    sb.append('\n')
    sb.toString
  }

  val Header: String = ConllTsvReader.Columns.mkString("\t") + "\n"
}
