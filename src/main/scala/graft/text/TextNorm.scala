package graft.text

import java.text.Normalizer

/** Text-normalization invariants of the engine.
  *
  * The ONLY transform ever applied to stored full text is the
  * length-preserving control-char rule (reference:
  * `lib/inception_postprocessing/retokenization.py:135-141`) — everything
  * else operates on read-only views so extracted `text` stays byte-identical
  * to the source per url (SURVEY §1.2 / §7.4 risk 1).
  */
object TextNorm {

  /** Replace Unicode control characters with a single space,
    * length-preservingly (`retokenization.py:135-141`). */
  def controlToSpace(s: String): String = {
    var i = 0
    var changed = false
    while (i < s.length && !changed) {
      if (Character.isISOControl(s.charAt(i))) changed = true
      i += 1
    }
    if (!changed) s
    else {
      val arr = s.toCharArray
      var j = 0
      while (j < arr.length) {
        if (Character.isISOControl(arr(j))) arr(j) = ' '
        j += 1
      }
      new String(arr)
    }
  }

  private val Punct = """!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~"""

  // table lookup, not a Set probe — isPunct runs once per character of
  // every document in the NER hot path
  private val PunctTable: Array[Boolean] = {
    val t = new Array[Boolean](128)
    Punct.foreach(c => t(c) = true)
    t
  }

  def isPunct(c: Char): Boolean = c < 128 && PunctTable(c)

  /** `re.sub(r"\s([<punct>](?:\s|$))", r"\1", text)` — drop a single space
    * before a punctuation char that is itself followed by space/end
    * (`cli_tagger.py:99-104`). */
  def removeSpaceBeforePunctuation(text: String): String = {
    val sb = new StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      val isSpaceBeforePunct =
        c.isWhitespace && i + 1 < text.length && isPunct(text.charAt(i + 1)) &&
          (i + 2 >= text.length || text.charAt(i + 2).isWhitespace)
      if (!isSpaceBeforePunct) sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Accent folding for contains-matching (`unidecode` analog used at
    * `preprocessing.ipynb cells 9-10`): NFD-decompose, strip combining
    * marks. Pure-JVM, deterministic. */
  def foldAccents(s: String): String =
    Normalizer
      .normalize(s, Normalizer.Form.NFD)
      .replaceAll("\\p{M}+", "")
}
