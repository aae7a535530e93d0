package graft.core

/** Canonical article-id grammar codec.
  *
  * Reference grammar `NP-YYYY-MM-DD-e-iNNNN`
  * (`lib/inception_preprocessing/impresso_commons_selection.py:23-53`), and
  * the analytics derivations of `import_data.ipynb cell 7`:
  * `newspaper = id.split("-")[0]`, `date = y-m-d`, `year`,
  * `decade = year // 10 * 10`, `language` = trailing tag of the mention id,
  * `country = CH if newspaper.isupper else LU`.
  */
object ArticleId {

  final case class Parsed(
      newspaper: String,
      date: String,
      year: Int,
      decade: Int,
      edition: String,
      item: String
  )

  private val Re = """^([^-]+)-(\d{4})-(\d{2})-(\d{2})-([a-z])-i(\d+)$""".r

  def parse(id: String): Option[Parsed] = id match {
    case Re(np, y, m, d, e, i) =>
      val year = y.toInt
      Some(Parsed(np, s"$y-$m-$d", year, year / 10 * 10, e, i))
    case _ => None
  }

  def format(np: String, year: Int, month: Int, day: Int, edition: String,
      item: Int): String = {
    // hot path in the corpus generator — avoid java.util.Formatter
    val sb = new java.lang.StringBuilder(np.length + 20)
    sb.append(np).append('-').append(year).append('-')
    if (month < 10) sb.append('0')
    sb.append(month).append('-')
    if (day < 10) sb.append('0')
    sb.append(day).append('-').append(edition).append("-i")
    if (item < 1000) sb.append('0')
    if (item < 100) sb.append('0')
    if (item < 10) sb.append('0')
    sb.append(item)
    sb.toString
  }

  /** `country = CH if uppercase newspaper else LU`
    * (`import_data.ipynb cell 7`). */
  def country(newspaper: String): String =
    if (newspaper.nonEmpty && newspaper == newspaper.toUpperCase) "CH" else "LU"

  /** Mention-id grammar, article-offset form
    * (`postprocess.py:54-66`): `<url>:<l>:<r>:newsag:bert_<lang>`. */
  def mentionId(url: String, l: Int, r: Int, lang: String): String =
    s"$url:$l:$r:newsag:bert_$lang"

  /** Generation-1 mention-id grammar, sentence-offset form
    * (`cli_tagger.py:220-222`):
    * `<url>:<sentIdx>:<lSent>:<rSent>:<lArt>:<rArt>:newsag:bert_<lang>`. */
  def mentionIdGen1(url: String, sentIdx: Int, lSent: Int, rSent: Int,
      lArt: Int, rArt: Int, lang: String): String =
    s"$url:$sentIdx:$lSent:$rSent:$lArt:$rArt:newsag:bert_$lang"
}
