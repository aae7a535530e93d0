package graft.synth

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.{Article, ArticleId, Gazetteer, GoldMention}

/** Deterministic seeded generator of the `input_hint` web-page table and its
  * gold mention table — both derived from the same `(seed, rowId)` function,
  * so text and gold offsets agree by construction (SURVEY §7.1 `synth`,
  * §7.4 risk 1).
  *
  * Mirrors the reference's golden fixture profile
  * (`tests/na_tagger_in.jsonl` → `na_tagger_out.jsonl`, FIXTURES.md §1):
  *  - OCR-noisy positives (`Havaas` → Havas Q2826560);
  *  - articles with text but no mention;
  *  - `tp:"ad"` rows (some with planted agency surfaces) that the gate must
  *    filter — gold excludes them;
  *  - non-fr/de rows the language gate must skip;
  *  - empty/short-text rows;
  *  - skewed agency frequency (Reuters/ATS-heavy,
  *    `quality_assessment-2024.ipynb cell 44`) — the skew profile that the
  *    downstream salted aggregations must absorb.
  *
  * Generation is per-row pure (`rowSeed = mix(seed, i)`), so the dataset is
  * identical for any partitioning — the property a 1000-executor run needs.
  */
object Synth {

  // ---- distributions ------------------------------------------------

  /** Skewed agency draw: Reuters 30%, ATS-SDA 25%, Havas 15%, AFP 10%,
    * remainder uniform over the other label agencies. */
  private val SkewTable: IndexedSeq[String] = {
    val rest = Gazetteer.LabelAgencies.filterNot(
      Set("Reuters", "ATS-SDA", "Havas", "AFP"))
    (Seq.fill(30)("Reuters") ++ Seq.fill(25)("ATS-SDA") ++
      Seq.fill(15)("Havas") ++ Seq.fill(10)("AFP") ++
      rest.take(20)).toIndexedSeq
  }

  /** Known OCR variants per agency — the trie knows these (recall hits). */
  private val KnownVariants: Map[String, Seq[String]] =
    Gazetteer.SurfaceAliases.toSeq
      .filter { case (s, a) => s != a }
      .groupBy(_._2)
      .map { case (a, kvs) => a -> kvs.map(_._1).sorted }

  /** Unknown corruptions — planted in gold but absent from the trie
    * (bounded recall loss, ~2% of mentions). */
  private def corrupt(surface: String): String =
    surface.head.toString + surface.head + surface.tail // "RReuters"

  private val FillerFr: IndexedSeq[String] = IndexedSeq(
    "le", "gouvernement", "annonce", "une", "nouvelle", "loi", "sur",
    "la", "circulation", "routière", "dans", "les", "cantons", "hier",
    "soir", "pendant", "que", "ministre", "des", "finances", "rappelle",
    "décision", "importante", "concernant", "marché", "du", "travail",
    "selon", "un", "communiqué", "officiel", "publié", "ce", "matin")

  private val FillerDe: IndexedSeq[String] = IndexedSeq(
    "die", "regierung", "kündigt", "ein", "neues", "gesetz", "über",
    "den", "verkehr", "im", "kanton", "an", "gestern", "abend", "während",
    "der", "minister", "für", "finanzen", "eine", "wichtige", "entscheidung",
    "zum", "arbeitsmarkt", "bekannt", "gab", "laut", "einer", "amtlichen",
    "mitteilung", "von", "heute", "morgen")

  private val MentionLeadFr = IndexedSeq("selon", "rapporte", "annonce", "précise")
  private val MentionLeadDe = IndexedSeq("meldet", "berichtet", "laut", "schreibt")

  private val SwissPapers = IndexedSeq("GDL", "JDG", "SDT", "EXP", "IMP", "LCE")
  private val LuxPapers = IndexedSeq("luxwort", "luxland", "indeplux")

  // ---- per-row generation -------------------------------------------

  final case class Row(article: Article, gold: Seq[GoldMention])

  private def mix(seed: Long, i: Long): Long = {
    // splitmix64 finalizer — stable, partition-independent
    var z = seed + i * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def genRow(seed: Long, i: Long): Row = {
    val rng = new scala.util.Random(mix(seed, i))
    val roll = rng.nextInt(100)
    val (tp, lang) =
      if (roll < 45) ("ar", "fr")
      else if (roll < 78) ("ar", "de")
      else if (roll < 85) ("page", if (rng.nextBoolean()) "fr" else "de")
      else if (roll < 90) ("ad", if (rng.nextBoolean()) "fr" else "de")
      else if (roll < 95) ("ar", "en")
      else ("ar", if (rng.nextBoolean()) "fr" else "de") // short/empty text

    val shortText = roll >= 95
    val year = 1860 + rng.nextInt(140)
    val month = 1 + rng.nextInt(12)
    val day = 1 + rng.nextInt(28)
    val np =
      if (rng.nextInt(10) < 8) SwissPapers(rng.nextInt(SwissPapers.length))
      else LuxPapers(rng.nextInt(LuxPapers.length))
    val url = ArticleId.format(np, year, month, day, "a", (i % 10000).toInt)
    // epoch-based construction: Timestamp.valueOf(String) goes through
    // Calendar/TimeZone and serializes badly across threads
    val ts = new Timestamp(
      java.time.LocalDate.of(year, month, day).toEpochDay * 86400000L +
        6L * 3600000L)

    if (shortText) {
      val t = if (rng.nextBoolean()) "" else " "
      return Row(Article(url, ts, fakeHtml(url, t, lang, tp), t, lang, tp),
        Seq.empty)
    }

    val filler = if (lang == "de") FillerDe else FillerFr
    val leads = if (lang == "de") MentionLeadDe else MentionLeadFr

    // 30% of rows carry 1-3 planted mentions (also in ad/en rows, where the
    // gate must drop them → gold only for gate-passing rows)
    val nMentions = if (rng.nextInt(100) < 30) 1 + rng.nextInt(3) else 0
    val nSentences = 3 + rng.nextInt(5)
    // distinct mention sentence slots without a shuffle allocation
    var mentionMask = 0
    var picked = 0
    while (picked < nMentions) {
      val slot = rng.nextInt(nSentences)
      if ((mentionMask & (1 << slot)) == 0) {
        mentionMask |= (1 << slot); picked += 1
      }
    }

    val sb = new StringBuilder(256)
    val gold = Seq.newBuilder[GoldMention]
    val gatePasses =
      (tp == "ar" || tp == "page") && (lang == "fr" || lang == "de")

    def appendFiller(capitalizeFirst: Boolean, n: Int): Unit = {
      var i = 0
      while (i < n) {
        if (i > 0) sb.append(' ')
        val w = filler(rng.nextInt(filler.length))
        if (i == 0 && capitalizeFirst) {
          sb.append(Character.toUpperCase(w.charAt(0))).append(w, 1, w.length)
        } else sb.append(w)
        i += 1
      }
    }

    var s = 0
    while (s < nSentences) {
      if (s > 0) sb.append(' ')
      if ((mentionMask & (1 << s)) != 0) {
        val agency = SkewTable(rng.nextInt(SkewTable.length))
        val variantRoll = rng.nextInt(100)
        val variants = KnownVariants.getOrElse(agency, Seq.empty)
        val surface =
          if (variantRoll < 92 || variants.isEmpty)
            if (variantRoll >= 98) corrupt(agency) else agency
          else if (variantRoll < 98) variants(rng.nextInt(variants.length))
          else corrupt(agency)
        appendFiller(capitalizeFirst = true, 3 + rng.nextInt(3))
        sb.append(' ').append(leads(rng.nextInt(leads.length))).append(' ')
        val l = sb.length
        sb.append(surface)
        val r = sb.length
        sb.append(' ')
        appendFiller(capitalizeFirst = false, 2 + rng.nextInt(4))
        sb.append('.')
        if (gatePasses) {
          gold += GoldMention(
            url, l, r, surface,
            s"org.ent.pressagency.$agency",
            Gazetteer.WikidataIds.getOrElse(agency, "NIL"))
        }
      } else {
        appendFiller(capitalizeFirst = true, 6 + rng.nextInt(6))
        sb.append('.')
      }
      s += 1
    }
    val text = sb.toString
    Row(Article(url, ts, fakeHtml(url, text, lang, tp), text, lang, tp),
      gold.result())
  }

  private def capitalize(w: String): String =
    if (w.isEmpty) w else w.head.toUpper.toString + w.tail

  /** Deterministic FULL rebuilt content-item JSON bytes for the `html`
    * binary column (`ContentItem.py:119-148`): fulltext plus line/
    * paragraph/region break offsets and per-token page coordinates on a
    * fixed-metric grid. `text` stays authoritative — the payload's `ft`
    * byte-equals it (round-trip property in RebuiltSpec); multimodal ops
    * may still treat it as opaque. */
  private def fakeHtml(url: String, text: String, lang: String,
      tp: String): Array[Byte] =
    graft.sources.Rebuilt.toJsonBytes(
      graft.sources.Rebuilt.fromText(url, lang, tp, text))

  // ---- Dataset builders ---------------------------------------------

  def articles(spark: SparkSession, n: Long, seed: Long = 42L,
      partitions: Int = 32): Dataset[Article] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => genRow(seed, i).article)
  }

  def gold(spark: SparkSession, n: Long, seed: Long = 42L,
      partitions: Int = 32): Dataset[GoldMention] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).flatMap(i => genRow(seed, i).gold)
  }
}
