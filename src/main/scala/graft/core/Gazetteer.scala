package graft.core

/** The agency gazetteer: canonical agency → Wikidata QID, alias
  * normalization, mixed-collection aliases, label space, and existence
  * intervals.
  *
  * Data constants are lifted from the public reference repo:
  *  - QID map: `lib/bert_classification/cli_tagger.py:42-74` (29 agencies,
  *    lower-cased keys at :74; `Europapress → "NIL"`).
  *  - Alias normalization: `notebooks/1_sampling_training_data/
  *    preprocessing.ipynb cell 2` (`na_dict`), mixed collections cell 5
  *    (`mixed_nas`).
  *  - `ATB → ATS` typo rewrite: `cli_tagger.py:191-199`.
  *  - Label space: `data/annotated_data/label_map.json` (43 BIO labels).
  *  - Existence intervals: `network_analysis.ipynb cells 7-9`.
  */
object Gazetteer {

  /** Canonical agency label → Wikidata QID (`cli_tagger.py:42-74`). */
  val WikidataIds: Map[String, String] = Map(
    "AFP" -> "Q40464",
    "ANP" -> "Q966898",
    "ANSA" -> "Q392934",
    "AP" -> "Q40469",
    "APA" -> "Q680662",
    "ATS-SDA" -> "Q430109",
    "Belga" -> "Q815453",
    "BTA" -> "Q2031809",
    "CTK" -> "Q341118",
    "DDP-DAPD" -> "Q265330",
    "DNB" -> "Q1205856",
    "Domei" -> "Q2913752",
    "DPA" -> "Q312653",
    "Europapress" -> "NIL",
    "Extel" -> "Q1525848",
    "Havas" -> "Q2826560",
    "Interfax" -> "Q379271",
    "Kipa" -> "Q1522416",
    "PAP" -> "Q1484980",
    "Reuters" -> "Q130879",
    "SPK-SMP" -> "Q2256560",
    "Stefani" -> "Q1415690",
    "TANJUG" -> "Q371267",
    "TASS" -> "Q223799",
    "Telunion" -> "Q3517301",
    "TT" -> "Q1312158",
    "UP-UPI" -> "Q493845",
    "Wolff" -> "Q552226",
    "Xinhua" -> "Q204839"
  )

  /** Lower-cased lookup, mirroring `cli_tagger.py:74`. */
  val WikidataIdsLower: Map[String, String] =
    WikidataIds.map { case (k, v) => k.toLowerCase -> v }

  /** `label.lower() ∈ map → qid else "NIL"`; `articleauthor`/`unk` are never
    * linked (`cli_tagger.py:202-209`). */
  def qidOf(agencyLabel: String): String = {
    val fine = agencyLabel.split('.').last
    if (fine == "articleauthor" || fine == "unk") "NIL"
    else WikidataIdsLower.getOrElse(fine.toLowerCase, "NIL")
  }

  /** `ATB → ATS` OCR-typo rewrite, then fine label = last dot segment
    * (`cli_tagger.py:191-199`). */
  def normalizeLabel(label: String): String = {
    val l = if (label.contains("ATB")) label.replace("ATB", "ATS") else label
    l
  }

  /** Collection-name → canonical agency (`preprocessing.ipynb cell 2`). */
  val AliasToCanonical: Map[String, String] = Map(
    "AFP1" -> "AFP", "AFP2" -> "AFP", "ANP" -> "ANP", "ANSA" -> "ANSA",
    "AP1" -> "AP", "AP2" -> "AP", "APA" -> "APA",
    "Associated_Press" -> "AP",
    "ATS1" -> "ATS-SDA", "ATS2" -> "ATS-SDA", "ATS3" -> "ATS-SDA",
    "Belga" -> "Belga", "BTA" -> "BTA", "CTK" -> "CTK",
    "DDP-DAPD" -> "DDP-DAPD", "DNB" -> "DNB", "Domei" -> "Domei",
    "DPA" -> "DPA", "Europapress" -> "Europapress", "Extel" -> "Extel",
    "Havas" -> "Havas", "Havasagentur" -> "Havas",
    "Interfax" -> "Interfax", "PAP" -> "PAP",
    "Reuter" -> "Reuters", "Reuters" -> "Reuters",
    "reutersche" -> "Reuters",
    "SPK" -> "SPK-SMP", "Stefani" -> "Stefani", "Tanjug" -> "TANJUG",
    "TASS" -> "TASS", "Telunion" -> "Telunion", "TT-Sweden" -> "TT",
    "UPI" -> "UP-UPI", "Wolff" -> "Wolff"
  )

  /** Mixed-collection names exploding to several agencies
    * (`preprocessing.ipynb cell 5`). */
  val MixedAliases: Map[String, Seq[String]] = Map(
    "afpreuters" -> Seq("AFP", "Reuters"),
    "afpreuter" -> Seq("AFP", "Reuters"),
    "atsafp" -> Seq("ATS-SDA", "AFP"),
    "atsreuters" -> Seq("ATS-SDA", "Reuters"),
    "atsreuter" -> Seq("ATS-SDA", "Reuters"),
    "atsjafp" -> Seq("ATS-SDA", "AFP"),
    "atsap" -> Seq("ATS-SDA", "AP"),
    "aplddp" -> Seq("AP", "DDP-DAPD"),
    "aplafp" -> Seq("AP", "AFP"),
    "afplap" -> Seq("AFP", "AP"),
    "dpalafp" -> Seq("DPA", "AFP"),
    "atsjreuter" -> Seq("ATS-SDA", "Reuters"),
    "atsfafp" -> Seq("ATS-SDA", "AFP"),
    "ddplap" -> Seq("DDP-DAPD", "AP"),
    "aplsda" -> Seq("AP", "ATS-SDA"),
    "sdalafp" -> Seq("ATS-SDA", "AFP"),
    "atsjred" -> Seq("ATS-SDA"),
    "atsred" -> Seq("ATS-SDA")
  )

  /** Surface-form aliases per canonical agency used by the deterministic
    * alias-trie scorer: canonical name + collection aliases + common OCR
    * variants mirroring the reference's golden fixture (`Havaas → Havas`,
    * `tests/na_tagger_out.jsonl:1`). Keys are the surface forms as they
    * appear in text; values the canonical agency label.
    */
  val SurfaceAliases: Map[String, String] = {
    val canon = WikidataIds.keys.map(a => a -> a)
    val collections = AliasToCanonical.collect {
      // collection ids like AFP1/ATS2 are not textual surfaces; keep the
      // word-like ones only
      case (k, v) if !k.exists(_.isDigit) && k != "Associated_Press" => k -> v
    }
    val ocrVariants = Map(
      "Havaas" -> "Havas", "Hava s" -> "Havas",
      "Beuters" -> "Reuters", "Keuters" -> "Reuters",
      "Reuler" -> "Reuters",
      "Woltf" -> "Wolff", "Volff" -> "Wolff",
      "A.F.P." -> "AFP", "A. F. P." -> "AFP",
      "A.T.S." -> "ATS-SDA", "ATS" -> "ATS-SDA", "SDA" -> "ATS-SDA",
      "sda" -> "ATS-SDA", "ag." -> "ATS-SDA",
      "D.N.B." -> "DNB", "U.P." -> "UP-UPI", "UP" -> "UP-UPI",
      "UPI" -> "UP-UPI", "United Press" -> "UP-UPI",
      "Associated Press" -> "AP", "Agence Havas" -> "Havas",
      "Agence télégraphique suisse" -> "ATS-SDA",
      "Schweizerische Depeschenagentur" -> "ATS-SDA",
      "Wolffs Telegraphisches Bureau" -> "Wolff",
      "Agenzia Stefani" -> "Stefani"
    )
    canon.toMap ++ collections ++ ocrVariants
  }

  /** Existence intervals (`network_analysis.ipynb cells 7-9`): defaults
    * 1840/2020, manual overrides Havas end 1944, Europapress 1918-1941. */
  val ExistenceIntervals: Map[String, (Int, Int)] = {
    val defaults = WikidataIds.keys.map(a => a -> (1840, 2020)).toMap
    defaults ++ Map(
      "Havas" -> (1835, 1944),
      "Europapress" -> (1918, 1941)
    )
  }

  def agencyMeta: Seq[AgencyMeta] =
    WikidataIds.toSeq.sortBy(_._1).map { case (a, q) =>
      val (s, e) = ExistenceIntervals(a)
      AgencyMeta(a, q, country = "", startYear = s, endYear = e)
    }

  /** The 43-label BIO space (`data/annotated_data/label_map.json`):
    * `B-`/`I-` × `org.ent.pressagency.<Agency>` for 20 annotated agencies
    * + `pers.ind.articleauthor` + `O`. Index assignment is ours (the
    * reference's is training-run specific); only the label strings matter.
    */
  val LabelAgencies: Seq[String] = Seq(
    "Reuters", "Stefani", "Extel", "Havas", "Xinhua", "Domei", "Belga",
    "AFP", "ATS-SDA", "Wolff", "TASS", "DPA", "DNB", "UP-UPI", "ANSA",
    "SPK-SMP", "Kipa", "Europapress", "APA", "CTK"
  )

  val LabelSpace: Seq[String] =
    Seq("O") ++
      LabelAgencies.flatMap(a =>
        Seq(s"B-org.ent.pressagency.$a", s"I-org.ent.pressagency.$a")) ++
      Seq("B-pers.ind.articleauthor", "I-pers.ind.articleauthor")

  val LabelToId: Map[String, Int] = LabelSpace.zipWithIndex.toMap
}
