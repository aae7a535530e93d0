package graft.eval

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Span-level P/R/F1 scoring — the engine's correctness oracle.
  *
  * Two regimes, mirroring the HIPE scorer
  * (`HIPE-scorer/hipe_evaluation/ner_eval.py:387-630`):
  *  - `strict`: exact boundaries + exact type;
  *  - `fuzzy`: char-span overlap + exact type (the regime behind the
  *    P/R ≥ 0.95 acceptance gate, BASELINE.md).
  *
  * Distributed formulation: both regimes reduce to joins between the gold
  * and predicted span tables keyed by `url` — exact is an equi-join on
  * `(url, type, l, r)`; fuzzy is an equi-join on `(url, type)` with an
  * interval-overlap residual, de-duplicated so each gold matches ≤1 pred
  * and vice versa (greedy by leftmost pred, like the scorer's first-match
  * scan). Counts are then single global aggregates — no driver-side loops.
  */
object SpanEval {

  final case class Metrics(tp: Long, fp: Long, fn: Long) {
    def precision: Double = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    def recall: Double = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    def f1: Double = {
      val p = precision; val r = recall
      if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    }
  }

  /** Score predicted vs gold span tables. Both inputs need columns
    * `(url, entity, lOffset, rOffset)`. */
  def score(pred: DataFrame, gold: DataFrame, fuzzy: Boolean): Metrics = {
    // 1:1 accounting requires set semantics on both sides: duplicate
    // identical spans would multiply through the equi-join and push
    // fp = nPred - tp negative (HIPE operates on token-aligned columns
    // where duplicates cannot occur; dedup restores that invariant here)
    val p = pred.select(
      col("url"), col("entity"),
      col("lOffset").cast("int").as("pl"), col("rOffset").cast("int").as("pr"))
      .dropDuplicates("url", "entity", "pl", "pr")
    val g = gold.select(
      col("url"), col("entity"),
      col("lOffset").cast("int").as("gl"), col("rOffset").cast("int").as("gr"))
      .dropDuplicates("url", "entity", "gl", "gr")

    val matched =
      if (!fuzzy)
        p.join(g,
          p("url") === g("url") && p("entity") === g("entity") &&
            col("pl") === col("gl") && col("pr") === col("gr"))
          .select(p("url"), col("pl"), col("pr"), col("gl"), col("gr"))
      else {
        // overlap candidates, then 1:1 de-dup both ways. Candidate priority
        // mirrors the HIPE scorer's per-pred scan (ner_eval.py
        // compute_metrics): an exact-boundary match wins first (Scenario I
        // before overlap scenarios — guarantees fuzzy TP >= strict TP),
        // then the largest overlap, then leftmost offsets.
        val cand = p.join(g,
          p("url") === g("url") && p("entity") === g("entity") &&
            col("pl") < col("gr") && col("gl") < col("pr"))
          .select(p("url"), p("entity"), col("pl"), col("pr"), col("gl"), col("gr"))
        val exact = (col("pl") === col("gl") && col("pr") === col("gr")).cast("int")
        val overlap = least(col("pr"), col("gr")) - greatest(col("pl"), col("gl"))
        val byPred = Window.partitionBy(col("url"), col("entity"), col("pl"), col("pr"))
          .orderBy(exact.desc, overlap.desc, col("gl"), col("gr"))
        val byGold = Window.partitionBy(col("url"), col("entity"), col("gl"), col("gr"))
          .orderBy(exact.desc, overlap.desc, col("pl"), col("pr"))
        cand
          .withColumn("rp", row_number().over(byPred)).where(col("rp") === 1)
          .withColumn("rg", row_number().over(byGold)).where(col("rg") === 1)
      }

    val tp = matched.count()
    val nPred = p.count()
    val nGold = g.count()
    Metrics(tp, nPred - tp, nGold - tp)
  }

  // ---- full HIPE report: 4 regimes × (per-type + ALL), micro + macro ---

  /** Classify every (pred, gold) interaction into the HIPE scorer's six
    * scenarios (`ner_eval.py:387-630`) with 1:1 pairing, as staged joins:
    *
    *   I   exact boundary + type        → correct in all four regimes
    *   IV  exact boundary, wrong type   → strict/ent_type incorrect,
    *                                       exact/partial correct
    *   V   overlap, same type           → ent_type correct, partial 0.5,
    *                                       strict/exact incorrect
    *   VI  overlap, wrong type          → partial 0.5, others incorrect
    *   II  unmatched pred               → spurious (attributed to pred type)
    *   III unmatched gold               → missed (attributed to gold type)
    *
    * Per-type attribution follows the reference: scenarios with a gold
    * involved count under the GOLD entity's type; spurious counts under the
    * pred's type. Pairing is greedy 1:1 (largest overlap first, exact
    * boundary before overlap), the distributed analog of the scorer's
    * per-pred sequential scan — identical on all of the scorer's own
    * fixtures; adversarial interleavings where the sequential scan
    * double-counts a gold can differ, by design (1:1 keeps possible ≤
    * nGold).
    *
    * Returns one row per (url, eType, scenario) with a count.
    */
  private def scenarioCounts(pred: DataFrame, gold: DataFrame): DataFrame = {
    // materialized once: every pairing stage (joins + anti-joins) re-reads
    // these tables, and pred's upstream is typically the whole NER pipeline
    val p0 = pred.select(
      col("url").as("purl"), col("entity").as("pe"),
      col("lOffset").cast("int").as("pl"), col("rOffset").cast("int").as("pr"))
      .dropDuplicates("purl", "pe", "pl", "pr")
      .localCheckpoint()
    val g0 = gold.select(
      col("url").as("gurl"), col("entity").as("ge"),
      col("lOffset").cast("int").as("gl"), col("rOffset").cast("int").as("gr"))
      .dropDuplicates("gurl", "ge", "gl", "gr")
      .localCheckpoint()

    val pKeys = Seq("purl", "pe", "pl", "pr")
    val gKeys = Seq("gurl", "ge", "gl", "gr")

    def oneToOne(cand: DataFrame): DataFrame = {
      val overlap = least(col("pr"), col("gr")) - greatest(col("pl"), col("gl"))
      val byPred = Window.partitionBy(pKeys.map(col): _*)
        .orderBy(overlap.desc, col("gl"), col("gr"), col("ge"))
      val byGold = Window.partitionBy(gKeys.map(col): _*)
        .orderBy(overlap.desc, col("pl"), col("pr"), col("pe"))
      cand
        .withColumn("rp", row_number().over(byPred)).where(col("rp") === 1)
        .withColumn("rg", row_number().over(byGold)).where(col("rg") === 1)
        .drop("rp", "rg")
    }
    def minus(rest: DataFrame, used: DataFrame, keys: Seq[String]): DataFrame =
      rest.join(used.select(keys.map(col): _*), keys, "left_anti")

    // every stage result is checkpointed: the later anti-join chains
    // reference ALL earlier stages, so unmaterialized plans recompute
    // combinatorially (measured 6s → 53s without these)
    // Stage I: exact boundary + type (1:1 by construction — keys are equal)
    val mI = p0.join(g0,
      col("purl") === col("gurl") && col("pe") === col("ge") &&
        col("pl") === col("gl") && col("pr") === col("gr"))
      .localCheckpoint()
    var pRest = minus(p0, mI, pKeys)
    var gRest = minus(g0, mI, gKeys)

    // Stage IV: exact boundary, different type
    val mIV = oneToOne(pRest.join(gRest,
      col("purl") === col("gurl") && col("pe") =!= col("ge") &&
        col("pl") === col("gl") && col("pr") === col("gr")))
      .localCheckpoint()
    pRest = minus(pRest, mIV, pKeys)
    gRest = minus(gRest, mIV, gKeys)

    // Stage V: boundary overlap, same type
    val mV = oneToOne(pRest.join(gRest,
      col("purl") === col("gurl") && col("pe") === col("ge") &&
        col("pl") < col("gr") && col("gl") < col("pr")))
      .localCheckpoint()
    pRest = minus(pRest, mV, pKeys)
    gRest = minus(gRest, mV, gKeys)

    // Stage VI: boundary overlap, different type
    val mVI = oneToOne(pRest.join(gRest,
      col("purl") === col("gurl") && col("pe") =!= col("ge") &&
        col("pl") < col("gr") && col("gl") < col("pr")))
      .localCheckpoint()
    val spurious = minus(pRest, mVI, pKeys)
    val missed = minus(gRest, mVI, gKeys)

    def byType(df: DataFrame, urlCol: String, typeCol: String,
        scenario: String): DataFrame =
      df.groupBy(col(urlCol).as("url"), col(typeCol).as("eType"))
        .agg(count(lit(1)).as("n"))
        .withColumn("scenario", lit(scenario))

    byType(mI, "gurl", "ge", "I")
      .unionByName(byType(mIV, "gurl", "ge", "IV"))
      .unionByName(byType(mV, "gurl", "ge", "V"))
      .unionByName(byType(mVI, "gurl", "ge", "VI"))
      .unionByName(byType(spurious, "purl", "pe", "II"))
      .unionByName(byType(missed, "gurl", "ge", "III"))
  }

  /** Regime composition of the six scenarios (`ner_eval.py:395-400`). */
  val Regimes: Seq[String] = Seq("strict", "ent_type", "exact", "partial")

  /** Full evaluation report — the DataFrame analog of the HIPE scorer's
    * output JSON: one row per (eType ∪ "ALL", regime) with the SemEval-2013
    * counts, micro P/R/F1 and (on ALL rows) macro-over-types P/R/F1
    * (`compute_macro_type_scores`, ner_eval.py:807-843; the mean of
    * per-type micro scores). */
  def report(pred: DataFrame, gold: DataFrame): DataFrame = {
    val sc = scenarioCounts(pred, gold)
    // scenario → per-regime (correct, incorrect, partial) contribution
    def n(s: String): Column =
      sum(when(col("scenario") === s, col("n")).otherwise(0L))
    val perType = sc.groupBy(col("eType")).agg(
      n("I").as("cI"), n("IV").as("cIV"), n("V").as("cV"), n("VI").as("cVI"),
      n("II").as("spurious"), n("III").as("missed"))
    val all = sc.withColumn("eType", lit("ALL"))
      .groupBy(col("eType")).agg(
        n("I").as("cI"), n("IV").as("cIV"), n("V").as("cV"), n("VI").as("cVI"),
        n("II").as("spurious"), n("III").as("missed"))
    val base = perType.unionByName(all)

    val regimeRows = Regimes.map { regime =>
      val (correct, incorrect, partial) = regime match {
        case "strict" =>
          (col("cI"), col("cIV") + col("cV") + col("cVI"), lit(0L))
        case "ent_type" =>
          (col("cI") + col("cV"), col("cIV") + col("cVI"), lit(0L))
        case "exact" =>
          (col("cI") + col("cIV"), col("cV") + col("cVI"), lit(0L))
        case "partial" =>
          (col("cI") + col("cIV"), lit(0L), col("cV") + col("cVI"))
      }
      base.select(
        col("eType"), lit(regime).as("regime"),
        correct.as("correct"), incorrect.as("incorrect"),
        partial.as("partial"), col("missed"), col("spurious"))
    }.reduce(_ unionByName _)

    val counted = regimeRows
      .withColumn("actual",
        col("correct") + col("incorrect") + col("partial") + col("spurious"))
      .withColumn("possible",
        col("correct") + col("incorrect") + col("partial") + col("missed"))
      .withColumn("tp", col("correct"))
      .withColumn("fp", col("actual") - col("correct"))
      .withColumn("fn", col("possible") - col("correct"))
    val reward = col("correct") +
      when(col("regime") === "partial", col("partial") * 0.5).otherwise(0.0)
    val withMicro = counted
      .withColumn("p_micro",
        when(col("actual") > 0, reward / col("actual")).otherwise(0.0))
      .withColumn("r_micro",
        when(col("possible") > 0, reward / col("possible")).otherwise(0.0))
      .withColumn("f1_micro",
        when(col("p_micro") + col("r_micro") > 0,
          lit(2.0) * col("p_micro") * col("r_micro") /
            (col("p_micro") + col("r_micro"))).otherwise(0.0))

    // macro over types (ALL rows only): unweighted mean of per-type micro
    val macros = withMicro.where(col("eType") =!= "ALL")
      .groupBy(col("regime"))
      .agg(avg(col("p_micro")).as("p_macro"),
        avg(col("r_micro")).as("r_macro"),
        avg(col("f1_micro")).as("f1_macro"))
    withMicro.join(macros, Seq("regime"), "left")
      .withColumn("p_macro",
        when(col("eType") === "ALL", col("p_macro")))
      .withColumn("r_macro",
        when(col("eType") === "ALL", col("r_macro")))
      .withColumn("f1_macro",
        when(col("eType") === "ALL", col("f1_macro")))
      .select(col("eType"), col("regime"), col("correct"), col("incorrect"),
        col("partial"), col("missed"), col("spurious"), col("possible"),
        col("actual"), col("tp"), col("fp"), col("fn"),
        col("p_micro"), col("r_micro"), col("f1_micro"),
        col("p_macro"), col("r_macro"), col("f1_macro"))
  }

  /** Macro-over-documents scores (`accumulate_doc_scores`,
    * ner_eval.py:331-360): per-document micro P/R/F1 averaged across
    * documents, where a document enters the P mean only if it has
    * predictions (actual > 0), the R mean only if it has gold entities
    * (possible > 0), and the F1 mean only if both. One row per regime. */
  def macroDocScores(pred: DataFrame, gold: DataFrame): DataFrame = {
    val sc = scenarioCounts(pred, gold)
    def n(s: String): Column =
      sum(when(col("scenario") === s, col("n")).otherwise(0L))
    val perDoc = sc.groupBy(col("url")).agg(
      n("I").as("cI"), n("IV").as("cIV"), n("V").as("cV"), n("VI").as("cVI"),
      n("II").as("spurious"), n("III").as("missed"))
    Regimes.map { regime =>
      val (correct, incorrect, partial) = regime match {
        case "strict" =>
          (col("cI"), col("cIV") + col("cV") + col("cVI"), lit(0L))
        case "ent_type" =>
          (col("cI") + col("cV"), col("cIV") + col("cVI"), lit(0L))
        case "exact" =>
          (col("cI") + col("cIV"), col("cV") + col("cVI"), lit(0L))
        case "partial" =>
          (col("cI") + col("cIV"), lit(0L), col("cV") + col("cVI"))
      }
      val reward = correct +
        (if (regime == "partial") partial * 0.5 else lit(0.0))
      perDoc
        .withColumn("actual", correct + incorrect + partial + col("spurious"))
        .withColumn("possible", correct + incorrect + partial + col("missed"))
        .withColumn("p", when(col("actual") > 0, reward / col("actual")))
        .withColumn("r", when(col("possible") > 0, reward / col("possible")))
        .withColumn("f1",
          when(col("actual") > 0 && col("possible") > 0,
            when(col("p") + col("r") > 0,
              lit(2.0) * col("p") * col("r") / (col("p") + col("r")))
              .otherwise(0.0)))
        .agg(avg(col("p")).as("p_macro_doc"),
          avg(col("r")).as("r_macro_doc"),
          avg(col("f1")).as("f1_macro_doc"))
        .withColumn("regime", lit(regime))
        .select(col("regime"), col("p_macro_doc"), col("r_macro_doc"),
          col("f1_macro_doc"))
    }.reduce(_ unionByName _)
  }

  /** Sliced evaluation — the HIPE scorer's TIME-period and LED-noise
    * regimes (`filter_entities_by_date` / `filter_entities_by_noise`,
    * applied before scoring): each named predicate filters BOTH tables,
    * then the full report runs on the slice. Returns the union of reports
    * with a leading `slice` column; `("ALL", lit(true))` reproduces the
    * unsliced TIME-ALL/LED-ALL report. */
  def reportSliced(pred: DataFrame, gold: DataFrame,
      slices: Seq[(String, Column)]): DataFrame =
    slices.map { case (name, predicate) =>
      report(pred.where(predicate), gold.where(predicate))
        .withColumn("slice", lit(name))
    }.reduce(_ unionByName _)
      .select(col("slice") +: Seq(col("eType"), col("regime"), col("correct"),
        col("incorrect"), col("partial"), col("missed"), col("spurious"),
        col("possible"), col("actual"), col("tp"), col("fp"), col("fn"),
        col("p_micro"), col("r_micro"), col("f1_micro"), col("p_macro"),
        col("r_macro"), col("f1_macro")): _*)

  /** TIME-period slice predicates over a year column
    * (`--time_period` CLI ranges). */
  def timeSlices(yearCol: Column, periods: Seq[(Int, Int)]): Seq[(String, Column)] =
    ("TIME-ALL", lit(true)) +: periods.map { case (from, to) =>
      (s"TIME-$from-$to", yearCol.between(from, to))
    }

  /** LED-noise slice predicates over a normalized-Levenshtein column
    * (`--noise_level` CLI bands; LED-ALL = no filter). */
  def noiseSlices(ledCol: Column, bands: Seq[(Double, Double)]): Seq[(String, Column)] =
    ("LED-ALL", lit(true)) +: bands.map { case (lo, hi) =>
      (s"LED-$lo-$hi", ledCol >= lo && ledCol < hi)
    }

  // ---- typed Aggregator (seqeval-style, for per-group scoring) --------

  /** Buffer/result for the UDAF form: per-group (e.g. per doc, per type)
    * accumulation of (tp, fp, fn) from pre-matched pair rows — the
    * distributed analog of `ner_eval.py:253-331`'s accumulators. */
  final case class PairRow(isTp: Boolean, isFp: Boolean, isFn: Boolean)

  val metricsAgg: Aggregator[PairRow, Metrics, Metrics] =
    new Aggregator[PairRow, Metrics, Metrics] {
      def zero: Metrics = Metrics(0, 0, 0)
      def reduce(b: Metrics, a: PairRow): Metrics =
        Metrics(b.tp + (if (a.isTp) 1 else 0),
          b.fp + (if (a.isFp) 1 else 0),
          b.fn + (if (a.isFn) 1 else 0))
      def merge(x: Metrics, y: Metrics): Metrics =
        Metrics(x.tp + y.tp, x.fp + y.fp, x.fn + y.fn)
      def finish(r: Metrics): Metrics = r
      def bufferEncoder: Encoder[Metrics] = Encoders.product[Metrics]
      def outputEncoder: Encoder[Metrics] = Encoders.product[Metrics]
    }
}
