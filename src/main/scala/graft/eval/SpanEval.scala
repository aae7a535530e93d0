package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
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
