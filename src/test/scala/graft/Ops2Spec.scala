package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{Span, TsvToken}
import graft.eval.SpanEval
import graft.link.Linker
import graft.ops.Sampling
import graft.sources.{ConllTsvReader, ConllTsvWriter}

/** Coverage for the round-1 additions: P3 top-up sampling, L4 proximity
  * pairs, K2 TSV writer, P6 seeded choice, A8 metrics Aggregator. */
class Ops2Spec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("min-frequency top-up fills under-represented strata without dups") {
    import spark.implicits._
    val d = (0L until 300L).map(i => (i, s"g${i % 3}")).toDF("k", "g")
    val picked = d.where(col("g") === "g0").limit(1)
      .unionByName(d.where(col("g") === "g1").limit(5))
    val topped = Sampling.minFrequencyTopUp(d, picked, col("g"), col("k"), 3)
    val counts = topped.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("g0") == 3) // 1 picked + 2 topped
    assert(counts("g1") == 5) // already above min, untouched
    assert(counts("g2") == 3) // 0 picked + 3 topped
    assert(topped.count() == topped.dropDuplicates("k").count())
  }

  test("seeded choice is deterministic and in-bounds") {
    import spark.implicits._
    val d = Seq((1L, Seq("a", "b", "c")), (2L, Seq("x", "y"))).toDF("k", "arr")
    val c1 = d.select(Sampling.seededChoice(col("arr"), col("k"), 7).as("c"))
      .collect().map(_.getString(0)).toSeq
    val c2 = d.repartition(5)
      .select(Sampling.seededChoice(col("arr"), col("k"), 7).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(c1.sorted == c2.sorted)
    assert(c1.zip(Seq(Set("a", "b", "c"), Set("x", "y")))
      .forall { case (c, s) => s(c) })
  }

  test("adjacent mention pairs within a sentence, gap-bounded") {
    import spark.implicits._
    val m = Seq(
      // url, sentenceIdx, name, lOffset, rOffset
      ("u1", 0, "Reuters", 10, 17),
      ("u1", 0, "AFP", 19, 22),      // gap 2 → pair
      ("u1", 0, "Havas", 90, 95),    // gap 68 → no pair
      ("u1", 1, "TASS", 5, 9),       // different sentence
      ("u2", 0, "Wolff", 0, 5))
      .toDF("url", "sentenceIdx", "name", "lOffset", "rOffset")
    val pairs = Linker.adjacentPairs(m, maxGap = 30).collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert(p.getString(2) == "Reuters" && p.getString(3) == "AFP" &&
      p.getInt(4) == 2)
  }

  test("TSV prediction writer round-trips through the reader") {
    val tokens = Seq(
      TsvToken("d1", 0, 0, "Selon", "O", "O", "_", "_", isEndOfSentence = false),
      TsvToken("d1", 0, 1, "Havas", "B-org", "B-org.ent.pressagency.Havas",
        "Q2826560", "_", isEndOfSentence = false),
      TsvToken("d1", 0, 2, "hier", "O", "O", "_", "_", isEndOfSentence = true))
    val pred = Seq("O", "B-org.ent.pressagency.Reuters", "O")
    val out = ConllTsvWriter.formatDoc("d1", "fr", tokens, pred)
    val parsed = ConllTsvReader.parse(out)
    assert(parsed.length == 3)
    assert(parsed.map(_.neFineLit) == pred) // pred replaced the fine column
    assert(parsed.map(_.token) == tokens.map(_.token))
    assert(parsed.head.docId == "d1")
    assert(parsed(2).isEndOfSentence)
    assert(parsed(2).segId == 0 && ConllTsvReader.parse(out + out).length == 6)
  }

  test("metrics Aggregator accumulates per group (A8 distributed form)") {
    import spark.implicits._
    val rows = Seq(
      ("doc1", SpanEval.PairRow(isTp = true, isFp = false, isFn = false)),
      ("doc1", SpanEval.PairRow(isTp = false, isFp = true, isFn = false)),
      ("doc2", SpanEval.PairRow(isTp = false, isFp = false, isFn = true)),
      ("doc2", SpanEval.PairRow(isTp = true, isFp = false, isFn = false)))
      .toDS()
    val byDoc = rows.groupByKey(_._1)
      .mapValues(_._2)
      .agg(SpanEval.metricsAgg.toColumn)
      .collect().toMap
    assert(byDoc("doc1") == SpanEval.Metrics(1, 1, 0))
    assert(byDoc("doc2") == SpanEval.Metrics(1, 0, 1))
  }

  test("gold spans from TSV: BIO grouping over real structure") {
    val toks = Seq(
      TsvToken("d", 0, 0, "la", "O", "O", "_", "_", isEndOfSentence = false),
      TsvToken("d", 0, 1, "United", "B-org", "B-org.ent.pressagency.UP-UPI", "Q493845", "_", isEndOfSentence = false),
      TsvToken("d", 0, 2, "Press", "I-org", "I-org.ent.pressagency.UP-UPI", "Q493845", "_", isEndOfSentence = false),
      TsvToken("d", 0, 3, "dit", "O", "O", "_", "_", isEndOfSentence = true))
    val spans = ConllTsvReader.goldSpans(toks)
    assert(spans == Seq(Span("org.ent.pressagency.UP-UPI", 1, 2, "United Press")))
  }
}
