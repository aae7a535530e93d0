package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Rebuilt
import graft.synth.Synth
import graft.text.TextNorm

/** FULL rebuilt content-item schema (ContentItem.py:119-148): round-trip
  * through the synthetic corpus's `html` payload, offsets-in-bounds and
  * break-nesting properties, span→coordinate lookup (driver and Catalyst
  * forms), and the TextNorm length-preservation contract. */
class RebuiltSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("html payload round-trips: parsed ft byte-equals the text column") {
    import spark.implicits._
    val arts = Synth.articles(spark, 300, seed = 42L, partitions = 8)
    val parsed = Rebuilt.parse(arts.toDF(), "html")
      .select(col("id"), col("ft"))
    val joined = arts.toDF().select(col("url"), col("text"))
      .join(parsed, col("url") === col("id"))
    assert(joined.count() == 300)
    assert(joined.where(col("ft") =!= col("text")).count() == 0)
  }

  test("offsets in bounds; tokens reconstruct ft; breaks nest (rb ⊆ pb ⊆ lb)") {
    (0L until 200L).foreach { i =>
      val row = Synth.genRow(42L, i)
      val text = row.article.text
      val item = Rebuilt.fromText(row.article.url, row.article.lang,
        row.article.tp, text)
      assert(item.ft == text)
      val toks = item.ppreb.flatMap(_.t)
      toks.foreach { t =>
        assert(t.s >= 0 && t.l > 0 && t.s + t.l <= text.length)
        val w = text.substring(t.s, t.s + t.l)
        assert(!w.contains(' '), s"token '$w' spans a space")
      }
      // single-space reconstruction: tokens in offset order joined by one
      // space must reproduce the (trimmed) fulltext
      if (text.trim.nonEmpty) {
        val rebuilt = toks.sortBy(_.s)
          .map(t => text.substring(t.s, t.s + t.l)).mkString(" ")
        assert(rebuilt == text.trim)
      }
      def increasing(xs: Seq[Int]) = xs.zip(xs.drop(1)).forall(p => p._1 < p._2)
      assert(increasing(item.lb) && increasing(item.pb) && increasing(item.rb))
      assert(item.lb.forall(e => e > 0 && e <= text.length))
      assert(item.pb.toSet.subsetOf(item.lb.toSet))
      assert(item.rb.toSet.subsetOf(item.pb.toSet))
      if (text.nonEmpty) assert(item.lb.lastOption.contains(text.length))
      // page grid: every coordinate box is 4 ints with positive extent
      toks.foreach(t => assert(t.c.length == 4 && t.c(2) > 0 && t.c(3) > 0))
    }
  }

  test("span→coords lookup returns exactly the mention token (driver + Catalyst)") {
    import spark.implicits._
    // driver form: get_coordinates semantics over the gold spans
    var checked = 0
    (0L until 300L).foreach { i =>
      val row = Synth.genRow(42L, i)
      val item = Rebuilt.fromText(row.article.url, row.article.lang,
        row.article.tp, row.article.text)
      row.gold.foreach { g =>
        val hits = Rebuilt.coordsForSpan(item, g.lOffset, g.rOffset)
          .sortBy(_.s)
        // the returned tokens must TILE the mention span: one per surface
        // word, concatenating back to the exact surface
        assert(hits.nonEmpty,
          s"span [${g.lOffset},${g.rOffset}) '${g.surface}' hit no tokens")
        assert(hits.head.s == g.lOffset &&
          hits.last.s + hits.last.l == g.rOffset)
        val txt = row.article.text
        assert(hits.map(t => txt.substring(t.s, t.s + t.l)).mkString(" ")
          == g.surface)
        checked += 1
      }
    }
    assert(checked > 50, s"fixture too thin: only $checked gold spans")

    // Catalyst form: same lookup as a pure column expression over the
    // parsed Dataset joined to the gold table — no explode, no UDF
    val arts = Synth.articles(spark, 300, seed = 42L, partitions = 8)
    val items = Rebuilt.parse(arts.toDF(), "html")
    val gold = Synth.gold(spark, 300, seed = 42L, partitions = 8).toDF()
    val hits = items.join(gold, col("id") === col("url"))
      .select(col("url"), col("lOffset"), col("rOffset"), col("surface"),
        Rebuilt.coordsForSpan(col("ppreb"), col("lOffset"), col("rOffset"))
          .as("hits"))
      .select(col("*"), size(col("hits")).as("n"),
        element_at(col("hits"), 1).getField("s").as("hs"),
        (element_at(col("hits"), -1).getField("s") +
          element_at(col("hits"), -1).getField("l")).as("he"))
    assert(hits.where(col("n") =!=
      size(split(col("surface"), " "))).count() == 0)
    assert(hits.where(col("hs") =!= col("lOffset") ||
      col("he") =!= col("rOffset")).count() == 0)
  }

  test("hyphenation halves: hy1 only on line-FINAL '-' tokens, hy2 on the continuation") {
    // width 10 forces a wrap after "gouverne-": line-end hyphen → hy1,
    // next line's first token → hy2
    val item = Rebuilt.fromText("u", "fr", "ar", "gouverne- ment suit",
      lineWidth = 10)
    val toks = item.ppreb.flatMap(_.t).sortBy(_.s)
    assert(toks.map(t => (t.hy1, t.hy2)) == Seq(
      (Some(true), None), (None, Some(true)), (None, None)))
    // a mid-line '-' token (no wrap) is NOT a hyphenation half
    val flat = Rebuilt.fromText("u", "fr", "ar", "selon ATS- SDA hier")
    assert(flat.ppreb.flatMap(_.t).forall(t => t.hy1.isEmpty && t.hy2.isEmpty))
  }

  test("TextNorm interplay: accent fold preserves offsets, punct cleanup does not") {
    // length-preserving fold: precomposed Latin accents decompose 1:1, so
    // every (s, l) token window stays aligned on the folded text
    (0L until 100L).foreach { i =>
      val row = Synth.genRow(42L, i)
      val text = row.article.text
      val folded = TextNorm.foldAccents(text)
      assert(folded.length == text.length,
        s"fold changed length for row $i — offsets would break silently")
      val item = Rebuilt.fromText(row.article.url, row.article.lang,
        row.article.tp, text)
      item.ppreb.flatMap(_.t).foreach { t =>
        assert(folded.substring(t.s, t.s + t.l) ==
          TextNorm.foldAccents(text.substring(t.s, t.s + t.l)))
      }
    }
    // NOT length-preserving: space-before-punct cleanup shifts every
    // offset after the removed char — coordinates must be consumed
    // against raw ft BEFORE this normalization (Rebuilt's documented
    // contract), never after
    val noisy = "selon Reuters , hier soir ."
    val item = Rebuilt.fromText("u", "fr", "ar", noisy)
    val cleaned = TextNorm.removeSpaceBeforePunctuation(noisy)
    assert(cleaned.length < noisy.length)
    val last = item.ppreb.flatMap(_.t).maxBy(_.s)
    assert(last.s + last.l > cleaned.length,
      "expected the final raw-offset token to fall outside the cleaned text")
  }
}
