package graft.tools

import graft.ner.{AliasTrieScorer, NerStage}
import graft.synth.Synth
import graft.text.{PunctTokenizer, Segmenter}

/** Single-thread stage profile of the NER hot path (no Spark). */
object NerProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    val articles = (0L until n.toLong).map(i => Synth.genRow(42L, i).article)
      .filter(a => (a.tp == "ar" || a.tp == "page") &&
        (a.lang == "fr" || a.lang == "de") && a.text.length > 2)
    val scorer = new AliasTrieScorer
    // warm
    articles.take(10000).foreach(a => NerStage.detectOne(a, scorer))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val acc = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"NERPROF $label%-16s ${s}%7.3fs (${articles.length / s}%.0f docs/s/core) acc=$acc")
    }
    time("segment") {
      var acc = 0L
      articles.foreach(a => acc += Segmenter.segmentWithOffsets(a.text).length)
      acc
    }
    time("seg+tokenize") {
      var acc = 0L
      articles.foreach(a => Segmenter.segmentWithOffsets(a.text)
        .foreach(s => acc += PunctTokenizer.tokenize(s._2).length))
      acc
    }
    time("seg+tok+score") {
      var acc = 0L
      articles.foreach(a => Segmenter.segmentWithOffsets(a.text)
        .foreach { s =>
          val toks = PunctTokenizer.tokenize(s._2)
          acc += scorer.score(toks.map(_.text)).length
        })
      acc
    }
    // range fast path (what detectOne dispatches to for the trie)
    time("segmentRanges") {
      var acc = 0L
      articles.foreach(a => acc += Segmenter.segmentRanges(a.text).length)
      acc
    }
    time("seg+tokRanges") {
      var acc = 0L
      articles.foreach { a =>
        Segmenter.segmentRanges(a.text).foreach { sr =>
          acc += PunctTokenizer.tokenizeRanges(a.text,
            (sr >>> 32).toInt, (sr & 0xffffffffL).toInt).length
        }
      }
      acc
    }
    time("detectOne_ranges") {
      var acc = 0L
      articles.foreach(a => acc += NerStage.detectOneRanges(a, scorer).length)
      acc
    }
    time("detectOne_strings") {
      var acc = 0L
      articles.foreach(a => acc += NerStage.detectOneStrings(a, scorer).length)
      acc
    }
  }
}
