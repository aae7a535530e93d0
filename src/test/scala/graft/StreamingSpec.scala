package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ner.{AliasTrieScorer, NerStage}
import graft.streaming.StreamingKg
import graft.synth.Synth

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("streaming NER over a file source equals the batch result") {
    val inDir = Files.createTempDirectory("stream_in").toString
    val ckDir = Files.createTempDirectory("stream_ck").toString
    val articles = Synth.articles(spark, 500, 42L, 4)
    articles.write.mode("overwrite").parquet(inDir)

    val q = StreamingKg.startMemorySink(
      StreamingKg.mentionStream(spark, inDir, new AliasTrieScorer),
      "stream_mentions", ckDir)
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT id FROM stream_mentions")
      val batch = NerStage.detect(articles, new AliasTrieScorer).toDF()
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch.select("id")).count() == 0)

      // incremental: new files are picked up exactly once
      Synth.articles(spark, 100, 9L, 2)
        .write.mode("append").parquet(inDir)
      q.processAllAvailable()
      val extra = NerStage.detect(
        Synth.articles(spark, 100, 9L, 2), new AliasTrieScorer).count()
      assert(spark.sql("SELECT * FROM stream_mentions").count() ==
        batch.count() + extra)
    } finally q.stop()
  }
}
