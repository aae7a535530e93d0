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

  test("stateful streaming dedup: first-seen wins across micro-batches, state counts dups") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("dedup_in").toString
    val ckDir = Files.createTempDirectory("dedup_ck").toString
    // batch 1: two distinct texts, one duplicated within the batch
    Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma delta"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(inDir)

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(inDir)
    val q = StreamingKg.dedupStream(stream)
      .toDF()
      .writeStream.format("memory").queryName("dedup_out")
      .option("checkpointLocation", ckDir)
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val out1 = spark.sql("SELECT doc_id, n_dups_seen FROM dedup_out")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // first-seen (min id within the batch) emitted once per distinct text
      assert(out1 == Map(1L -> 1L, 3L -> 0L))

      // batch 2: a cross-micro-batch duplicate is suppressed by state;
      // a new text flows through
      Seq((4L, "alpha beta"), (5L, "epsilon zeta"))
        .toDF("doc_id", "text").write.mode("append").parquet(inDir)
      q.processAllAvailable()
      val out2 = spark.sql("SELECT doc_id FROM dedup_out")
        .collect().map(_.getLong(0)).toSet
      assert(out2 == Set(1L, 3L, 5L)) // doc 4 suppressed — seen in state
    } finally q.stop()
  }
}
