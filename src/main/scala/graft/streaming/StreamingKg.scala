package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.core.{Article, Mention}
import graft.ner.{NerStage, TokenScorer}

/** Structured-Streaming front-end for the KG pipeline.
  *
  * The reference is a resumable BATCH pipeline (SURVEY §2.12 — no
  * watermarks or stateful operators exist in it), and batch + the
  * checkpoint-resume manifest remains the engine's primary mode. This
  * module exists for continuous-ingest deployments: the same gate + NER
  * stage run unchanged over a file-source stream (stateless narrow
  * transforms are identical in batch and streaming), with Spark's
  * checkpointLocation giving exactly-once file-source progress — the
  * streaming analog of the per-bucket manifest.
  */
object StreamingKg {

  val ArticleSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("tp", StringType)
  ))

  /** Streaming mention extraction over a parquet-directory source. */
  def mentionStream(
      spark: SparkSession,
      inputDir: String,
      scorer: TokenScorer
  ): Dataset[Mention] = {
    import spark.implicits._
    val articles = spark.readStream
      .schema(ArticleSchema)
      .parquet(inputDir)
      .as[Article]
    NerStage.detect(articles, scorer) // gate + mapPartitions, stateless
  }

  /** Per-minute mention counts by agency with event-time watermarking —
    * the streaming form of the yearly-edge aggregation (A4). */
  def mentionRates(mentions: Dataset[Mention], articleTs: DataFrame): DataFrame =
    mentions.toDF()
      .join(articleTs, "url") // (url, warc_ts) dimension from the batch side
      .withWatermark("warc_ts", "1 hour")
      .groupBy(window(col("warc_ts"), "1 minute"), col("name"))
      .agg(count(lit(1)).as("n_mentions"))

  /** Start a memory-sink query for tests/smoke (append mode). */
  def startMemorySink(mentions: Dataset[Mention], name: String,
      checkpointDir: String): StreamingQuery =
    mentions.writeStream
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
}
