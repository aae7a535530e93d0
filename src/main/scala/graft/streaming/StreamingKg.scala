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
    * the streaming form of the yearly-edge aggregation (A4).
    *
    * Event time is the WARC fetch timestamp, not the historical
    * publication date: Spark's global watermark starts at the epoch and
    * only ratchets forward, so pre-1970 event times (the reference corpus
    * starts in 1840) would never advance it and append-mode windows would
    * never close. Ingest/fetch time is the correct event-time axis for a
    * crawl stream anyway; publication-date analytics stay in the batch
    * layer's year/decade group-bys. */
  def mentionRates(mentions: Dataset[Mention], articleTs: DataFrame): DataFrame =
    mentions.toDF()
      .join(articleTs, "url") // (url, warc_ts) dimension from the batch side
      .withWatermark("warc_ts", "1 hour")
      .groupBy(window(col("warc_ts"), "1 minute"), col("name"))
      .agg(count(lit(1)).as("n_mentions"))

  /** One deduped document row, from the stateful streaming dedup. */
  final case class DedupedDoc(
      text_hash: String,
      doc_id: Long,
      n_dups_seen: Long
  )

  /** Stateful streaming exact-dedup via `flatMapGroupsWithState` — the
    * custom-state operator of §2.12: keyed by content hash, per-key state
    * is (first doc_id, duplicate count); only the FIRST occurrence of a
    * text is emitted downstream (first-seen-wins, the streaming form of
    * `Dedup.exactDedup`), while the state keeps counting suppressed
    * duplicates for lineage.
    *
    * Scale shape: state is one tiny row per distinct content hash,
    * partitioned by the hash (uniform by construction); with an upstream
    * `withWatermark` the caller can switch the timeout to event-time to
    * bound state on unbounded corpora. Built-in `dropDuplicates` could
    * dedup, but cannot carry the running duplicate counter — that is what
    * the custom state buys.
    */
  def dedupStream(docs: DataFrame): Dataset[DedupedDoc] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(md5(col("text").cast("binary")).as("text_hash"), col("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (hash: String, rows: Iterator[(String, Long)],
            state: GroupState[(Long, Long)]) => {
          val batch = rows.map(_._2).toSeq.sorted
          if (state.exists) {
            val (firstId, nDups) = state.get
            state.update((firstId, nDups + batch.size))
            Iterator.empty
          } else {
            val firstId = batch.head
            state.update((firstId, batch.size - 1L))
            Iterator.single(DedupedDoc(hash, firstId, batch.size - 1L))
          }
        })
  }

  /** Streaming NEAR-dup dedup through the persisted signature store —
    * the production incremental loop as a continuous query: each
    * micro-batch (1) probes the store ([[graft.ops.SignatureStore.probe]]
    * — partition-pruned reads, no corpus rescan), (2) drops every batch
    * document that near-duplicates a stored document or a smaller-id
    * batch document, (3) appends the SURVIVORS' parquet to `outDir` and
    * their signatures to the store, so later micro-batches dedup against
    * them too.
    *
    * `foreachBatch` is the right operator here: the probe is a batch
    * join against an external indexed table — a streaming stateful op
    * would have to hold the whole signature store in executor state.
    *
    * Drop rule: a document is dropped iff it is the GREATER id of some
    * verified pair. That equals connected-components keep-min semantics
    * ([[graft.ops.Dedup.nearDupDedup]]): any non-minimal member of a
    * cluster has a smaller verified neighbor, and the minimum never
    * does. Batch doc_ids must be globally unique and larger than all
    * previously stored ids for keep-FIRST semantics (monotone ids —
    * the natural ingest numbering). */
  def nearDupDedupStream(
      docs: DataFrame,
      storePath: String,
      outDir: String,
      checkpointDir: String,
      maxBucket: Int = 64,
      minJaccard: Double = 0.8
  ): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val b = batch.select(col("doc_id"), col("text")).localCheckpoint()
        val pairs = graft.ops.SignatureStore.probe(spark, storePath, b,
          maxBucket, minJaccard)
        val dropIds = pairs
          .select(greatest(col("id1"), col("id2")).as("doc_id")).distinct()
        val survivors = b.join(dropIds, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        survivors.write.mode("append").parquet(outDir)
        graft.ops.SignatureStore.append(spark, storePath, survivors)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

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
