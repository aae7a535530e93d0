package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed corpus-cleaning pipeline a training-data user actually
  * runs — `decontaminate → exact dedup → near-dup dedup → (optionally)
  * SignatureStore.append(survivors)` — as ONE chain over a single staged
  * shingle/signature pass.
  *
  * Run independently, the four stages each recompute shingles (and two of
  * them signatures) from corpus text: at 100 TB that is 2-3 redundant
  * full text passes, and the text pass IS the dominant cost (scan +
  * shingle expression). Here the corpus text is read EXACTLY ONCE
  * (spec-asserted via filesystem read statistics): the first projection
  * computes per-document content hash, distinct shingle set, and MinHash
  * signature in one codegen'd pass and checkpoints the result; every
  * stage after that exchanges ids, hashes, and shingle/signature arrays —
  * never text.
  *
  * Staging is an EAGER `localCheckpoint` (executor memory with disk
  * spill): lazy materialization could let two downstream branches race
  * into the text scan concurrently and read it twice. The staged artifact
  * is about the size of the shingle sets (≈ corpus text); a deployment
  * whose cleaning chain spans multiple jobs would stage the same frame to
  * parquet instead — every hook here ([[Dedup.bandRowsFromSigs]],
  * [[Dedup.jaccardVerifyOnShingles]],
  * [[Decontaminate.contaminationReportOnShingles]]) takes any
  * `(doc_id, …)` table, however persisted.
  *
  * Stage semantics are IDENTICAL to the standalone operators (the hooks
  * are the same code paths, oracle kg19 checks the composition end to
  * end against DuckDB):
  *  1. drop documents sharing ≥ `minOverlap` distinct shingles (and
  *     ≥ `minRatio` benchmark containment) with any benchmark row;
  *  2. keep the min doc_id per identical text (hash keyed — one uniform
  *     shuffle);
  *  3. LSH candidates (shared cap code) → exact Jaccard verify on the
  *     staged shingle sets → connected components → keep the min doc_id
  *     per near-dup cluster;
  *  4. optionally append the survivors' ALREADY-COMPUTED band keys and
  *     shingle sets into a persisted [[SignatureStore]] so future
  *     incremental batches dedup against the cleaned corpus.
  *
  * Note this is a pipeline, not a pure plan builder: the staging
  * checkpoint and the connected-components loop run Spark jobs when
  * called.
  */
object CleaningPipeline {

  /** Surviving `(doc_id, keepCols…)` rows of the cleaning chain. The
    * output is metadata-only by design — joining text back in is the
    * caller's write-side concern ([[clean]]) and the only place a second
    * text scan can occur. */
  /** `allowStoreReplay`: a RE-RUN of the same cleaning job after its
    * store append already committed re-appends the same survivors —
    * with strict monotone checking the retry refuses on the watermark.
    * Pass true for an idempotent re-run (the store's windowed replay
    * gate still refuses genuinely misnumbered ids; duplicate rows are
    * probe-tolerated and compactable). */
  def cleanedMeta(
      docs: DataFrame,
      bench: DataFrame,
      keepCols: Seq[String] = Nil,
      k: Int = 32,
      bands: Int = 8,
      shingleN: Int = 3,
      maxBucket: Int = 64,
      minJaccard: Double = 0.8,
      minOverlap: Int = 5,
      minRatio: Double = 0.0,
      broadcastBench: Boolean = true,
      storePath: Option[String] = None,
      allowStoreReplay: Boolean = false
  ): DataFrame = {
    val spark = docs.sparkSession
    // the store's banding must equal the pipeline's or the appended rows
    // would never collide with future probes — check BEFORE doing work
    storePath.foreach { p =>
      val m = SignatureStore.readMeta(spark, p)
      require(m.k == k && m.bands == bands && m.shingleN == shingleN,
        s"store $p has (k=${m.k}, bands=${m.bands}, shingleN=${m.shingleN})" +
          s" but the pipeline runs (k=$k, bands=$bands, shingleN=$shingleN)" +
          " — appending differently-banded signatures would silently miss" +
          " every future near-duplicate")
    }
    val keep = keepCols.map(col)
    // THE text pass: hash + shingles + signature in one projection
    val staged = docs.select(
      Seq(col("doc_id")) ++ keep ++ Seq(
        md5(col("text").cast("binary")).as("_h"),
        Dedup.distinctShingles(col("text"), shingleN).as("sh"),
        Dedup.minhashSignature(col("text"), k, shingleN).as("sig")): _*)
      .localCheckpoint()

    // stage 1: decontamination over the staged shingle sets
    val flagged = Decontaminate.contaminationReportOnShingles(
        staged.select(col("doc_id"), col("sh")), bench, shingleN,
        minOverlap, minRatio, broadcastBench)
      .select(col("doc_id")).distinct()
    val r1 = staged.join(flagged, Seq("doc_id"), "left_anti")

    // stage 2: exact dedup, keep min doc_id per content hash
    // (digest-keyed window — uniform by construction, skew-proof)
    val r2 = r1
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_h")).orderBy(col("doc_id"))))
      .where(col("_rn") === 1)
      .drop("_rn")

    // stage 3: near-dup dedup — band the staged signatures (sub-shingle
    // docs gated exactly like the batch path: no shingles, no banding),
    // shared bucket-cap pair stage, verify on the staged shingle sets,
    // CC keep-min representative
    val banded = Dedup.bandRowsFromSigs(
      r2.where(size(col("sh")) > 0).select(col("doc_id"), col("sig")),
      k, bands)
    val pairs = Dedup.jaccardVerifyOnShingles(
      r2.select(col("doc_id"), col("sh")),
      Dedup.candidatePairsFromBanded(banded, maxBucket), minJaccard)
    val drops = Dedup.clustersFromPairs(pairs)
      .where(col("doc_id") =!= col("cluster_rep"))
      .select(col("doc_id"))
    val survivors0 = r2.join(drops, Seq("doc_id"), "left_anti")
    // the store-append tail has THREE more consumers of the survivor
    // frame (the watermark agg and two staged writes) plus the caller's
    // own action — checkpoint once so each reads materialized rows
    // instead of replaying the flagged-join + window + anti-join chain
    val survivors =
      if (storePath.isDefined) survivors0.localCheckpoint() else survivors0

    // stage 4: fold the cleaned corpus into the incremental store with
    // the signatures ALREADY computed in the staged pass (the journaled
    // staged-commit append; no text, no recompute)
    storePath.foreach { p =>
      SignatureStore.appendSignatures(spark, p,
        Dedup.bandRowsFromSigs(
          survivors.where(size(col("sh")) > 0)
            .select(col("doc_id"), col("sig")), k, bands),
        survivors.select(col("doc_id"), col("sh")),
        allowReplay = allowStoreReplay)
    }

    survivors.select(Seq(col("doc_id")) ++ keep: _*)
  }

  /** The cleaning chain as a full corpus TRANSFORM: input rows minus
    * contaminated documents, exact-duplicate non-representatives, and
    * near-duplicate non-representatives. The id-level chain reads corpus
    * text once; re-attaching the payload for output is one more scan on
    * the write side (semi-join on id — broadcastable when survivors of a
    * partition-sized slice are listed, shuffled-hash otherwise). */
  def clean(
      docs: DataFrame,
      bench: DataFrame,
      k: Int = 32,
      bands: Int = 8,
      shingleN: Int = 3,
      maxBucket: Int = 64,
      minJaccard: Double = 0.8,
      minOverlap: Int = 5,
      minRatio: Double = 0.0,
      broadcastBench: Boolean = true,
      storePath: Option[String] = None,
      allowStoreReplay: Boolean = false
  ): DataFrame =
    docs.join(
      cleanedMeta(docs, bench, Nil, k, bands, shingleN, maxBucket,
        minJaccard, minOverlap, minRatio, broadcastBench, storePath,
        allowStoreReplay),
      Seq("doc_id"), "left_semi")
}
