package graft.ops

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
    // THE text pass: hash + shingles + signature in one projection. The
    // shingle sets carry the at-rest HASHED representation
    // ([[Dedup.hashShingles]]): every consumer below (decontamination
    // overlap counts, Jaccard verify, the store append) is
    // cardinality-arithmetic over the sets, which hashing preserves,
    // and the staged artifact drops ~2.5× in bytes.
    val staged = docs.select(
      Seq(col("doc_id")) ++ keep ++ Seq(
        md5(col("text").cast("binary")).as("_h"),
        Dedup.hashShingles(
          Dedup.distinctShingles(col("text"), shingleN)).as("sh"),
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
    // CC keep-min representative. The drop-filter anti-joins touch only
    // the (doc_id, sig) projection; the verify join reads the heavy
    // shingle column from the UNfiltered staged frame — candidate ids
    // came from banding over r2, so they already exclude every dropped
    // document, and the shingle sets never ride through an anti-join
    // exchange. The verify side is further semi-join-REDUCED to the
    // candidate population before its two heavy joins
    // ([[Dedup.jaccardVerifyOnShinglesReduced]]).
    val banded = Dedup.bandRowsFromSigs(
      r2.where(size(col("sh")) > 0).select(col("doc_id"), col("sig")),
      k, bands)
    // candidates are id pairs — tiny next to the corpus. Checkpointing
    // them (a) makes the broadcast gate's count free and (b) keeps the
    // banding/candidate shuffle from re-running under the verify joins
    // and the CC loop.
    val cand = Dedup.candidatePairsFromBanded(banded, maxBucket)
      .localCheckpoint()
    // checkpoint the candidate-population reduction too: the verify plan
    // reads its shingle side twice (id1/id2), and materializing the
    // candidate-sized reduced frame turns two heavy staged-column scans
    // into one
    val reduced = Dedup.reduceShingleSetsToPairs(
        staged.select(col("doc_id"), col("sh")), cand,
        broadcastIds = 2 * cand.count() <= Dedup.BroadcastIdsGuidance)
      .localCheckpoint()
    val pairs = Dedup.jaccardVerifyOnShingles(reduced, cand, minJaccard)
    val survivors0 =
      r2.join(Dedup.nearDupDropIds(pairs), Seq("doc_id"), "left_anti")
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

  // ---- parquet-staged, resumable chain ---------------------------------

  /** [[cleanedMeta]] in its multi-job operational shape: the one-pass
    * `(doc_id, keep…, _h, sh, sig)` projection is staged to PARQUET under
    * `stageDir` instead of `localCheckpoint`, and every stage persists
    * its (id-only, tiny) output with a completion marker, so a crashed
    * chain RESUMES from the last completed stage without re-scanning
    * corpus text. At 100 TB the cleaning chain is a multi-hour job; with
    * `localCheckpoint` staging a failure anywhere re-runs everything and
    * the staged artifact (≈ corpus-text-sized) lives in executor
    * memory/spill — here it lives at rest, any stage re-reads only the
    * columns it needs (the text column does not exist in the staged
    * table at all), and the whole run is restartable per stage, the same
    * manifest-resume discipline as
    * [[graft.pipeline.KgPipeline.runResumable]].
    *
    * Layout under `stageDir` (each stage gated on its own parquet
    * `_SUCCESS` marker — a write that died mid-stage is rewritten, never
    * trusted):
    *
    *  - `_params`       — the run's parameters; a resume with DIFFERENT
    *                      parameters refuses loudly (staged signatures
    *                      computed under k/bands/shingleN are not valid
    *                      under others).
    *  - `staged/`       — THE text pass: hash + shingles + signature.
    *  - `stage1_flagged/`, `stage2_exact_drops/`, `stage3_near_drops/`
    *                    — per-stage dropped-id sets.
    *  - `stage4_store_attempt` / `stage4_store_done` — markers around
    *                      the (journaled, crash-recoverable) store
    *                      append, so a resume neither skips nor
    *                      double-runs it (see [[SignatureStore.recover]]).
    *  - `_manifest/`    — per-stage lineage: `(stage, rows, wall_ms)`.
    *
    * CONTRACT (same as KgPipeline staging): the run binds to the FIRST
    * input staged into `stageDir` — resuming with different/extra `docs`
    * or `bench` rows processes the staged corpus and the persisted
    * flagged set, not the new input; a new input needs a new `stageDir`.
    * Single writer per `stageDir`. `broadcastBench` is an execution
    * hint, not semantics, so it is not part of the parameter manifest.
    * Stage-dir paths are driver-local by the sandbox contract (the
    * KgPipeline note applies verbatim); a cluster deployment swaps the
    * java.nio checks for the Hadoop FileSystem API. A crash between a
    * stage's parquet write and its manifest append loses that stage's
    * `_manifest` ROW only — the stage itself (gated on `_SUCCESS`, not
    * the manifest) resumes correctly.
    */
  def cleanedMetaResumable(
      docs: DataFrame,
      bench: DataFrame,
      stageDir: String,
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
  ): DataFrame =
    runStages(docs, bench, stageDir, keepCols, k, bands, shingleN,
      maxBucket, minJaccard, minOverlap, minRatio, broadcastBench,
      storePath, allowStoreReplay, upTo = 4).get

  /** Per-stage lineage/metrics view over a resumable run's manifest. */
  def manifest(spark: SparkSession, stageDir: String): DataFrame =
    spark.read.parquet(s"$stageDir/_manifest")

  /** [[clean]] over the resumable chain: the full-row corpus transform,
    * with the id-level work staged/resumed under `stageDir`. The payload
    * re-attach is the one deliberate second text scan (write-side). */
  def cleanResumable(
      docs: DataFrame,
      bench: DataFrame,
      stageDir: String,
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
      cleanedMetaResumable(docs, bench, stageDir, Nil, k, bands, shingleN,
        maxBucket, minJaccard, minOverlap, minRatio, broadcastBench,
        storePath, allowStoreReplay),
      Seq("doc_id"), "left_semi")

  private def hasSuccess(dir: String): Boolean =
    Files.exists(Paths.get(s"$dir/_SUCCESS"))

  /** Atomic (temp + move) parameter-manifest write. On resume the
    * banding/threshold parameters must equal the stored manifest EXACTLY
    * (staged signatures computed under one banding are not valid under
    * another); `keepCols` is compatibility-checked as a SUBSET instead —
    * the staged table carries the BINDING run's keep columns, so a
    * caller asking for fewer (e.g. [[cleanResumable]]'s id-only needs)
    * reads a strict subset of what is staged. Returns the effective
    * (binding-run) keep columns, which stage 0 must stage if it still
    * has to run. */
  private def checkOrWriteParams(stageDir: String, core: String,
      keepCols: Seq[String]): Seq[String] = {
    val p = Paths.get(s"$stageDir/_params")
    if (Files.exists(p)) {
      val stored = new String(Files.readAllBytes(p), "UTF-8")
      val lines = stored.split("\n", -1).toSeq
      val storedCore = lines
        .filterNot(l => l.startsWith("keepCols=") ||
          l.startsWith("shRepr=") || l.isEmpty)
        .mkString("\n")
      val storedKeep = lines.find(_.startsWith("keepCols="))
        .map(_.stripPrefix("keepCols=")).getOrElse("")
        .split(",").filter(_.nonEmpty).toSeq
      require(storedCore == core,
        s"resume into $stageDir with different parameters — staged " +
          s"artifacts were computed under:\n$storedCore\nbut this run " +
          s"asks for:\n$core\nUse a new stageDir (or the original " +
          "parameters).")
      // the staged shingle sets' at-rest representation must match what
      // THIS engine computes (ADVICE r6): were the hash function/seed
      // ever to change, a resumed dir's overlap joins would silently
      // match nothing. Absent on legacy dirs — there the element-type
      // schema fallback (`shForStore`) is the only guard available.
      lines.find(_.startsWith("shRepr=")).map(_.stripPrefix("shRepr="))
        .foreach(storedRepr =>
          require(storedRepr == SignatureStore.ShRepr,
            s"resume into $stageDir staged shingle sets under " +
              s"representation '$storedRepr' but this engine computes " +
              s"'${SignatureStore.ShRepr}' — overlap joins across " +
              "representations match nothing; use a new stageDir"))
      storedKeep
    } else {
      Files.createDirectories(p.getParent)
      val tmp = Paths.get(s"$stageDir/._params.tmp")
      Files.write(tmp,
        (s"$core\nshRepr=${SignatureStore.ShRepr}\n" +
          s"keepCols=${keepCols.mkString(",")}\n").getBytes("UTF-8"))
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
      keepCols
    }
  }

  /** Runs stages 0..`upTo` (0=staging text pass, 1=decontaminate,
    * 2=exact drops, 3=near-dup drops, 4=store append), skipping stages
    * whose output already carries a completion marker. Returns the
    * survivor frame once stage 3 is available and `upTo` ≥ 4.
    * Package-private so the spec can kill the chain between stages and
    * resume it. */
  private[graft] def runStages(
      docs: DataFrame,
      bench: DataFrame,
      stageDir: String,
      keepCols: Seq[String],
      k: Int, bands: Int, shingleN: Int, maxBucket: Int,
      minJaccard: Double, minOverlap: Int, minRatio: Double,
      broadcastBench: Boolean,
      storePath: Option[String],
      allowStoreReplay: Boolean,
      upTo: Int
  ): Option[DataFrame] = {
    val spark = docs.sparkSession
    // parameter validation FIRST (ADVICE r6): `core` pins storePath, so a
    // resume mistakenly pointed at a DIFFERENT store refuses here —
    // before the recover() below could replay that store's pending
    // journal (which may belong to another in-flight writer's commit)
    val stagedKeep = checkOrWriteParams(stageDir,
      s"k=$k\nbands=$bands\nshingleN=$shingleN\nmaxBucket=$maxBucket\n" +
        s"minJaccard=$minJaccard\nminOverlap=$minOverlap\n" +
        s"minRatio=$minRatio\n" +
        s"storePath=${storePath.getOrElse("")}",
      keepCols)
    storePath.foreach { p =>
      // a prior attempt that crashed INSIDE the store's commit window
      // leaves the journal present and the metadata deleted — the plain
      // readMeta below would refuse loudly and the recover() inside
      // stage 4 would never be reached. The attempt marker proves the
      // interrupted commit is OURS (single-writer contract, and the
      // params check above proved this resume targets the same store),
      // so replay it before reading the metadata.
      if (Files.exists(Paths.get(s"$stageDir/stage4_store_attempt")))
        SignatureStore.recover(spark, p)
      val m = SignatureStore.readMeta(spark, p)
      require(m.k == k && m.bands == bands && m.shingleN == shingleN,
        s"store $p has (k=${m.k}, bands=${m.bands}, shingleN=${m.shingleN})" +
          s" but the pipeline runs (k=$k, bands=$bands, shingleN=$shingleN)" +
          " — appending differently-banded signatures would silently miss" +
          " every future near-duplicate")
    }

    val stagedDir = s"$stageDir/staged"
    val flaggedDir = s"$stageDir/stage1_flagged"
    val exactDir = s"$stageDir/stage2_exact_drops"
    val nearDir = s"$stageDir/stage3_near_drops"
    val manifestDir = s"$stageDir/_manifest"

    var t0 = System.nanoTime()
    // r8 (guide §1.4/§5): the manifest row count is OBSERVED on the
    // stage's own write job (`Dataset.observe` — metrics accumulate
    // during the write) instead of re-reading the freshly written
    // parquet. The former read-back count was one extra job per stage —
    // and for stage 0 a full scan of the corpus-sized staged artifact
    // just to count its rows.
    def observed(stage: Int, df: DataFrame): (DataFrame, () => Long) = {
      val obs = org.apache.spark.sql.Observation(s"stage$stage rows")
      (df.observe(obs, count(lit(1)).as("rows")),
        () => obs.get("rows").asInstanceOf[Long])
    }
    def record(stage: Int, rows: Long): Unit = {
      import spark.implicits._
      Seq((stage, rows, (System.nanoTime() - t0) / 1000000L))
        .toDF("stage", "rows", "wall_ms")
        .write.mode(SaveMode.Append).parquet(manifestDir)
    }

    // stage 0 — THE text pass, at rest (staging the BINDING run's keep
    // columns, a superset of this caller's). `nsh` carries the shingle
    // count as its own tiny column so stage 3's sub-shingle gate never
    // has to decode the heavy `sh` array just to take its size.
    if (!hasSuccess(stagedDir)) {
      val (df0, rows0) = observed(0, docs.select(
          Seq(col("doc_id")) ++ stagedKeep.map(col) ++ Seq(
            md5(col("text").cast("binary")).as("_h"),
            Dedup.hashShingles(
              Dedup.distinctShingles(col("text"), shingleN)).as("sh"),
            Dedup.minhashSignature(col("text"), k, shingleN).as("sig")): _*)
        .withColumn("nsh", size(col("sh"))))
      df0
        // the staged table's codec is DELIBERATELY not pinned: an
        // un-optioned parquet write follows the session's standard
        // `spark.sql.parquet.compression.codec` (default snappy), so a
        // deployment whose staging storage is bandwidth-starved flips to
        // zstd by conf, no code change. The 20M A/B (BENCH.md round-6
        // ladders) read: at 8 cores the codecs are indistinguishable
        // inside the ±25% ambient-disk band; at 32 cores zstd's stage-3
        // medians ran ~15% ahead (fewer bytes off the slow shared disk,
        // decode parallelism ample) — suggestive, below conclusive.
        // Decode-cheap snappy stays the default for a transient
        // intra-job artifact; the long-lived CORPUS is where the
        // round-5 zstd-at-rest recommendation applies.
        .write.mode(SaveMode.Overwrite).parquet(stagedDir)
      record(0, rows0())
    }
    def staged = spark.read.parquet(stagedDir)
    // stage dirs staged before the nsh column existed resume fine — the
    // gate falls back to sizing the array
    def shCount =
      if (spark.read.parquet(stagedDir).columns.contains("nsh")) col("nsh")
      else size(col("sh"))
    // stage dirs staged before shingle sets were hashed at rest resume
    // fine too: decontamination adapts its bench side to the staged
    // element type, Jaccard is representation-agnostic, and only the
    // store append — whose contract IS hashed — re-hashes on the way out
    def shForStore =
      staged.schema("sh").dataType match {
        case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, _) => col("sh")
        case _ => Dedup.hashShingles(col("sh")).as("sh")
      }
    if (upTo < 1) return None

    // stage 1 — decontamination flags over the staged shingle sets
    t0 = System.nanoTime()
    if (!hasSuccess(flaggedDir)) {
      val (df1, rows1) = observed(1,
        Decontaminate.contaminationReportOnShingles(
            staged.select(col("doc_id"), col("sh")), bench, shingleN,
            minOverlap, minRatio, broadcastBench)
          .select(col("doc_id")).distinct())
      df1.write.mode(SaveMode.Overwrite).parquet(flaggedDir)
      record(1, rows1())
    }
    def flagged = spark.read.parquet(flaggedDir)
    if (upTo < 2) return None

    // stage 2 — exact-duplicate drops (digest-keyed window, hash+id only)
    t0 = System.nanoTime()
    if (!hasSuccess(exactDir)) {
      val (df2, rows2) = observed(2,
        staged.select(col("doc_id"), col("_h"))
          .join(flagged, Seq("doc_id"), "left_anti")
          .withColumn("_rn", row_number().over(
            Window.partitionBy(col("_h")).orderBy(col("doc_id"))))
          .where(col("_rn") > 1)
          .select(col("doc_id")))
      df2.write.mode(SaveMode.Overwrite).parquet(exactDir)
      record(2, rows2())
    }
    def exactDrops = spark.read.parquet(exactDir)
    if (upTo < 3) return None

    // stage 3 — near-dup drops from the staged signatures/shingles. The
    // drop-filter anti-joins run over the (doc_id, sig) projection only;
    // the verify join reads the heavy shingle column straight from the
    // staged table (candidate ids came from banding over the filtered
    // frame, so they already exclude every dropped document) — the
    // shingle sets never ride through an anti-join exchange, and the
    // verify side is semi-join-reduced to the candidate population
    // before its two heavy joins.
    t0 = System.nanoTime()
    if (!hasSuccess(nearDir)) {
      val sigs = staged
        .where(shCount > 0).select(col("doc_id"), col("sig"))
        .join(flagged, Seq("doc_id"), "left_anti")
        .join(exactDrops, Seq("doc_id"), "left_anti")
      // candidate id pairs checkpointed once: the broadcast gate's count
      // is then free, and neither the verify joins nor the CC loop
      // re-runs the banding/candidate shuffle. The candidate-population
      // reduction is checkpointed too, so the heavy at-rest `sh` column
      // is scanned ONCE here instead of once per verify join side —
      // at 20M docs that is ~9.5 GB of core-invariant disk read saved.
      // lazy checkpoints (r8): the broadcast-gate count materializes the
      // candidate frame (and the staged scan feeding it) in its one job;
      // the reduced frame materializes under the verify/CC job — the
      // former eager checkpoints each spent a dedicated job first
      val cand = Dedup.candidatePairsFromBanded(
          Dedup.bandRowsFromSigs(sigs, k, bands), maxBucket)
        .localCheckpoint(eager = false)
      val reduced = Dedup.reduceShingleSetsToPairs(
          staged.select(col("doc_id"), col("sh")), cand,
          broadcastIds = 2 * cand.count() <= Dedup.BroadcastIdsGuidance)
        .localCheckpoint(eager = false)
      val pairs = Dedup.jaccardVerifyOnShingles(reduced, cand, minJaccard)
      val (df3, rows3) = observed(3, Dedup.nearDupDropIds(pairs))
      df3.write.mode(SaveMode.Overwrite).parquet(nearDir)
      record(3, rows3())
    }
    def nearDrops = spark.read.parquet(nearDir)
    def survivorIds(cols: Seq[String]) =
      staged.select(cols.map(col): _*)
        .join(flagged, Seq("doc_id"), "left_anti")
        .join(exactDrops, Seq("doc_id"), "left_anti")
        .join(nearDrops, Seq("doc_id"), "left_anti")
    if (upTo < 4) return None

    // stage 4 — fold survivors into the incremental store (signatures
    // already at rest; the append itself is a journaled staged commit)
    storePath.foreach { sp =>
      val done = Paths.get(s"$stageDir/stage4_store_done")
      val attempt = Paths.get(s"$stageDir/stage4_store_attempt")
      if (!Files.exists(done)) {
        t0 = System.nanoTime()
        val attempted = Files.exists(attempt)
        // the attempt marker carries this run's commit tag, so a resumed
        // attempt asks the STORE whether this exact append committed —
        // a POSITIVE record (ADVICE r6) instead of the old watermark
        // inference, which wrongly skipped the append when the watermark
        // already covered the batch ids for another reason (an
        // allowStoreReplay re-run, or a store advanced by a later batch)
        // after a crash BEFORE the commit.
        val tag =
          if (attempted)
            new String(Files.readAllBytes(attempt), "UTF-8").trim
          else {
            val t = java.util.UUID.randomUUID().toString
            Files.write(attempt, t.getBytes("UTF-8"))
            t
          }
        // finish any journaled commit a crashed attempt left behind —
        // after this the store is consistent: the prior append either
        // fully committed (metadata then carries its tag) or never
        // touched the live store
        SignatureStore.recover(spark, sp)
        val surv = survivorIds(Seq("doc_id", "sh", "sig"))
        val alreadyIn =
          if (attempted && tag.nonEmpty)
            SignatureStore.readMeta(spark, sp).lastCommitTag == tag
          else if (attempted) {
            // legacy attempt marker without a tag: the old watermark
            // inference, but REFUSED under allowStoreReplay where it is
            // exactly ambiguous (a redundant replayed append is
            // at-least-once-safe; a wrongly skipped one silently loses
            // the batch's signatures)
            val mxRow = surv.agg(max(col("doc_id").cast("long"))).head()
            !allowStoreReplay && !mxRow.isNullAt(0) &&
              SignatureStore.readMeta(spark, sp).maxDocId >= mxRow.getLong(0)
          } else false
        if (!alreadyIn) {
          SignatureStore.appendSignatures(spark, sp,
            Dedup.bandRowsFromSigs(
              surv.where(size(col("sh")) > 0)
                .select(col("doc_id"), col("sig")), k, bands),
            surv.select(col("doc_id"), shForStore),
            allowReplay = allowStoreReplay || attempted,
            commitTag = Some(tag))
        }
        Files.createFile(done)
        import spark.implicits._
        Seq((4, 0L, (System.nanoTime() - t0) / 1000000L))
          .toDF("stage", "rows", "wall_ms")
          .write.mode(SaveMode.Append).parquet(manifestDir)
      }
    }

    Some(survivorIds("doc_id" +: keepCols))
  }
}
