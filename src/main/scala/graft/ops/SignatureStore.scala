package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-dup dedup against a PERSISTED signature store — the
  * IVF-physical-layout move ([[Ann.writeIvfLayout]]) applied to MinHash:
  * band keys and distinct shingle sets are written once at ingest with a
  * partition column derived from their lookup key, so deduplicating a NEW
  * batch reads only the partitions its own keys hash into — never a full
  * corpus rescan, and never corpus text at all (verification runs against
  * the persisted shingle sets).
  *
  * Layout (under `path`):
  *  - `bands/`    (doc_id, band, bh)  partitioned by `bh_pfx  = pmod(bh, P)`
  *  - `shingles/` (doc_id, sh)        partitioned by `doc_pfx = pmod(doc_id, P)`
  *
  * Probe reads prune at the SOURCE via `isin` on the partition column
  * (PartitionFilters — the same mechanism PlanSpec asserts for IVF): the
  * batch's distinct `bh_pfx` values (≤ P literals, collected from a
  * batch-sized table) select the band partitions, then the colliding old
  * doc_ids' `doc_pfx` values select the shingle partitions. A batch much
  * smaller than P × (corpus/P) therefore reads ~|batch keys| partitions'
  * worth of store bytes, not the corpus. For a batch approaching corpus
  * size the prefixes saturate and the probe degrades gracefully to a full
  * store scan — still id+shingle data, never the raw text.
  *
  * Exactness: the store and the batch derive band keys through the SAME
  * signature ([[Dedup.bandedSignatures]]), the bucket cap + pair stage is
  * the SAME code over the merged old∪batch membership
  * ([[Dedup.candidatePairsFromBanded]]), and verification uses the SAME
  * shingle representation ([[Dedup.distinctShingleSets]]) — so
  * `probe(store, batch)` emits exactly the batch-touching subset of what
  * the batch path `jaccardVerify(lshCandidatePairs(old ∪ batch))` emits,
  * including on degenerate buckets where the cap bites (spec-asserted on
  * planted fixtures).
  */
object SignatureStore {

  /** Ingest-time write: band keys + shingle sets for `docs(doc_id, text)`,
    * partitioned for probe-time pruning. `nPrefixes` trades partition
    * count against pruning granularity (web scale: 1024+).
    *
    * Failure discipline: the metadata file is DELETED first and rewritten
    * only after both data writes succeed, so a mid-write crash leaves a
    * store with no metadata — [[probe]]/[[append]] then refuse LOUDLY
    * instead of silently probing new partitions with stale parameters. */
  def write(
      docs: DataFrame,
      path: String,
      nPrefixes: Int = 64,
      k: Int = 32,
      bands: Int = 8,
      shingleN: Int = 3
  ): Unit = {
    val spark = docs.sparkSession
    deleteMeta(spark, path)
    Dedup.bandedSignatures(docs, k, bands, shingleN)
      .withColumn("bh_pfx", pmod(col("bh"), lit(nPrefixes.toLong)))
      .repartition(col("bh_pfx"))
      .write.mode("overwrite").partitionBy("bh_pfx")
      .parquet(s"$path/bands")
    Dedup.distinctShingleSets(docs, shingleN)
      .withColumn("doc_pfx", pmod(col("doc_id"), lit(nPrefixes.toLong)))
      .repartition(col("doc_pfx"))
      .write.mode("overwrite").partitionBy("doc_pfx")
      .parquet(s"$path/shingles")
    // the partition modulus is part of the layout contract: a probe with
    // a different P computes prefixes that miss the written partitions,
    // so P travels WITH the store, never as a caller-remembered argument.
    // sigVersion pins the HASH ALGORITHM itself — band hashes from a
    // different signature implementation never collide with recomputed
    // batch hashes, so a version drift would silently admit every
    // near-duplicate; readMeta refuses loudly instead.
    writeMeta(spark, path, metaJson(nPrefixes, k, bands, shingleN))
  }

  /** Version of the signature hash function persisted in band keys.
    * 2 = byte-level FNV-1a over UTF-8 ([[graft.functions.MinHashSig]]);
    * 1 was the historical char-level Scala UDF. Bump whenever the hash
    * bits change — stores must be re-ingested, not silently probed. */
  val SigVersion: Int = 2

  private def metaJson(nPrefixes: Int, k: Int, bands: Int,
      shingleN: Int): String =
    s"""{"nPrefixes":$nPrefixes,"k":$k,"bands":$bands,""" +
      s""""shingleN":$shingleN,"sigVersion":$SigVersion}"""

  /** Incremental probe: verified near-dup pairs `(id1, id2, jaccard)`
    * between `batch(doc_id, text)` and the store, PLUS pairs within the
    * batch itself. Old↔old pairs are by design absent — the corpus was
    * already deduplicated when the store was written.
    *
    * Signature parameters (k, bands, shingleN, prefix modulus) are read
    * from the store's OWN metadata, never passed by the caller — a probe
    * banding differently than ingest silently misses every pair.
    *
    * `maxBucket` caps collisions per (band, bh) bucket exactly like the
    * batch path (boilerplate guard). Batch doc_ids must be disjoint from
    * stored ones.
    */
  def probe(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      maxBucket: Int = 64,
      minJaccard: Double = 0.8
  ): DataFrame =
    probeWithSignatures(spark, path, batch, maxBucket, minJaccard)._1

  /** As [[probe]], additionally returning the batch's checkpointed band
    * keys and shingle sets — callers that go on to [[appendSignatures]]
    * (the streaming loop) reuse them instead of paying the signature
    * expression a second time over the survivors. */
  def probeWithSignatures(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      maxBucket: Int = 64,
      minJaccard: Double = 0.8
  ): (DataFrame, DataFrame, DataFrame) = {
    val m = readMeta(spark, path)
    val (k, bands, shingleN) = (m.k, m.bands, m.shingleN)
    // batch-side keys and shingles: batch-sized, computed ONCE (the
    // native MinHashSig expression is the dominant per-row cost — the
    // checkpointed keys feed both the prefix collect and the unified
    // pair stage below)
    val bKeys = Dedup.bandedSignatures(batch, k, bands, shingleN)
      .localCheckpoint()
    val bSh = Dedup.distinctShingleSets(batch, shingleN).localCheckpoint()

    // 1. band partitions the batch can possibly collide into: ≤ nPrefixes
    //    literal values — a driver-side collect bounded by the partition
    //    fan-out, NOT by batch or corpus size
    val bhPfx = bKeys.select(pmod(col("bh"), lit(m.nPrefixes.toLong))
        .as("p")).distinct().collect().map(_.getLong(0))
    val oldBands = spark.read.parquet(s"$path/bands")
      .where(col("bh_pfx").isin(bhPfx.map(java.lang.Long.valueOf): _*))

    // 2. ONE pair stage over the merged bucket membership: old members of
    //    buckets the batch collides into (left-semi vs the broadcast
    //    batch keys — the pruned store side streams, nothing shuffles)
    //    unioned with ALL batch keys, then the EXACT batch-path cap and
    //    pair generation (Dedup.candidatePairsFromBanded). Running the
    //    cap over the merged membership is what makes probe ≡ the
    //    batch-touching subset of lshCandidatePairs(old ∪ batch) even on
    //    degenerate buckets — a per-side cap would keep a new doc the
    //    batch path's smallest-ids cap evicts.
    val batchBuckets = broadcast(bKeys.select(col("band"), col("bh")))
    val members = oldBands.select(col("doc_id"), col("band"), col("bh"))
      .join(batchBuckets, Seq("band", "bh"), "left_semi")
      .unionByName(bKeys.select(col("doc_id"), col("band"), col("bh")))
      // tolerate duplicate store rows (an at-least-once append retry can
      // re-append a batch): dedup the COLLIDING membership — bounded by
      // collisions + batch size, never corpus-scale — so duplicates
      // neither waste cap slots nor pair with themselves
      .dropDuplicates("doc_id", "band", "bh")
    val allPairs = Dedup.candidatePairsFromBanded(members, maxBucket)
    // keep only pairs touching the batch (old↔old pairs inside a
    // colliding bucket were already handled when the store was built)
    val batchIds = bSh.select(col("doc_id"))
    val pairs = allPairs
      .join(broadcast(batchIds.select(col("doc_id").as("id1"),
        lit(1).as("_n1"))), Seq("id1"), "left")
      .join(broadcast(batchIds.select(col("doc_id").as("id2"),
        lit(1).as("_n2"))), Seq("id2"), "left")
      .where(col("_n1").isNotNull || col("_n2").isNotNull)
      .select(col("id1"), col("id2"))
      .localCheckpoint()

    // 4. old shingle sets for exactly the colliding docs: prune the
    //    shingle partitions by the colliding ids' prefixes, then
    //    broadcast-semi-join the (bounded) candidate id set
    val oldIds = pairs.select(col("id1").as("doc_id"))
      .unionByName(pairs.select(col("id2").as("doc_id")))
      .join(bSh.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .distinct().localCheckpoint()
    val docPfx = oldIds.select(
        pmod(col("doc_id"), lit(m.nPrefixes.toLong)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val oldSh =
      if (docPfx.isEmpty)
        bSh.limit(0) // no cross pairs: no store read at all
      else spark.read.parquet(s"$path/shingles")
        .where(col("doc_pfx").isin(docPfx.map(java.lang.Long.valueOf): _*))
        .join(broadcast(oldIds), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("sh"))
        // duplicate-row tolerance, same reason as `members` above: the
        // verify join must see ONE shingle set per doc or pairs duplicate
        .dropDuplicates("doc_id")

    (Dedup.jaccardVerifyOnShingles(oldSh.unionByName(bSh), pairs,
      minJaccard), bKeys, bSh)
  }

  /** Fold a deduplicated batch INTO the store — the production loop's
    * second half (probe → drop/keep decisions upstream → append the
    * survivors so the NEXT batch dedups against them too). Band keys and
    * shingle sets are derived with the store's own metadata parameters
    * and appended into the existing prefix partitions. */
  def append(spark: SparkSession, path: String, batch: DataFrame): Unit = {
    val m = readMeta(spark, path)
    appendSignatures(spark, path,
      Dedup.bandedSignatures(batch, m.k, m.bands, m.shingleN),
      Dedup.distinctShingleSets(batch, m.shingleN))
  }

  /** Append PRE-COMPUTED band keys + shingle sets (must come from this
    * store's own parameters — e.g. the frames [[probeWithSignatures]]
    * returns, filtered to the surviving doc_ids).
    *
    * Same failure discipline as [[write]]: the metadata is removed before
    * the data appends and restored after both succeed, so a crash between
    * the two appends leaves a meta-less store that probes REFUSE loudly —
    * a valid-looking store whose band rows lack shingle sets would
    * instead silently drop every pair those rows produce. */
  def appendSignatures(spark: SparkSession, path: String,
      banded: DataFrame, shingleSets: DataFrame): Unit = {
    val m = readMeta(spark, path)
    deleteMeta(spark, path)
    banded.select(col("doc_id"), col("band"), col("bh"))
      .withColumn("bh_pfx", pmod(col("bh"), lit(m.nPrefixes.toLong)))
      .repartition(col("bh_pfx"))
      .write.mode("append").partitionBy("bh_pfx")
      .parquet(s"$path/bands")
    shingleSets.select(col("doc_id"), col("sh"))
      .withColumn("doc_pfx", pmod(col("doc_id"), lit(m.nPrefixes.toLong)))
      .repartition(col("doc_pfx"))
      .write.mode("append").partitionBy("doc_pfx")
      .parquet(s"$path/shingles")
    writeMeta(spark, path,
      metaJson(m.nPrefixes, m.k, m.bands, m.shingleN))
  }

  private final case class Meta(nPrefixes: Int, k: Int, bands: Int,
      shingleN: Int)

  // metadata goes through the Hadoop filesystem of the store path — the
  // same filesystem the parquet tables live on — so the store works on
  // hdfs://, s3a://, and shared mounts, not just the driver's local disk
  private def metaPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_store_meta.json")
  private def fs(spark: SparkSession, path: String) =
    metaPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def deleteMeta(spark: SparkSession, path: String): Unit =
    fs(spark, path).delete(metaPath(path), false)

  private def writeMeta(spark: SparkSession, path: String,
      json: String): Unit = {
    val out = fs(spark, path).create(metaPath(path), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** The store's signature parameters, read from the layout's own
    * metadata (written by [[write]]) so probes/appends cannot silently
    * use different banding than ingest did. */
  private def readMeta(spark: SparkSession, path: String): Meta = {
    val f = fs(spark, path)
    val p = metaPath(path)
    require(f.exists(p),
      s"$path/_store_meta.json missing — was the store written with " +
        "SignatureStore.write? (an interrupted write deletes it first, " +
        "so a meta-less store is an incomplete one)")
    val in = f.open(p)
    val json =
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    def field(name: String): Int = {
      val m = (s""""$name"\\s*:\\s*(\\d+)""").r.findFirstMatchIn(json)
      require(m.isDefined, s"malformed $p (missing $name): $json")
      m.get.group(1).toInt
    }
    val version =
      (""""sigVersion"\s*:\s*(\d+)""").r.findFirstMatchIn(json)
        .map(_.group(1).toInt).getOrElse(1)
    require(version == SigVersion,
      s"$p was written with signature version $version, this engine " +
        s"computes version $SigVersion — band hashes from different " +
        "versions never collide, so probing would silently admit every " +
        "near-duplicate. Re-ingest the store with SignatureStore.write.")
    Meta(field("nPrefixes"), field("k"), field("bands"), field("shingleN"))
  }
}
