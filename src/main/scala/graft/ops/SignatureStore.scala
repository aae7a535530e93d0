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
  * signature ([[Dedup.bandedSignatures]]) and verify through the SAME
  * shingle representation ([[Dedup.distinctShingleSets]]), so
  * `probe(store, batch)` emits exactly the batch-touching subset of what
  * the batch path `jaccardVerify(lshCandidatePairs(old ∪ batch))` emits
  * (spec-asserted on a planted fixture).
  */
object SignatureStore {

  /** Ingest-time write: band keys + shingle sets for `docs(doc_id, text)`,
    * partitioned for probe-time pruning. `nPrefixes` trades partition
    * count against pruning granularity (web scale: 1024+). */
  def write(
      docs: DataFrame,
      path: String,
      nPrefixes: Int = 64,
      k: Int = 32,
      bands: Int = 8,
      shingleN: Int = 3
  ): Unit = {
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
    // so P travels WITH the store, never as a caller-remembered argument
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/_store_meta.json"),
      s"""{"nPrefixes":$nPrefixes,"k":$k,"bands":$bands,"shingleN":$shingleN}""")
  }

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
  ): DataFrame = {
    val m = readMeta(path)
    val (k, bands, shingleN) = (m.k, m.bands, m.shingleN)
    // batch-side keys and shingles: batch-sized, computed once
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

    // 2. exact (band, bh) match via broadcast of the batch keys — the
    //    pruned store side streams, nothing shuffles
    val collided = oldBands
      .join(broadcast(bKeys.select(col("band"), col("bh"),
        col("doc_id").as("new_id"))), Seq("band", "bh"))
    // boilerplate cap per bucket, old side (same guard as the batch path)
    val capW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bh"), col("new_id"))
      .orderBy(col("doc_id"))
    val crossPairs = collided
      .withColumn("_rn", row_number().over(capW))
      .where(col("_rn") <= maxBucket)
      .select(col("doc_id").as("id1"), col("new_id").as("id2"))
      .where(col("id1") =!= col("id2"))
      .select(least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2"))
      .distinct()

    // 3. new↔new pairs: the plain batch path over the batch alone
    val withinPairs = Dedup.lshCandidatePairs(batch, k, bands, shingleN,
      maxBucket)

    val pairs = crossPairs.unionByName(withinPairs).distinct()
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

    Dedup.jaccardVerifyOnShingles(oldSh.unionByName(bSh), pairs, minJaccard)
  }

  /** Fold a deduplicated batch INTO the store — the production loop's
    * second half (probe → drop/keep decisions upstream → append the
    * survivors so the NEXT batch dedups against them too). Band keys and
    * shingle sets are derived with the store's own metadata parameters
    * and appended into the existing prefix partitions. */
  def append(spark: SparkSession, path: String, batch: DataFrame): Unit = {
    val m = readMeta(path)
    Dedup.bandedSignatures(batch, m.k, m.bands, m.shingleN)
      .withColumn("bh_pfx", pmod(col("bh"), lit(m.nPrefixes.toLong)))
      .repartition(col("bh_pfx"))
      .write.mode("append").partitionBy("bh_pfx")
      .parquet(s"$path/bands")
    Dedup.distinctShingleSets(batch, m.shingleN)
      .withColumn("doc_pfx", pmod(col("doc_id"), lit(m.nPrefixes.toLong)))
      .repartition(col("doc_pfx"))
      .write.mode("append").partitionBy("doc_pfx")
      .parquet(s"$path/shingles")
  }

  private final case class Meta(nPrefixes: Int, k: Int, bands: Int,
      shingleN: Int)

  /** The store's signature parameters, read from the layout's own
    * metadata (written by [[write]]) so probes/appends cannot silently
    * use different banding than ingest did. */
  private def readMeta(path: String): Meta = {
    val meta = java.nio.file.Paths.get(s"$path/_store_meta.json")
    require(java.nio.file.Files.exists(meta),
      s"$path/_store_meta.json missing — was the store written with " +
        "SignatureStore.write?")
    val json = java.nio.file.Files.readString(meta)
    def field(name: String): Int = {
      val m = (s""""$name"\\s*:\\s*(\\d+)""").r.findFirstMatchIn(json)
      require(m.isDefined, s"malformed $meta (missing $name): $json")
      m.get.group(1).toInt
    }
    Meta(field("nPrefixes"), field("k"), field("bands"), field("shingleN"))
  }
}
