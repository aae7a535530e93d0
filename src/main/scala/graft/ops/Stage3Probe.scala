package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic decomposition of the cleaning chain's near-dup stage
  * (stage 3) — times each sub-step in isolation over the CleaningBench
  * corpus so the scaling ladder's per-stage narrative is measured, not
  * inferred. Each step is materialized (localCheckpoint + count) before
  * the next is timed, so a step's wall includes exactly its own shuffles.
  *
  * Usage: runMain graft.ops.Stage3Probe <cores> [nDocs=2000000]
  * (requires /tmp/graft_cleaning_corpus_<nDocs> from a CleaningBench run)
  */
object Stage3Probe {

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = if (args.length >= 2) args(1).toLong else 2000000L
    val dir = s"/tmp/graft_cleaning_corpus_$nDocs"
    val (k, bands, shingleN, maxBucket, minJaccard) = (32, 16, 3, 1024, 0.8)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"stage3-probe-$cores")
      .config("spark.sql.shuffle.partitions", math.max(cores * 2, 16))
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      def timed[A](label: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val r = body
        System.err.println(
          f"PROBE $cores $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }

      val stagedDir = Files.createTempDirectory("stage3probe").toString
      timed("stage0_write_staged") {
        spark.read.parquet(s"$dir/docs").select(
            col("doc_id"),
            md5(col("text").cast("binary")).as("_h"),
            Dedup.hashShingles(
              Dedup.distinctShingles(col("text"), shingleN)).as("sh"),
            Dedup.minhashSignature(col("text"), k, shingleN).as("sig"))
          .write.mode(SaveMode.Overwrite).parquet(stagedDir)
      }
      val staged = spark.read.parquet(stagedDir)
      System.err.println(s"PROBE $cores staged_bytes " +
        Files.walk(java.nio.file.Paths.get(stagedDir)).toArray.map {
          case p: java.nio.file.Path if Files.isRegularFile(p) =>
            Files.size(p)
          case _ => 0L
        }.sum)

      // fine decomposition of the banding step, each sub-step isolated
      // behind its own lazy checkpoint
      val bandedCk = timed("band_rows") {
        val b = Dedup.bandRowsFromSigs(
            staged.where(size(col("sh")) > 0).select(col("doc_id"), col("sig")),
            k, bands)
          .localCheckpoint(eager = false)
        System.err.println(s"PROBE $cores banded_n ${b.count()}")
        b
      }
      // banding variant: hash the signature slice as an INT ARRAY (no
      // per-band string build) — candidate-set-equivalent (bijective key
      // change), measured here before any production switch
      timed("band_rows_arrayhash") {
        val rows = k / bands
        val b = staged.where(size(col("sh")) > 0)
          .select(col("doc_id"),
            explode(transform(sequence(lit(0), lit(bands - 1)),
              bN => struct(bN.as("band"),
                xxhash64(slice(col("sig"), bN * rows + 1, lit(rows)))
                  .as("bh")))).as("bb"))
          .select(col("doc_id"), col("bb.band").as("band"),
            col("bb.bh").as("bh"))
          .localCheckpoint(eager = false)
        System.err.println(s"PROBE $cores banded_arrayhash_n ${b.count()}")
      }
      // (the round-6 paired A/B of the bounded-min aggregate vs the
      // row_number-window cap is CLOSED — measured and recorded in
      // BENCH.md; the window twin was retired to BoundedCapSpec in
      // round 7, so the probe no longer carries the comparator)
      val pairs = timed("candidates_from_banded") {
        val p = Dedup.candidatePairsFromBanded(bandedCk, maxBucket)
          .localCheckpoint(eager = false)
        System.err.println(s"PROBE $cores candidates_n ${p.count()}")
        p
      }

      val verified = timed("jaccard_verify") {
        val v = Dedup.jaccardVerifyOnShingles(
            staged.select(col("doc_id"), col("sh")), pairs, minJaccard)
          .localCheckpoint(eager = false)
        System.err.println(s"PROBE $cores verified_n ${v.count()}")
        v
      }
      // A/B: the semi-join-reduced verify, broadcast hint on and off,
      // against the unreduced form above (same JVM, seconds apart)
      (1 to 2).foreach { r =>
        timed(s"verify_reduced_bcast_r$r") {
          System.err.println(s"PROBE $cores verified_reduced_b_n " +
            Dedup.jaccardVerifyOnShinglesReduced(
              staged.select(col("doc_id"), col("sh")), pairs, minJaccard,
              broadcastIds = true).count())
        }
        timed(s"verify_reduced_plain_r$r") {
          System.err.println(s"PROBE $cores verified_reduced_p_n " +
            Dedup.jaccardVerifyOnShinglesReduced(
              staged.select(col("doc_id"), col("sh")), pairs, minJaccard,
              broadcastIds = false).count())
        }
        timed(s"verify_unreduced_r$r") {
          System.err.println(s"PROBE $cores verified_unreduced_n " +
            Dedup.jaccardVerifyOnShingles(
              staged.select(col("doc_id"), col("sh")), pairs, minJaccard)
              .count())
        }
      }
      Dedup.jaccardVerifyOnShinglesReduced(
          staged.select(col("doc_id"), col("sh")), pairs, minJaccard,
          broadcastIds = true)
        .explain("formatted")

      timed("cc_clusters") {
        val drops = Dedup.clustersFromPairs(verified)
          .where(col("doc_id") =!= col("cluster_rep"))
          .select(col("doc_id"))
        System.err.println(s"PROBE $cores near_drops_n ${drops.count()}")
      }
      // the lean drop path the chain actually runs (no cluster-size
      // groupBy+join) — paired against cc_clusters above
      timed("cc_drop_ids") {
        System.err.println(s"PROBE $cores lean_drops_n " +
          s"${Dedup.nearDupDropIds(verified).count()}")
      }

      graft.tools.TempDirs.deleteRecursively(stagedDir)
    } finally spark.stop()
  }
}
