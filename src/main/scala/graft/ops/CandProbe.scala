package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._



/** Focused A/B for the candidate stage's aggregation strategy at bench
  * scale, straight off an existing CleaningBench corpus (no band-row
  * checkpoint — every variant recomputes banding inline exactly as the
  * chain does):
  *
  *  A. `agg` — the shipped single-pass bounded-min object aggregate
  *     ([[Dedup.candidatePairsFromBanded]] — TypedImperativeAggregate,
  *     sort-fallback beyond the ObjectHashAggregate threshold);
  *  B. `count` — the fixed-width codegen'd `count(*)` HashAggregate over
  *     the same banded rows: the aggregation FLOOR of this substrate;
  *  C. `all` additionally runs a two-phase "rare-collision" form
  *     (count → filter ≥2 → broadcast-semi → bounded-min on the subset).
  *
  * MEASURED VERDICT (20M docs, 32 cores, idle, 2026-08-18): A = 200.4 s,
  * B floor = 110.0 s (stable across reps), colliding buckets =
  * 47,195,151 — i.e. at a realistic dup rate the colliding-bucket set is
  * tens of millions of keys (every duplicate group × every band), so the
  * two-phase broadcast variant is REFUTED (the broadcast alone thrashed
  * an 8 GB heap), and the shipped bounded-min pays ~90 s over the
  * fixed-width floor as the price of its typed per-bucket cap — the
  * skew-safety that bounds a degenerate bucket's shuffle contribution.
  * Kept as the reproducible record of that negative result.
  *
  * ROUND-7 CLOSURE: the last unmeasured shape — two-phase WITHOUT a
  * broadcast (exact colliding-key table, shuffle left-semi, bounded-min
  * on the colliding subset; `twophase_nobc`) — measured in the same
  * idle window: floor 79–84 s, A 109–137 s, B2 219–224 s, identical
  * emitted pairs (3,011,907). The second full exchange of the banded
  * rows costs ~2× what the shrunken aggregate saves. Every two-phase
  * shape is now measured and loses; the single-pass bounded-min is the
  * shipped form permanently (BENCH.md round-7 entry).
  *
  * Usage: runMain graft.ops.CandProbe <cores> [nDocs=20000000]
  * [all|count|agg|twophase_nobc|nobc] (expects
  * /tmp/graft_cleaning_corpus_<nDocs>; stages its own projection to
  * /dev/shm — sweep /dev/shm of crashed-JVM leftovers first, see the
  * substrate note in BENCH.md round 7)
  */
object CandProbe {

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = if (args.length >= 2) args(1).toLong else 20000000L
    val (k, bands, shingleN, maxBucket) = (32, 16, 3, 1024)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"cand-probe-$cores")
      .config("spark.sql.shuffle.partitions",
        math.max(cores * 2, math.min(1024L, nDocs / 160000L).toInt))
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stagedDir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "candprobe")
      .toString
    try {
      def timed[A](label: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val r = body
        System.err.println(
          f"CANDPROBE $cores $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      // 32 MB row groups on the staged write: 32 concurrent default
      // (128 MB) parquet writers buffer ~4 GB against the 8 GB bench
      // heap and OOM'd the staging nondeterministically (round-7 probe
      // sessions); the staged table is probe-transient, row-group size
      // is irrelevant to what is being measured
      spark.read.parquet(s"/tmp/graft_cleaning_corpus_$nDocs/docs")
        .select(col("doc_id"),
          graft.ops.Dedup.minhashSignature(col("text"), k, shingleN).as("sig"))
        .write.mode("overwrite")
        .option("parquet.block.size", 33554432)
        .parquet(stagedDir)
      def banded = graft.ops.Dedup.bandRowsFromSigs(
        spark.read.parquet(stagedDir), k, bands)
      val mode = if (args.length >= 3) args(2) else "all"
      (1 to 2).foreach { r =>
        if (mode == "all" || mode == "count" || mode == "nobc")
          timed(s"B_countonly_r$r") {
          System.err.println(s"CANDPROBE $cores colliding_buckets " +
            banded.groupBy(col("band"), col("bh"))
              .agg(count(lit(1)).as("_n")).where(col("_n") >= 2).count())
        }
        if (mode == "all" || mode == "agg" || mode == "nobc")
          timed(s"A_boundedmin_r$r") {
          System.err.println(s"CANDPROBE $cores pairs_A " +
            graft.ops.Dedup.candidatePairsFromBanded(banded, maxBucket).count())
        }
        // (the "window" variant was retired with the window twin —
        // round-6 measurement recorded in BENCH.md; twin now lives in
        // BoundedCapSpec only)
        //
        // round-6 verdict #8: the two-phase variant WITHOUT a broadcast
        // (exact colliding-key table, shuffle semi-join, bounded-min on
        // the reduced membership) — the one shape the round-6 refutation
        // (broadcast thrash at 47M colliding buckets) did not measure.
        // Pays the count floor + a full extra exchange of the banded
        // rows to shrink the object aggregate's input to the colliding
        // subset.
        if (mode == "all" || mode == "twophase_nobc" || mode == "nobc")
          timed(s"B_twophase_nobc_r$r") {
            val collide = banded.groupBy(col("band"), col("bh"))
              .agg(count(lit(1)).as("_n"))
              .where(col("_n") >= 2)
              .select(col("band"), col("bh"))
            val members = banded.join(collide, Seq("band", "bh"),
              "left_semi")
            System.err.println(s"CANDPROBE $cores pairs_B2 " +
              graft.ops.Dedup.candidatePairsFromBanded(members, maxBucket)
                .count())
          }
        if (mode == "all") timed(s"B_twophase_r$r") {
          val collide = banded.groupBy(col("band"), col("bh"))
            .agg(count(lit(1)).as("_n"))
            .where(col("_n") >= 2)
            .select(col("band"), col("bh"))
            .localCheckpoint()
          val members = banded.join(broadcast(collide),
            Seq("band", "bh"), "left_semi")
          System.err.println(s"CANDPROBE $cores pairs_B " +
            graft.ops.Dedup.candidatePairsFromBanded(members, maxBucket).count())
        }
      }
    } finally {
      graft.tools.TempDirs.deleteRecursively(stagedDir)
      spark.stop()
    }
  }
}
