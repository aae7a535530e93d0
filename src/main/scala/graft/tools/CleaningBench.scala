package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.CleaningPipeline

/** The composed cleaning chain at BENCH scale (round-5 verdict order #6):
  * kg19 runs it on ~3k docs where the CC loop's fixed costs dominate;
  * this runs `CleaningPipeline.cleanedMetaResumable` once over a 20M-doc
  * corpus with EXACTLY KNOWN planted rates, so the "fixed costs amortize
  * at scale" claim is measured, and the survivor count is checked against
  * the planted arithmetic — not a rate estimate.
  *
  * Planted layout — groups of 20 consecutive doc_ids:
  *  - r = 0..16  unique base text (40 tokens from a 4096-word vocab,
  *                splitmix-seeded, partition-independent)
  *  - r = 17     exact duplicate of the group's r=0 text
  *  - r = 18     near-duplicate of r=1 (one appended unique token:
  *                Jaccard 38/40 = 0.95 ≥ 0.8; at 16 bands × 2 rows the
  *                per-pair LSH miss probability is (1−0.95²)¹⁶ ≈ 5e-17,
  *                so the expected count is exact at any corpus size)
  *  - r = 19     exact duplicate of r=2
  * and every 500th group's r=3 doc donates its first 15 tokens as a
  * benchmark excerpt (13 shared shingles ≥ minOverlap 5 → flagged).
  *
  * Expected: flagged = ⌈groups/500⌉, exact drops = 2·groups, near drops
  * = groups, survivors = 17·groups − ⌈groups/500⌉. All four are hard
  * assertions against the run's per-stage manifest.
  *
  * The corpus is read through [[CountingLocalFs]] (its own `cntfs:`
  * scheme), so the read-once guarantee is MEASURED at 20M too: corpus
  * parquet file opens during the whole chain must equal one plain scan's
  * opens. (cntfs defeats Spark's local-parquet fast path, so the
  * reported throughput is a slight underestimate — the honest price of
  * counting.) Results append to BENCH.md.
  */
object CleaningBench {

  private def mix(seed: Long, i: Long): Long = {
    var z = seed + i * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 40 deterministic vocab tokens for base doc `i`. */
  def baseText(seed: Long, i: Long): String = {
    val sb = new StringBuilder(256)
    var z = mix(seed, i)
    var t = 0
    while (t < 40) {
      if (t > 0) sb.append(' ')
      z = mix(z, t + 1)
      sb.append('w').append(java.lang.Long.toHexString(z & 0xFFF))
      t += 1
    }
    sb.toString
  }

  /** The planted text for doc `i` (see object doc for the group layout). */
  def textOf(seed: Long, i: Long): String = {
    val g0 = i - i % 20
    (i % 20) match {
      case 17 => baseText(seed, g0)
      case 18 => baseText(seed, g0 + 1) + " nd" + i
      case 19 => baseText(seed, g0 + 2)
      case _ => baseText(seed, i)
    }
  }

  private def corpus(spark: SparkSession, n: Long, seed: Long)
      : Dataset[(Long, String)] = {
    import spark.implicits._
    spark.range(0, n, 1, 128).map(i => (i, textOf(seed, i)))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 20000000L
    val seed = 42L
    require(nDocs % 10000 == 0, "nDocs must be a multiple of 10000")
    val groups = nDocs / 20
    val contam = (groups + 499) / 500
    val expectSurvivors = 17L * groups - contam

    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-cleaning-bench")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.hadoopConfiguration.set("fs.cntfs.impl",
      classOf[CountingLocalFs].getName)
    import spark.implicits._
    try {
      // corpus at rest ONCE (untimed) — the chain's input is a table
      val dir = s"/tmp/graft_cleaning_corpus_$nDocs"
      if (!Files.exists(Paths.get(s"$dir/docs/_SUCCESS"))) {
        corpus(spark, nDocs, seed).toDF("doc_id", "text")
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/docs")
        spark.range(0, groups, 1, 8).where(col("id") % 500 === 0)
          .as[Long]
          .map(g => (g, textOf(seed, g * 20 + 3)
            .split(" ").take(15).mkString(" ")))
          .toDF("bench_id", "text")
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/bench")
      }

      // calibration: one plain scan's worth of corpus file opens
      CountingLocalFs.reset()
      spark.read.parquet(s"cntfs:$dir/docs")
        .agg(sum(length(col("text")))).collect()
      val oneScanOpens = CountingLocalFs.parquetOpens()

      val stage = Files.createTempDirectory("graft_cleaning_bench").toString
      CountingLocalFs.reset()
      val t0 = System.nanoTime()
      val survivors = CleaningPipeline.cleanedMetaResumable(
        spark.read.parquet(s"cntfs:$dir/docs"),
        spark.read.parquet(s"$dir/bench"), stage,
        k = 32, bands = 16, shingleN = 3, maxBucket = 1024,
        minJaccard = 0.8, minOverlap = 5).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val chainOpens = CountingLocalFs.parquetOpens()

      require(survivors == expectSurvivors,
        s"survivors $survivors != planted arithmetic $expectSurvivors")
      require(chainOpens == oneScanOpens,
        s"chain opened corpus files $chainOpens times vs $oneScanOpens " +
          "for one plain scan — the read-once guarantee broke at scale")
      val stages = CleaningPipeline.manifest(spark, stage)
        .orderBy("stage").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      val byStage = stages.map { case (s0, rows, ms) => s0 -> ((rows, ms)) }
        .toMap
      require(byStage(1)._1 == contam,
        s"flagged ${byStage(1)._1} != planted $contam")
      require(byStage(2)._1 == 2L * groups,
        s"exact drops ${byStage(2)._1} != planted ${2L * groups}")
      require(byStage(3)._1 == groups,
        s"near drops ${byStage(3)._1} != planted $groups")

      val dps = nDocs / wall
      val stageMs = stages.map { case (s0, rows, ms) =>
        s""""stage$s0":{"rows":$rows,"wall_ms":$ms}"""
      }.mkString(",")
      val json =
        f"""{"n_docs":$nDocs,"survivors":$survivors,"expected":$expectSurvivors,""" +
          f""""wall_sec":$wall%.1f,"docs_per_sec":$dps%.0f,""" +
          f""""corpus_opens_chain":$chainOpens,"corpus_opens_one_scan":$oneScanOpens,$stageMs}"""
      println(json)

      val row =
        f"""
           |## CleaningBench run (${java.time.Instant.now()})
           |
           |`CleaningPipeline.cleanedMetaResumable` (parquet-staged chain:
           |decontaminate → exact dedup → near-dup dedup) over $nDocs
           |planted docs at local[32], corpus read through the counting
           |filesystem (defeats the local-parquet fast path — throughput
           |slightly understated).
           |
           || metric | value |
           || --- | --- |
           || wall (s) | $wall%.1f |
           || docs/s | $dps%.0f |
           || survivors | $survivors (= planted arithmetic exactly) |
           || flagged / exact drops / near drops | $contam / ${2L * groups} / $groups (all = planted) |
           || corpus file opens: chain vs one scan | $chainOpens vs $oneScanOpens |
           |
           |Per-stage (rows, wall): ${stages.map { case (s0, r, ms) =>
                f"stage$s0 ($r rows, ${ms / 1000.0}%.1f s)"
              }.mkString("; ")}
           |```json
           |$json
           |```
           |""".stripMargin
      Files.write(Paths.get("BENCH.md"), row.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    } finally spark.stop()
  }
}
