package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.collection.mutable

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Text-encoding measurement for the scan-decode-bound path (round-4
  * verdict #5): the 2→8 ladder is capped by parquet text decode, and at
  * 100 TB the scan IS the job — so measure what the `text` column's
  * codec and dictionary choice buy, instead of guessing.
  *
  * Writes the 20M-doc scaling corpus in four parquet variants
  * (snappy/zstd × dictionary on/off), then measures for each:
  *  - bytes at rest, total and PER COLUMN (compressed column-chunk sizes
  *    from the parquet footers — the `text` chunks are the bytes a
  *    pruned text scan actually touches);
  *  - warm `sum(length(text))` decode walls under the PAIRED protocol:
  *    each round runs a fresh 2-core session then a fresh 8-core session
  *    back-to-back (in-session warm pass over every variant first), so
  *    per-round efficiencies cancel host drift exactly like
  *    [[graft.ScalingBench]]; the 32-core floor is a separate
  *    min-of-sessions block;
  *  - the paired 2→8 decode efficiency per variant (median over rounds).
  *
  * Prints one JSON line and appends a BENCH.md section. The winner's
  * full-pipeline ladder is run separately via `ScalingBench` with the
  * corpus-prefix override.
  *
  * `sbt -batch "runMain graft.tools.EncodingBench [srcDir] [warmSrcDir]"`
  */
object EncodingBench {

  final case class Variant(name: String, codec: String, dict: Boolean) {
    def dir: String = s"/tmp/graft_encoding_${name}_corpus_20000000"
    def warmDir: String = s"/tmp/graft_encoding_${name}_corpus_2000000"
  }

  val variants: Seq[Variant] = Seq(
    Variant("snappy_dict", "snappy", dict = true),
    Variant("snappy_nodict", "snappy", dict = false),
    Variant("zstd_dict", "zstd", dict = true),
    Variant("zstd_nodict", "zstd", dict = false))

  private def exists(dir: String): Boolean =
    Files.exists(Paths.get(s"$dir/_SUCCESS"))

  /** Rewrite the source corpus (and its 1/10 warm-up corpus — the ladder
    * must warm on the SAME codec it times, or the decompressor JIT shape
    * differs) in every variant. Skips variants already on disk. */
  private def writeVariants(src: String, warmSrc: String): Unit = {
    if (variants.forall(v => exists(v.dir) && exists(v.warmDir))) return
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .appName("graft-encoding-write").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = spark.read.parquet(src)
      val warm = spark.read.parquet(warmSrc)
      variants.foreach { v =>
        if (!exists(v.dir))
          df.write.mode(SaveMode.Overwrite)
            .option("compression", v.codec)
            .option("parquet.enable.dictionary", v.dict.toString)
            .parquet(v.dir)
        if (!exists(v.warmDir))
          warm.write.mode(SaveMode.Overwrite)
            .option("compression", v.codec)
            .option("parquet.enable.dictionary", v.dict.toString)
            .parquet(v.warmDir)
      }
    } finally spark.stop()
  }

  /** Compressed column-chunk bytes per column, summed over all files of
    * a variant — what a column-pruned scan of that column actually
    * reads. Straight from the parquet footers, no Spark job. */
  def columnBytes(dir: String): Map[String, Long] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val acc = mutable.Map.empty[String, Long].withDefaultValue(0L)
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).foreach { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.forEach { b =>
          b.getColumns.forEach { c =>
            acc(c.getPath.toDotString) += c.getTotalSize
          }
        } finally r.close()
      }
    acc.toMap
  }

  /** One warm decode pass per variant at `cores`, in a fresh session
    * (in-session warm pass over every variant first — JIT + page cache).
    * Returns wall seconds per variant. */
  private def decodePass(cores: Int): Map[String, Double] = {
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .appName(s"graft-encoding-$cores").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      def scan(dir: String): Double = {
        val t0 = System.nanoTime()
        spark.read.parquet(dir).select(sum(length(col("text")))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      variants.foreach(v => scan(v.dir)) // warm
      variants.map(v => v.name -> scan(v.dir)).toMap
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft_scaling_corpus_20000000")
    val warmSrc =
      if (args.length >= 2) args(1) else "/tmp/graft_scaling_corpus_2000000"
    writeVariants(src, warmSrc)

    val sizes = variants.map(v => v.name -> columnBytes(v.dir)).toMap
    // PAIRED 2→8 rounds — lo then hi back-to-back in the same contention
    // window, exactly the ScalingBench discipline: host drift between
    // separate lo/hi blocks would bias every variant's efficiency by the
    // drift and could reorder the codec ranking this bench decides
    val rounds = 2
    val pairRounds = (1 to rounds).map(_ => (decodePass(2), decodePass(8)))
    val f32 = {
      val passes = (1 to 3).map(_ => decodePass(32))
      variants.map(v => v.name -> passes.map(_(v.name)).min).toMap
    }

    def textBytes(n: String) = sizes(n).getOrElse("text", 0L)
    def totalBytes(n: String) = sizes(n).values.sum
    val rows = variants.map { v =>
      val w2 = pairRounds.map(_._1(v.name)).min
      val w8 = pairRounds.map(_._2(v.name)).min
      val effs = pairRounds.map { case (lo, hi) =>
        (lo(v.name) / hi(v.name)) / 4.0
      }.sorted
      val effMed = (effs(effs.size / 2) + effs((effs.size - 1) / 2)) / 2.0
      (v.name, totalBytes(v.name), textBytes(v.name), w2, w8,
        f32(v.name), effMed, effs)
    }
    val json = "{\"variants\":{" + rows.map {
      case (n, tot, txt, w2, w8, w32, e, effs) =>
        f""""$n":{"total_bytes":$tot,"text_bytes":$txt,"decode2_sec":$w2%.2f,"decode8_sec":$w8%.2f,"decode32_sec":$w32%.2f,"eff_2_8_median_paired":$e%.3f,"paired_effs":[${effs.map(x => f"$x%.3f").mkString(",")}]}"""
    }.mkString(",") + "}}"
    println(json)

    val md = new StringBuilder
    md.append(s"\n## Text-encoding measurement (${java.time.Instant.now()})\n\n")
    md.append("20M-doc corpus rewritten in four parquet variants; warm\n")
    md.append("`sum(length(text))` decode walls, PAIRED protocol: each round runs\n")
    md.append("a 2-core then an 8-core session back-to-back (fresh session each,\n")
    md.append("in-session warm pass), per-round efficiency cancels host drift;\n")
    md.append("`text bytes` = compressed `text` column chunks from the footers —\n")
    md.append("the bytes a pruned text scan actually reads.\n\n")
    md.append("| variant | total bytes | text bytes | 2c best (s) | 8c best (s) | 32c best (s) | 2→8 eff (median paired) |\n")
    md.append("| --- | --- | --- | --- | --- | --- | --- |\n")
    rows.foreach { case (n, tot, txt, w2, w8, w32, e, effs) =>
      md.append(f"| $n | $tot | $txt | $w2%.2f | $w8%.2f | $w32%.2f | $e%.3f (${effs.map(x => f"$x%.3f").mkString("/")}) |\n")
    }
    md.append("\n```json\n" + json + "\n```\n")
    Files.write(Paths.get("BENCH.md"), md.toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
