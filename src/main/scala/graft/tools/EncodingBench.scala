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
  *  - warm decode floors of `sum(length(text))` at 2, 8, and 32 cores,
  *    reps interleaved across variants inside one session per core count
  *    so every variant sees the same contention window;
  *  - the paired 2→8 decode efficiency per variant.
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

  /** Warm decode floors at one core count: min over `reps` interleaved
    * passes per variant (one untimed warm pass first). */
  private def decodeFloors(cores: Int, reps: Int): Map[String, Double] = {
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
      variants.foreach(v => scan(v.dir)) // warm: JIT + page cache
      val walls = mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
      (1 to reps).foreach { _ =>
        variants.foreach(v => walls(v.name) = scan(v.dir) :: walls(v.name))
      }
      variants.map(v => v.name -> walls(v.name).min).toMap
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft_scaling_corpus_20000000")
    val warmSrc =
      if (args.length >= 2) args(1) else "/tmp/graft_scaling_corpus_2000000"
    writeVariants(src, warmSrc)

    val sizes = variants.map(v => v.name -> columnBytes(v.dir)).toMap
    // paired 2→8 window (back-to-back), then the 32-core floor
    val f2 = decodeFloors(2, reps = 2)
    val f8 = decodeFloors(8, reps = 3)
    val f32 = decodeFloors(32, reps = 3)

    def textBytes(n: String) = sizes(n).getOrElse("text", 0L)
    def totalBytes(n: String) = sizes(n).values.sum
    val rows = variants.map { v =>
      val eff = (f2(v.name) / f8(v.name)) / 4.0
      (v.name, totalBytes(v.name), textBytes(v.name), f2(v.name),
        f8(v.name), f32(v.name), eff)
    }
    val json = "{\"variants\":{" + rows.map { case (n, tot, txt, w2, w8, w32, e) =>
      f""""$n":{"total_bytes":$tot,"text_bytes":$txt,"decode2_sec":$w2%.2f,"decode8_sec":$w8%.2f,"decode32_sec":$w32%.2f,"eff_2_8":$e%.3f}"""
    }.mkString(",") + "}}"
    println(json)

    val md = new StringBuilder
    md.append(s"\n## Text-encoding measurement (${java.time.Instant.now()})\n\n")
    md.append("20M-doc corpus rewritten in four parquet variants; warm\n")
    md.append("`sum(length(text))` decode floors (min of interleaved passes, one\n")
    md.append("session per core count so variants share each contention window);\n")
    md.append("`text bytes` = compressed `text` column chunks from the footers —\n")
    md.append("the bytes a pruned text scan actually reads.\n\n")
    md.append("| variant | total bytes | text bytes | 2c (s) | 8c (s) | 32c (s) | paired 2→8 eff |\n")
    md.append("| --- | --- | --- | --- | --- | --- | --- |\n")
    rows.foreach { case (n, tot, txt, w2, w8, w32, e) =>
      md.append(f"| $n | $tot | $txt | $w2%.2f | $w8%.2f | $w32%.2f | $e%.3f |\n")
    }
    md.append("\n```json\n" + json + "\n```\n")
    Files.write(Paths.get("BENCH.md"), md.toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
