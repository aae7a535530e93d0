package graft.tools

import java.util.concurrent.{Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproduces the hardware-ceiling calibration quoted in BENCH.md: how far
  * 8 → 32 parallel units scale on this VM for (a) pure ALU work and
  * (b) warm parquet text-column decode. The scaling-efficiency criterion
  * binds against these ceilings — no JVM job on a shared-socket VM can
  * scale past them, while real N → 4N executor clusters add memory
  * controllers with the executors.
  *
  * `sbt -batch "runMain graft.tools.HostCalibration [corpusDir]"`
  */
object HostCalibration {

  private def alu(iters: Long): Long = {
    var x = 0L
    var i = 0L
    while (i < iters) { x += i * i + (x >>> 7); i += 1 }
    x
  }

  /** Wall seconds to run `threads` ALU units of fixed size concurrently. */
  private def aluWall(threads: Int): Double = {
    val pool = Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    (1 to threads * 2).foreach { _ =>
      pool.submit(new Runnable { def run(): Unit = alu(400000000L) })
    }
    pool.shutdown()
    pool.awaitTermination(10, TimeUnit.MINUTES)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    // (a) pure ALU: per-unit throughput at 8 vs 32 threads
    aluWall(4) // warm
    val w8 = aluWall(8)
    val w32 = aluWall(32)
    // units/s = threads*2 / wall; efficiency of the 4x step:
    val aluEff = ((32 * 2 / w32) / (8 * 2 / w8)) / 4.0
    println(f"CALIB alu: 8thr ${8 * 2 / w8}%.2f units/s, 32thr ${32 * 2 / w32}%.2f units/s, 8->32 efficiency ${aluEff}%.3f")

    // (b) parquet text decode at 8 vs 32 cores (warm floors, 3 reps each)
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scaling_corpus_20000000"
    if (!new java.io.File(dir).isDirectory) {
      println(s"CALIB parquet: corpus $dir missing — run ScalingBench first")
      return
    }
    def decodeFloor(cores: Int): Double = {
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false")
        .appName(s"calib-$cores").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        (1 to 4).map { _ =>
          val t0 = System.nanoTime()
          spark.read.parquet(dir).select(sum(length(col("text")))).collect()
          (System.nanoTime() - t0) / 1e9
        }.min
      } finally spark.stop()
    }
    val d8 = decodeFloor(8)
    val d32 = decodeFloor(32)
    println(f"CALIB parquet decode: 8c ${d8}%.2f s, 32c ${d32}%.2f s, 8->32 efficiency ${(d8 / d32) / 4.0}%.3f")
  }
}
