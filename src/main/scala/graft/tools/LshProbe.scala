package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val mutated = docs.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" qqzz")).as("text"))
    val all = docs.unionByName(mutated).cache()
    all.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"LSHPROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    Seq((32, 16), (32, 8)).foreach { case (k, bands) =>
      val pairs = time(s"candidates k=$k bands=$bands") {
        val p = Dedup.lshCandidatePairs(all, k, bands, 3).cache()
        val n = p.count()
        println(s"LSHPROBE   n_candidates=$n")
        p
      }
      time(s"verify k=$k bands=$bands") {
        println("LSHPROBE   n_verified=" +
          Dedup.jaccardVerify(all, pairs, 3, 0.8).count())
      }
      pairs.unpersist()
    }
    spark.stop()
  }
}
