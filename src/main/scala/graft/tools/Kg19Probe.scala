package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage-level timing probe for the kg19 cleaning-pipeline query:
  * runs the same resumable chain body with a KEPT stage dir and prints
  * the per-stage manifest plus the surrounding wall times. Measurement
  * harness only. */
object Kg19Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tbl(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")
    // warm-up: one full run shape
    val docsAll = tbl("documents").select(col("doc_id"), col("lang"), col("text"))
    val bench = tbl("documents").where(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("bench_id"),
        array_join(slice(split(col("text"), " "), 1, 40), " ").as("text"))
    def chain(stage: String): Double = {
      val copies = docsAll.where(col("doc_id") % 40 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("lang"), col("text"))
      val mutants = docsAll.where(col("doc_id") % 30 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
          concat(col("text"), lit(" qqzz")).as("text"))
      val t0 = System.nanoTime()
      val out = graft.ops.CleaningPipeline.cleanedMetaResumable(
        docsAll.unionByName(copies).unionByName(mutants),
        bench, stage, keepCols = Seq("lang"),
        k = 32, bands = 16, shingleN = 3, maxBucket = 1024,
        minJaccard = 0.8, minOverlap = 5)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .localCheckpoint()
      val secs = (System.nanoTime() - t0) / 1e9
      graft.ops.CleaningPipeline.manifest(spark, stage)
        .orderBy(col("stage")).collect()
        .foreach(r => println(f"  stage ${r.getInt(0)} rows=${r.getLong(1)}%6d wall_ms=${r.getLong(2)}%6d"))
      out.count()
      secs
    }
    (1 to 3).foreach { i =>
      val dir = graft.tools.TempDirs.scoped(s"kg19probe_$i")
      val s = chain(dir)
      println(f"run$i total=$s%.3f s")
      graft.tools.TempDirs.deleteRecursively(dir)
    }
    spark.stop()
  }
}
