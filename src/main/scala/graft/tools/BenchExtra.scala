package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Per-query measurement harness for optimization work — the frozen
  * `graft.Bench` contract (same master/shuffle-partitions config, same
  * `.count()` action, min-of-2 interleaved passes) over a SUBSET of
  * queries (`SPARK_GRAFT_QUERIES`, comma-separated; default all), with
  * optional extra passes (`SPARK_GRAFT_PASSES`, default 2) and an
  * optional noop-sink timing mode (`SPARK_GRAFT_NOOP=1`, guide §1.4 —
  * computes every column instead of count's pruned subtree).
  *
  * Results go to stdout only — this tool never touches bench_out.json.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val noop = sys.env.get("SPARK_GRAFT_NOOP").contains("1")
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warm-up as the frozen bench
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
      SparkEntry.entry(spark).count()
      import spark.implicits._
      graft.canon.ConnectedComponents.run(
        Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("src", "dst")).count()
    } catch { case _: Throwable => () }
    try {
      SparkEntry.stagedIvf(spark, sfDir)
      SparkEntry.stagedSigStore(spark, sfDir)
    } catch { case _: Throwable => () }
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    def onePass(): Seq[(String, Double)] = qs.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"benchextra: $name")
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        if (noop) df.write.format("noop").mode("overwrite").save()
        else df.count()
      } catch { case e: Throwable =>
        System.err.println(s"[benchextra] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val all = (1 to passes).map(_ => onePass())
    val mins = qs.map(_._1).zipWithIndex.map { case (n, i) =>
      n -> all.map(p => p(i)._2).min
    }
    all.zipWithIndex.foreach { case (p, i) =>
      println(s"pass${i + 1}: " +
        p.map { case (n, s) => f"$n=$s%.3f" }.mkString(" "))
    }
    println("min:   " +
      mins.map { case (n, s) => f"$n=$s%.3f" }.mkString(" "))
    println(f"total_min=${mins.map(_._2).sum}%.3f")
    spark.stop()
  }
}
