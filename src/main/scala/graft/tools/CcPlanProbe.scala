package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Mechanism probe for the CC convergence-tail driver cost (BENCH.md
  * round 7): the 20M ladder's stack sampler put ~97 s of the 121 s final
  * round in `SizeInBytesOnlyStatsPlanVisitor` with samples growing
  * ×2.85/round, and the cost is DATA-INDEPENDENT — so it must live in
  * plan/constraint/stats structures that survive `localCheckpoint`
  * truncation. This probe replays the loop's exact dataflow shape on a
  * toy chain graph (seconds, not minutes) and prints, per round: the
  * analyzed/optimized plan node counts, the constraint-set size, the
  * `Statistics` attribute-map size carried by each LogicalRDD leaf, and
  * the wall of the `.localCheckpoint()` call itself (which optimizes the
  * round plan to harvest originStats/originConstraints). Whichever
  * column grows with the observed ~3×/round factor names the mechanism.
  */
object CcPlanProbe {

  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 12
    // "lean" = wrap loop state via CheckpointBridge.localCheckpointLeanStats
    // (the shipped CC form) instead of the default Dataset.localCheckpoint —
    // the A/B that proves the fix: standard blows up the ckpt wall from
    // ~round 16, lean stays flat at any round count
    val lean = args.length > 1 && args(1) == "lean"
    def ckpt(df: org.apache.spark.sql.DataFrame) =
      if (lean) org.apache.spark.sql.graftbridge.CheckpointBridge
        .localCheckpointLeanStats(df, StorageLevel.MEMORY_AND_DISK_SER)
      else df.localCheckpoint(eager = false, StorageLevel.MEMORY_AND_DISK_SER)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-cc-plan-probe")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      // one long chain: forces pointer-doubling rounds like the bench
      val n = 1L << rounds
      val edges = spark.range(0, n - 1)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))

      val sym = ckpt(edges
        .select(col("src").as("a"), col("dst").as("b"))
        .unionAll(edges.select(col("dst").as("a"), col("src").as("b")))
        .distinct())
      var labels = ckpt(sym.select(col("a").as("node"))
        .distinct()
        .withColumn("component", col("node")))

      var iter = 0
      var converged = false
      while (iter < rounds && !converged) {
        val compressed = labels
          .join(labels.select(col("node").as("component"),
            col("component").as("_cc2")), Seq("component"), "left")
          .select(col("node"), col("component").as("_old"),
            coalesce(col("_cc2"), col("component")).as("component"))
        val proposals = sym
          .join(compressed.select(col("node").as("b"), col("component")), "b")
          .groupBy(col("a").as("node"))
          .agg(min(col("component")).as("nbrMin"))
        val preCheckpoint = compressed
          .join(proposals, Seq("node"), "left")
          .select(
            col("node"),
            col("_old"),
            least(col("component"), coalesce(col("nbrMin"), col("component")))
              .as("component"))
        val t0 = System.nanoTime()
        val wide = ckpt(preCheckpoint)
        val ckptSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val changed = wide.where(col("component") =!= col("_old")).count()
        val countSec = (System.nanoTime() - t1) / 1e9

        // dissect what the checkpoint-wrapped dataset carries
        val analyzed = wide.queryExecution.analyzed
        val nNodes = analyzed.collect { case p => p }.size
        val nConstraints = analyzed.constraints.size
        val leafStats = analyzed.collectLeaves().map { l =>
          val st = l.stats
          (st.attributeStats.size, st.rowCount.isDefined)
        }
        // and what next round's UNCHECKPOINTED plan would look like
        val preAnalyzed = preCheckpoint.queryExecution.analyzed
        val preNodes = preAnalyzed.collect { case p => p }.size
        val preConstraints = preAnalyzed.constraints.size
        val t2 = System.nanoTime()
        val statsSize = preCheckpoint.queryExecution.optimizedPlan.stats
          .sizeInBytes
        val statsSec = (System.nanoTime() - t2) / 1e9

        println(f"ROUND ${iter + 1}%2d ckpt=$ckptSec%7.3fs count=$countSec%6.2fs " +
          f"re-stats=$statsSec%7.3fs wrapped[nodes=$nNodes constraints=$nConstraints " +
          f"leafAttrStats=${leafStats.map(_._1).sum} rowCounts=${leafStats.count(_._2)}] " +
          f"preCkpt[nodes=$preNodes constraints=$preConstraints] " +
          f"sizeInBytes=$statsSize changed=$changed")

        labels = wide.select(col("node"), col("component"))
        converged = changed == 0
        iter += 1
      }
    } finally spark.stop()
  }
}
