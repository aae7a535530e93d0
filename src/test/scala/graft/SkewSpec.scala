package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** AQE skew handling evidence: a Reuters-shaped hot key (one key carrying
  * most rows) joined big-big must trigger AQE's skew-join split. Thresholds
  * are lowered so the effect is observable at test scale; on the real
  * cluster the defaults (256 MB / factor 5) apply to the same plan shape. */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("AQE splits a skewed sort-merge join partition") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.forceOptimizeSkewedJoin"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import spark.implicits._
      // hot key: 300k rows on "Reuters", 26 cold keys with 100 rows each
      val mentions = ((0 until 300000).map(i => ("Reuters", i.toLong)) ++
        (0 until 26).flatMap(k => (0 until 100).map(i => (('A' + k).toChar.toString, i.toLong))))
        .toDF("agency", "payload")
      // plain table on the dim side: OptimizeSkewedJoin matches
      // SMJ(Sort(Shuffle), Sort(Shuffle)) — an aggregate in between
      // disqualifies the stage from splitting
      val dim = ("Reuters" +: (0 until 26).map(k => ('A' + k).toChar.toString))
        .map(a => (a, s"Q$a")).toDF("agency", "qid")
      val joined = mentions.join(dim, Seq("agency"))
      assert(joined.collect().length == mentions.count())
      // inspect the SAME query execution that just ran (AQE is final now)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(2000))
      assert(plan.contains("skew=true"), plan.take(4000))
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }
}
