package graft.ops

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.functions.{BoundedMinHeap, BoundedMinLongs}

/** The bounded-min bucket cap (graft.functions.BoundedMinLongs) that
  * replaced the row_number-window cap in LSH candidate generation:
  * heap-level unit properties, serialization round-trip, randomized
  * DataFrame parity against the retained window twin
  * ([[Dedup.candidatePairsFromBandedWindow]]) including duplicate ids
  * and biting caps, and the two-phase (partial+final) plan shape that
  * carries the skew argument. */
class BoundedCapSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("BoundedMinHeap keeps the k smallest values, duplicates preserved") {
    val rnd = new Random(7)
    for (trial <- 1 to 50) {
      val k = 1 + rnd.nextInt(8)
      val n = rnd.nextInt(40)
      // small value domain so duplicates are common
      val vals = Seq.fill(n)(rnd.nextInt(12).toLong)
      val h = new BoundedMinHeap(k)
      vals.foreach(h.insert)
      assert(h.size <= k, s"trial $trial: heap exceeded its bound")
      assert(h.sorted.toSeq == vals.sorted.take(k),
        s"trial $trial: k=$k vals=$vals")
    }
  }

  test("BoundedMinLongs serialize/deserialize round-trips the kept multiset") {
    val agg = BoundedMinLongs(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(lit(0L)), 5)
    val h = new BoundedMinHeap(5)
    Seq(9L, 3L, 3L, 7L, 1L, 8L, 2L).foreach(h.insert)
    val back = agg.deserialize(agg.serialize(h))
    assert(back.sorted.toSeq == Seq(1L, 2L, 3L, 3L, 7L))
    // merge keeps the k smallest of the union
    val other = new BoundedMinHeap(5)
    Seq(0L, 6L, 2L).foreach(other.insert)
    val merged = agg.merge(back, other)
    assert(merged.sorted.toSeq == Seq(0L, 1L, 2L, 2L, 3L))
  }

  test("candidate pairs: bounded-min agg ≡ window cap on randomized buckets") {
    import spark.implicits._
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val maxBucket = Seq(2, 3, 64)(trial % 3)
      // few buckets, many members → the cap bites; duplicated rows mixed
      // in → the (id,id) self-pair guard and multiset cap semantics are
      // both exercised
      val rows = (1 to 400).map { _ =>
        (rnd.nextInt(1000).toLong, rnd.nextInt(4), rnd.nextInt(6).toLong)
      } ++ (1 to 30).map(_ => (77L, 1, 3L))
      val banded = rows.toDF("doc_id", "band", "bh")
      val agg = Dedup.candidatePairsFromBanded(banded, maxBucket)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val win = Dedup.candidatePairsFromBandedWindow(banded, maxBucket)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(agg == win, s"trial $trial maxBucket=$maxBucket")
    }
  }

  test("bounded-min agg aggregates in two phases (map-side partial cap)") {
    import spark.implicits._
    val banded = Seq((1L, 0, 1L), (2L, 0, 1L), (3L, 0, 1L))
      .toDF("doc_id", "band", "bh")
    val plan = Dedup.candidatePairsFromBanded(banded, 2)
      .queryExecution.executedPlan.toString
    // partial + final ObjectHashAggregate: the map-side instance is what
    // caps a degenerate bucket's shuffle contribution at partitions×k
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("partial_graft_bounded_min_longs"), plan)
  }
}
