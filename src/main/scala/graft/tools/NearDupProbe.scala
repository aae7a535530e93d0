package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: kg09 shape timing at sf0.1 to localize the cost of the
  * id-only near-dup plan (round-3 change) vs its stages. */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def emb = {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val mutated = e.select(
        (col("vec_id") + 1000000L).as("vec_id"),
        concat(
          array((element_at(col("embedding"), 1) * 1.01f).cast("float")),
          slice(col("embedding"), 2, 63)).as("embedding"))
      e.unionByName(mutated)
    }
    println(s"[probe] rows=${emb.count()}")

    def time(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $tag pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }

    time("full kg09") {
      graft.ops.Ann.embeddingNearDupPairs(emb, dim = 64, minCosine = 0.98).count()
    }
    time("full kg09 bits=12") {
      graft.ops.Ann.embeddingNearDupPairs(emb, dim = 64, minCosine = 0.98,
        bits = 12).count()
    }
    time("full kg09 bits=12 bands=8") {
      graft.ops.Ann.embeddingNearDupPairs(emb, dim = 64, minCosine = 0.98,
        bits = 12, bands = 8).count()
    }
    // stage: band keys + window cap only
    time("banded+cap") {
      val banded = emb.select(col("vec_id"),
        posexplode(graft.ops.Ann.lshBandKeys(col("embedding"), 8, 4, 7L))
          .as(Seq("band", "key")))
      val bw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("key"))
      banded.withColumn("_bsz", count(lit(1)).over(bw))
        .where(col("_bsz") <= 256).count()
    }
    // stage: + self-join + distinct pairs
    time("pairs distinct") {
      val banded = emb.select(col("vec_id"),
        posexplode(graft.ops.Ann.lshBandKeys(col("embedding"), 8, 4, 7L))
          .as(Seq("band", "key")))
      val bw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("key"))
      val b = banded.withColumn("_bsz", count(lit(1)).over(bw))
        .where(col("_bsz") <= 256).drop("_bsz")
      b.select(col("band"), col("key"), col("vec_id").as("id1"))
        .join(b.select(col("band"), col("key"), col("vec_id").as("id2")),
          Seq("band", "key"))
        .where(col("id1") < col("id2"))
        .select(col("id1"), col("id2")).distinct().count()
    }
    spark.stop()
  }
}
