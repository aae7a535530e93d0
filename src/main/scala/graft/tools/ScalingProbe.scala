package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ner.{AliasTrieScorer, NerStage}
import graft.synth.Synth

/** Stage-by-stage scaling diagnosis: times synth-only, synth+NER (no
  * shuffle), and synth+shuffle+NER at a given core count. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = if (args.length > 1) args(1).toLong else 2000000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val scorer = new AliasTrieScorer
    // warmup
    NerStage.detect(Synth.articles(spark, 2000, 7L, cores), scorer).count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"PROBE cores=$cores $label%-22s wall=${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$c")
    }

    time("synth_only") {
      Synth.articles(spark, n, 42L, cores * 4).count()
    }
    time("synth_ner_noshuffle") {
      NerStage.detect(Synth.articles(spark, n, 42L, cores * 4), scorer).count()
    }
    time("synth_shuffle_ner") {
      NerStage.detect(Synth.articles(spark, n, 42L, cores * 4), scorer,
        numPartitions = cores * 4).count()
    }
    val dir = s"/tmp/graft_scaling_corpus_$n"
    if (new java.io.File(s"$dir/_SUCCESS").exists()) {
      import spark.implicits._
      def articles = spark.read.parquet(dir).as[graft.core.Article]
      time("parquet_scan") { spark.read.parquet(dir).count() }
      time("parquet_scan_text") {
        spark.read.parquet(dir)
          .select(sum(length(col("text")))).collect()
        0L
      }
      time("parquet_ner_noshuffle") { NerStage.detect(articles, scorer).count() }
      time("parquet_ner_shuffle") {
        NerStage.detect(articles, scorer, numPartitions = cores * 4).count()
      }
      time("parquet_full_triples") {
        val m = NerStage.detect(articles, scorer, numPartitions = cores * 4).cache()
        m.count()
        val t = graft.graph.GraphMaterialize.triples(m).count()
        m.unpersist()
        t
      }
    }
    spark.stop()
  }
}
