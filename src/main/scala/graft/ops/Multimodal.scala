package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata; decode/feature-extract runs batched inside
  * `mapPartitions` (the JVM analog of a vectorized pandas-batch UDF).
  *
  * The decode step is a STUB — real codec libraries are not in this build —
  * but the Spark-side contract (schema, batch shape, partitioning,
  * per-partition amortized "decoder" initialization) is real and tested:
  * swapping [[FakeDecoder]] for a JNI/FFI codec changes nothing upstream.
  */
object Multimodal {

  /** Typed decoded-feature row. `stripe_sums` are exact-integer byte sums
    * per position stripe (i mod FeatureDim) — the oracle-hashable form of
    * the folded signature (`features` is the normalized double view). */
  final case class MediaFeatures(
      url: String,
      n_bytes: Int,
      byte_entropy: Double,
      features: Array[Double],
      stripe_sums: Array[Long]
  )

  /** Deterministic fake decoder: byte histogram entropy + an 8-dim folded
    * byte signature. Stands in for image decode / resize / frame-sample. */
  object FakeDecoder extends Serializable {
    val FeatureDim = 8
    def decode(bytes: Array[Byte]): (Double, Array[Double], Array[Long]) = {
      if (bytes == null || bytes.isEmpty)
        return (0.0, Array.fill(FeatureDim)(0.0), Array.fill(FeatureDim)(0L))
      val hist = new Array[Long](256)
      bytes.foreach(b => hist(b & 0xff) += 1)
      val n = bytes.length.toDouble
      var ent = 0.0
      hist.foreach { c =>
        if (c > 0) { val p = c / n; ent -= p * math.log(p) / math.log(2) }
      }
      val sums = new Array[Long](FeatureDim)
      var i = 0
      bytes.foreach { b => sums(i % FeatureDim) += (b & 0xff); i += 1 }
      val denom = 255.0 * math.ceil(n / FeatureDim)
      (ent, sums.map(_ / denom), sums)
    }
  }

  /** Batched decode over a `(url string, html binary)` projection. One
    * decoder per partition (executor-amortized init, like a model
    * singleton); rows processed in `batchSize` groups to model the
    * vectorized-batch contract. */
  def extractFeatures(
      media: DataFrame,
      urlCol: String = "url",
      binCol: String = "html",
      batchSize: Int = 256
  ): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col(urlCol).cast("string"), col(binCol).cast("binary"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val decoder = FakeDecoder // per-partition init point
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (url, bytes) =>
            val (ent, feats, sums) = decoder.decode(bytes)
            MediaFeatures(url, if (bytes == null) 0 else bytes.length, ent,
              feats, sums)
          }
        }
      }
  }
}
