package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression computing ALL random-hyperplane LSH band keys
  * of an embedding in ONE traversal.
  *
  * Replaces the round-1 column composition that expanded into bands×bits
  * independent interpreted `aggregate` HOFs over per-bit literal hyperplane
  * arrays — 32 full re-traversals of every embedding per row with zero
  * codegen (the 17 s kg09 outlier). Here the generated code makes a single
  * static call; the hyperplane matrix is materialized once per JVM from the
  * same seeded hash (`hashUnit`) used driver-side, so no matrices ship with
  * the plan and band keys are bit-identical between driver and executors.
  * (Keys intentionally DIFFER from the round-1 outputs: this change also
  * fixes hashUnit's divisor, 2^52 → 2^53, whose bias made components land
  * in [-1, 3) instead of [-1, 1) — persisted round-1 bucket assignments are
  * not comparable.)
  *
  * Band `b`, bit `j` uses hyperplane components
  * `hashUnit(seed + b*1000003, j, i)` — band 0 therefore equals the
  * single-band `lshBucket(seed)` form.
  */
case class LshBandKeys(child: Expression, bits: Int, bands: Int, seed: Long)
    extends UnaryExpression {

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => null
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case FloatType | DoubleType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> input, got ${child.dataType.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_band_keys"

  private def isFloat: Boolean = elemType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (isFloat) LshBandKeys.bandKeysFloat(a, bits, bands, seed)
    else LshBandKeys.bandKeysDouble(a, bits, bands, seed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "bandKeysFloat" else "bandKeysDouble"
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshBandKeys.$fn($c, $bits, $bands, ${seed}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)
}

object LshBandKeys {

  /** Deterministic pseudo-random unit in [-1, 1) — splitmix64 of (seed, j, i).
    * The single source of hyperplane components for executors AND the
    * driver-side query-bucket computation.
    *
    * `z >>> 11` keeps 53 bits, so the divisor must be 2⁵³ for a unit in
    * [0,1). The round-1 form divided by 2⁵² — components landed in [-1,3)
    * with mean +1, biasing every LSH bit toward sign(sum(v)): centered
    * test embeddings masked it, but positive-leaning learned embeddings
    * would have piled into one bucket and been dropped by the skew guard. */
  def hashUnit(seed: Long, j: Int, i: Int): Double = {
    var z = seed + j * 0x9E3779B97F4A7C15L + i * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  /** Per-JVM hyperplane cache, keyed by (bits, bands, seed, dim); layout is
    * [band][bit][dim] flattened. Rebuilt identically on any executor. */
  private val planeCache =
    new ConcurrentHashMap[(Int, Int, Long, Int), Array[Double]]()

  private def planes(bits: Int, bands: Int, seed: Long, dim: Int): Array[Double] =
    planeCache.computeIfAbsent((bits, bands, seed, dim), _ => {
      val arr = new Array[Double](bands * bits * dim)
      var b = 0
      var off = 0
      while (b < bands) {
        val bandSeed = seed + b * 1000003L
        var j = 0
        while (j < bits) {
          var i = 0
          while (i < dim) { arr(off + i) = hashUnit(bandSeed, j, i); i += 1 }
          off += dim
          j += 1
        }
        b += 1
      }
      arr
    })

  def bandKeysFloat(a: ArrayData, bits: Int, bands: Int, seed: Long): ArrayData = {
    val dim = a.numElements()
    val pl = planes(bits, bands, seed, dim)
    val keys = new Array[Long](bands)
    var b = 0
    var off = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < bits) {
        var d = 0.0
        var i = 0
        while (i < dim) { d += a.getFloat(i).toDouble * pl(off + i); i += 1 }
        if (d >= 0) key |= (1L << j)
        off += dim
        j += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  def bandKeysDouble(a: ArrayData, bits: Int, bands: Int, seed: Long): ArrayData = {
    val dim = a.numElements()
    val pl = planes(bits, bands, seed, dim)
    val keys = new Array[Long](bands)
    var b = 0
    var off = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < bits) {
        var d = 0.0
        var i = 0
        while (i < dim) { d += a.getDouble(i) * pl(off + i); i += 1 }
        if (d >= 0) key |= (1L << j)
        off += dim
        j += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }
}
