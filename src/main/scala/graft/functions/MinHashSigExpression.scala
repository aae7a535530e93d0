package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the k-permutation MinHash signature
  * over word `n`-gram shingles — the one-pass dedup signature
  * ([[graft.ops.Dedup.minhashSignatureScala]] semantics) as codegen'd
  * UTF-8 byte work instead of a Scala UDF: no String materialization, no
  * encoder boxing, no WholeStageCodegen break at the projection.
  *
  * One pass: record token start offsets (single-space semantics), FNV-1a
  * each shingle's bytes once, then mix per permutation lane
  * (splitmix64-derived — deterministic on any cluster). Documents with
  * fewer than `n` tokens have no shingles and yield the all-MaxValue
  * signature, matching the empty-shingle branch of the HOF form.
  */
case class MinHashSig(child: Expression, k: Int, n: Int)
    extends UnaryExpression {

  require(k >= 1 && n >= 1, "k and n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], k, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSig.compute($c, $k, $n)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  def compute(s: UTF8String, k: Int, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(computeBytes(s.getBytes, k, n))

  /** Byte-level one-pass signature (UTF-8 multibyte sequences never
    * contain 0x20, so byte tokenization is exact; for ASCII text the
    * hashes are bit-identical to the historical char-level form). */
  def computeBytes(bytes: Array[Byte], k: Int, n: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val total = bytes.length
    // token start offsets (single-space tokenization semantics)
    var nToks = 1
    var i = 0
    while (i < total) { if (bytes(i) == ' '.toByte) nToks += 1; i += 1 }
    if (nToks < n) return sig
    val starts = new Array[Int](nToks)
    var t = 1
    i = 0
    while (i < total) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val nShingles = nToks - n + 1
    var sIdx = 0
    while (sIdx < nShingles) {
      val from = starts(sIdx)
      val until = if (sIdx + n < nToks) starts(sIdx + n) - 1 else total
      // FNV-1a over the shingle's bytes, then a splitmix64 finalizer
      var h = 0xCBF29CE484222325L
      var p = from
      while (p < until) { h = (h ^ (bytes(p) & 0xFFL)) * 0x100000001B3L; p += 1 }
      h = mix(h)
      var j = 0
      while (j < k) {
        val hj = mix(h ^ (j * 0x9E3779B97F4A7C15L))
        if (hj < sig(j)) sig(j) = hj
        j += 1
      }
      sIdx += 1
    }
    sig
  }

  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
