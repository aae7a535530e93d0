package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression producing the DISTINCT word `n`-gram
  * shingles of a text — semantically identical to
  * `array_distinct(Dedup.shinglesFromToks(split(text, " "), n))` but one
  * byte-level pass instead of an interpreted HOF chain (higher-order
  * functions are CodegenFallback: per shingle the HOF form allocates a
  * token-slice array and re-joins it; this form slices the original
  * UTF-8 bytes in place — the shingle IS a view of the input, since
  * single-space-joined tokens reconstruct the source substring).
  *
  * First-occurrence order, matching `array_distinct`.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  /** One pass: record token start offsets (split-on-single-space
    * semantics — consecutive spaces produce empty tokens, exactly like
    * Spark's `split(text, " ")`), then emit shingle `i` as the byte range
    * `[starts(i), starts(i+n)-1)` of the input (or to the end for the
    * last), deduplicated in first-occurrence order. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val total = bytes.length
    // token start offsets: 0, and after every 0x20 (UTF-8 multibyte
    // sequences never contain 0x20, so byte-level scanning is exact)
    var nToks = 1
    var i = 0
    while (i < total) { if (bytes(i) == ' '.toByte) nToks += 1; i += 1 }
    if (nToks < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nToks)
    var t = 1
    i = 0
    while (i < total) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val nShingles = nToks - n + 1
    val seen = new java.util.LinkedHashSet[UTF8String](nShingles * 2)
    var sIdx = 0
    while (sIdx < nShingles) {
      val from = starts(sIdx)
      val until = if (sIdx + n < nToks) starts(sIdx + n) - 1 else total
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      sIdx += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}
