package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the 64-bit SimHash (SURVEY §2.13:
  * "a native Catalyst Expression (with doGenCode) beats a Scala UDF").
  *
  * Compared to the UDF form this removes the encoder round-trip (the UDF
  * wrapper converts UTF8String → String → result boxing per row through a
  * generic lambda) and stays inside whole-stage codegen: the generated
  * code calls the static hash directly on the column's UTF8String bytes.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.hashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash64.hashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Single pass over the UTF-8 bytes: per-token FNV/splitmix hash,
    * per-bit majority vote. Byte-level tokenization on ' ' (0x20) is
    * identical to char-level for the engine's single-space text contract,
    * and avoids decoding to UTF-16 entirely. */
  def hashUtf8(s: UTF8String): Long = {
    if (s == null) return 0L
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    val n = bytes.length
    if (n == 0) return 0L
    while (i <= n) {
      if (i == n || bytes(i) == ' '.toByte) {
        if (i > start) {
          var h = 0x9E3779B97F4A7C15L
          var p = start
          while (p < n && p < i) { h = (h ^ bytes(p).toLong) * 0x100000001B3L; p += 1 }
          h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
          h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
          h = h ^ (h >>> 31)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}
