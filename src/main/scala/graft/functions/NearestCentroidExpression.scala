package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression assigning an embedding to its nearest
  * centroid (squared-L2 argmin, first-minimum tie-break) — the IVF coarse
  * quantization projection.
  *
  * Replaces the MLlib `model.transform` assignment whose lineage carried a
  * boxed `Seq[Float] → ml.linalg.Vector` UDF per row: here the generated
  * code makes one static call over the unsafe array data, stays inside
  * whole-stage codegen, and the (tiny — nlist × dim doubles) centroid
  * matrix ships with the plan as a reference object, the same way Spark
  * broadcasts literal arrays. MLlib remains in the FIT path only
  * (`Ann.ivfIndex`), where the quantizer is trained on a bounded sample.
  */
case class NearestCentroid(child: Expression, centers: Seq[Seq[Double]])
    extends UnaryExpression {

  require(centers.nonEmpty && centers.head.nonEmpty,
    "graft_nearest_centroid needs a non-empty centroid matrix")
  require(centers.forall(_.length == centers.head.length),
    "graft_nearest_centroid centroids must share one dimension")

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => null
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case FloatType | DoubleType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> input, got ${child.dataType.sql}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  @transient private lazy val flat: Array[Double] = centers.flatten.toArray
  private def k: Int = centers.length
  private def isFloat: Boolean = elemType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (isFloat) NearestCentroid.assignFloat(a, flat, k)
    else NearestCentroid.assignDouble(a, flat, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", flat, "double[]")
    val fn = if (isFloat) "assignFloat" else "assignDouble"
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NearestCentroid.$fn($c, $ref, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  /** Input shorter than the trained dim would read past the end of the
    * unsafe array buffer — no exception, just garbage distances and
    * silently wrong list assignments. Fail loudly instead (the MLlib
    * transform this replaces validated vector size too). */
  private def checkDim(a: ArrayData, dim: Int): Unit =
    if (a.numElements() < dim)
      throw new IllegalArgumentException(
        s"graft_nearest_centroid: embedding has ${a.numElements()} " +
          s"elements, centroids have dimension $dim")

  /** `flat` is the [k][dim] centroid matrix flattened row-major. */
  def assignFloat(a: ArrayData, flat: Array[Double], k: Int): Int = {
    val dim = flat.length / k
    checkDim(a, dim)
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    var off = 0
    while (c < k) {
      var s = 0.0
      var i = 0
      while (i < dim) { val d = a.getFloat(i) - flat(off + i); s += d * d; i += 1 }
      if (s < bestD) { bestD = s; best = c }
      off += dim
      c += 1
    }
    best
  }

  def assignDouble(a: ArrayData, flat: Array[Double], k: Int): Int = {
    val dim = flat.length / k
    checkDim(a, dim)
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    var off = 0
    while (c < k) {
      var s = 0.0
      var i = 0
      while (i < dim) { val d = a.getDouble(i) - flat(off + i); s += d * d; i += 1 }
      if (s < bestD) { bestD = s; best = c }
      off += dim
      c += 1
    }
    best
  }
}
