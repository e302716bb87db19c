package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Signed-random-projection LSH band keys as ONE native expression.
  *
  * The composed-expression form (one `dot(e, slice(typedLit(plane), ...))`
  * per hyperplane, 128 of them, summed into band keys) is semantically
  * identical but generates an enormous Catalyst tree: seconds of analyzer /
  * optimizer time and janino compilation PER QUERY RUN, dwarfing the actual
  * compute on any corpus. This expression carries the plane matrix as one
  * broadcast-referenced object and emits all band keys in a single primitive
  * loop.
  *
  * Semantics (bit-compatible with the composed form):
  *  - plane i contributes bit `1L << (i % rowsPerBand)` to band `i / rpb`
  *    when its projection (dot over min(|e|, |plane|) elements, left-to-right
  *    from 0.0) is >= 0;
  *  - a NaN projection sets no bit (`NaN >= 0` is false);
  *  - a null vector element nulls that plane's projection -> no bit (the
  *    HOF form's `when(null >= 0, ...)` also fell through to 0).
  */
object SrpKernel {
  def compute(e: ArrayData, planes: Array[Array[Double]], bands: Int): Array[Long] = {
    val rpb = planes.length / bands
    val keys = new Array[Long](bands)
    val n = e.numElements()
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      val m = math.min(n, p.length)
      var acc = 0.0
      var nullSeen = false
      var j = 0
      while (j < m && !nullSeen) {
        if (e.isNullAt(j)) nullSeen = true
        else { acc += e.getDouble(j) * p(j); j += 1 }
      }
      if (!nullSeen && acc >= 0) keys(i / rpb) |= 1L << (i % rpb)
      i += 1
    }
    keys
  }
}

object SrpExpressions {

  case class SrpBandKeys(child: Expression, planes: Array[Array[Double]], bands: Int)
      extends UnaryExpression {
    require(planes.nonEmpty && planes.length % bands == 0, "planes must divide into bands")

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got ${other.simpleString}")
      }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "srp_band_keys"

    override protected def nullSafeEval(input: Any): Any =
      new GenericArrayData(SrpKernel.compute(input.asInstanceOf[ArrayData], planes, bands))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val planesRef = ctx.addReferenceObj("srpPlanes", planes, "double[][]")
        s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  graft.functions.SrpKernel.compute($a, $planesRef, $bands));""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
