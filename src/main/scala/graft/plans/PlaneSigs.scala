package graft.plans

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}

/** All multi-table LSH signatures of a float vector in ONE pass: the
  * nTables × nPlanes hyperplane matrix rides as a packed byte payload
  * on the expression object, so plan size is O(1) in tables×planes.
  * The HOF form (one aggregate-over-zip_with node per plane) builds a
  * tree of T×P×dim literal nodes whose analysis + codegen time dwarfs
  * the data path once T×P reaches the OR-amplification range (192
  * planes ≈ seconds of plan compilation per query, at any data size).
  *
  * Bit j of sigs[t] = (dot(vec, plane[t·nPlanes+j]) >= 0), each dot
  * accumulated left-to-right in double — the same IEEE sequence as
  * FloatVecDot and the lshSignature HOF chain, so signatures are
  * bit-identical to the per-plane fold.
  */
case class PlaneSigs(child: Expression, packed: Array[Byte])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_plane_sigs requires array<float>, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_plane_sigs"

  // keep the payload out of plan/tree rendering
  override def toString: String =
    s"graft_plane_sigs($child, <${packed.length} bytes>)"

  @transient private lazy val (nTables, nPlanes, dim, flat) =
    PlaneSigs.decode(packed)

  /** Tight primitive loop shared by eval and codegen (one virtual call
    * per row; the body is JIT-compiled Scala over primitive arrays).
    */
  def sigs(v: ArrayData): ArrayData = {
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var j = 0
      while (j < nPlanes) {
        val off = (t * nPlanes + j) * dim
        var s = 0.0
        var i = 0
        while (i < n) {
          s += v.getFloat(i).toDouble * flat(off + i)
          i += 1
        }
        if (s >= 0) sig |= (1L << j)
        j += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    sigs(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planeSigs", this,
      classOf[PlaneSigs].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.sigs($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PlaneSigs =
    copy(child = newChild)
}

object PlaneSigs {

  /** Pack the plane matrix: [nTables:int][nPlanes:int][dim:int] then
    * nTables×nPlanes×dim doubles in (table, plane, dim) row order,
    * little-endian.
    */
  def pack(nTables: Int, nPlanes: Int, dim: Int,
           planes: Array[Double]): Array[Byte] = {
    require(planes.length == nTables * nPlanes * dim,
      s"plane matrix size ${planes.length} != $nTables*$nPlanes*$dim")
    val buf = ByteBuffer.allocate(12 + planes.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(nTables).putInt(nPlanes).putInt(dim)
    planes.foreach(buf.putDouble)
    buf.array()
  }

  private[plans] def decode(bytes: Array[Byte])
      : (Int, Int, Int, Array[Double]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val t = buf.getInt
    val p = buf.getInt
    val d = buf.getInt
    (t, p, d, Array.fill(t * p * d)(buf.getDouble))
  }

  /** Builds from registry arguments: the binary payload must be a
    * foldable literal, folded into the expression object so the plan
    * never carries it as a tree node.
    */
  def fromArgs(exprs: Seq[Expression]): PlaneSigs = {
    require(exprs.length == 2,
      "graft_plane_sigs expects (vector, packed_binary)")
    require(exprs(1).foldable && exprs(1).dataType == BinaryType,
      "graft_plane_sigs: plane payload must be a binary literal")
    PlaneSigs(exprs.head,
      exprs(1).eval(null).asInstanceOf[Array[Byte]])
  }

  /** Column-level entry point; requires the session to be built with
    * `spark.sql.extensions=graft.plans.GraftExtensions`.
    */
  def apply(vec: Column, nTables: Int, nPlanes: Int, dim: Int,
            planes: Array[Double]): Column =
    F.call_function("graft_plane_sigs", vec,
      F.lit(pack(nTables, nPlanes, dim, planes)))
}
