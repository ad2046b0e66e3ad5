package graft.plans

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}

/** The full k-wide MinHash signature from a base-hash array in ONE
  * pass: sig[i] = min over h of (a_i·h + b_i) mod P. The HOF form is
  * k separate `array_min(transform(hs, ...))` nodes, each walking the
  * array through an interpreted lambda — ~k×|hs| interpreted calls
  * per row on the hottest scan of the dedup pipeline. Here the
  * (a, b) family rides as a packed payload and the k minima come out
  * of one primitive loop.
  *
  * Arithmetic is EXACT long math identical to the fold ((a·h+b) % P
  * with a < 2^30, h < P < 2^31 — no overflow), so signatures are
  * bit-identical to the HOF chain and the frozen probe constants and
  * SQL oracle mirrors are unaffected. Null ELEMENTS are skipped
  * exactly like array_min; an all-null/empty array yields an array
  * of k nulls. A NULL input array yields NULL — an intentional
  * semantic change from the HOF fold, which produced an array of k
  * nulls for null input (engine-wide convention: null text/tokens
  * propagate as null, like PlaneSigs and the SQL mirrors; both forms
  * collapse identically under the concat_ws the consumers apply).
  */
case class AffineMinHash(child: Expression, packed: Array[Byte])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_affine_minhash requires array<bigint>, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "graft_affine_minhash"

  override def toString: String =
    s"graft_affine_minhash($child, <${packed.length} bytes>)"

  @transient private lazy val (p, as, bs) = AffineMinHash.decode(packed)

  /** Tight primitive loop shared by eval and codegen. Any non-null
    * element updates EVERY min, so one flag covers all k entries —
    * values are < P << Long.MaxValue, so MaxValue is a safe identity.
    */
  def sig(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    val k = as.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var any = false
    var j = 0
    while (j < n) {
      if (!hs.isNullAt(j)) {
        any = true
        val h = hs.getLong(j)
        var i = 0
        while (i < k) {
          val v = (as(i) * h + bs(i)) % p
          if (v < out(i)) out(i) = v
          i += 1
        }
      }
      j += 1
    }
    // array_min semantics: no non-null element => all-null entries
    if (any) new GenericArrayData(out)
    else new GenericArrayData(new Array[Any](k))
  }

  override def nullSafeEval(a: Any): Any =
    sig(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("affineMinHash", this,
      classOf[AffineMinHash].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.sig($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): AffineMinHash =
    copy(child = newChild)
}

object AffineMinHash {

  /** Pack the family: [k:int][P:long] then k×(a:long) k×(b:long),
    * little-endian.
    */
  def pack(p: Long, fam: Seq[(Long, Long)]): Array[Byte] = {
    val k = fam.length
    val buf = ByteBuffer.allocate(12 + k * 16).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(k).putLong(p)
    fam.foreach { case (a, _) => buf.putLong(a) }
    fam.foreach { case (_, b) => buf.putLong(b) }
    buf.array()
  }

  private[plans] def decode(bytes: Array[Byte])
      : (Long, Array[Long], Array[Long]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val k = buf.getInt
    val p = buf.getLong
    val as = Array.fill(k)(buf.getLong)
    val bs = Array.fill(k)(buf.getLong)
    (p, as, bs)
  }

  def fromArgs(exprs: Seq[Expression]): AffineMinHash = {
    require(exprs.length == 2,
      "graft_affine_minhash expects (hashes, packed_binary)")
    require(exprs(1).foldable && exprs(1).dataType == BinaryType,
      "graft_affine_minhash: family payload must be a binary literal")
    AffineMinHash(exprs.head,
      exprs(1).eval(null).asInstanceOf[Array[Byte]])
  }

  /** Column-level entry point; requires the session to be built with
    * `spark.sql.extensions=graft.plans.GraftExtensions`.
    */
  def apply(hashes: Column, p: Long, fam: Seq[(Long, Long)]): Column =
    F.call_function("graft_affine_minhash", hashes, F.lit(pack(p, fam)))
}
