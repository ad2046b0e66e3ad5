package graft.plans

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}

/** Nearest-centroid id for a float-vector column — the large-k IVF
  * assignment path.
  *
  * The small-k path embeds centroids as a `typedlit` array and folds
  * with higher-order functions (Similarity.centArgmax); that literal
  * is a nested tree of k×dim nodes, so analysis cost and plan size
  * blow up around k≈10³·dim≈10². Here the centroid matrix rides as a
  * packed byte payload ON the expression object (the function-registry
  * builder folds the binary literal argument away at construction) —
  * plan size O(1) in k, decoded once per task into primitive arrays
  * the row loop reads directly.
  *
  * Ranking matches centArgmax bit-for-bit: centroids scanned in
  * ascending-id order, sim = (Σ float·float in double, left fold) /
  * norm, strict `>` keeps the lowest id on exact ties.
  */
case class CentroidArgmax(child: Expression, packed: Array[Byte])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_centroid_argmax requires array<float>, got $t")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_centroid_argmax"

  // keep the payload out of plan/tree rendering
  override def toString: String =
    s"graft_centroid_argmax($child, <${packed.length} bytes>)"

  @transient private lazy val (ids, norms, flat, dim) =
    CentroidArgmax.decode(packed)

  /** Tight primitive loop shared by eval and codegen (the generated
    * code makes one virtual call per row; the loop body itself is
    * JIT-compiled Scala over primitive arrays).
    */
  def bestId(v: ArrayData): Long = {
    val n = math.min(v.numElements(), dim)
    var best = -1L
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < ids.length) {
      var s = 0.0
      var i = 0
      val off = c * dim
      while (i < n) {
        s += v.getFloat(i).toDouble * flat(off + i).toDouble
        i += 1
      }
      val sim = s / norms(c)
      if (sim > bestSim) { bestSim = sim; best = ids(c) }
      c += 1
    }
    best
  }

  override def nullSafeEval(a: Any): Any =
    bestId(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centArgmax", this,
      classOf[CentroidArgmax].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.bestId($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CentroidArgmax =
    copy(child = newChild)
}

object CentroidArgmax {

  /** Pack (id, vector, norm) centroids: [k:int][dim:int] k×(id:long)
    * k×(norm:double) k×dim×(float), little-endian.
    */
  def pack(cents: Seq[(Long, Seq[Float], Double)]): Array[Byte] = {
    val k = cents.length
    val dim = if (k == 0) 0 else cents.head._2.length
    val buf = ByteBuffer.allocate(8 + k * 16 + k * dim * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(k).putInt(dim)
    cents.foreach { case (id, _, _) => buf.putLong(id) }
    cents.foreach { case (_, _, n) => buf.putDouble(n) }
    cents.foreach { case (_, v, _) =>
      require(v.length == dim, "ragged centroid dimensions")
      v.foreach(buf.putFloat)
    }
    buf.array()
  }

  private[plans] def decode(bytes: Array[Byte])
      : (Array[Long], Array[Double], Array[Float], Int) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val k = buf.getInt
    val dim = buf.getInt
    val ids = Array.fill(k)(buf.getLong)
    val norms = Array.fill(k)(buf.getDouble)
    val flat = Array.fill(k * dim)(buf.getFloat)
    (ids, norms, flat, dim)
  }

  /** Builds from registry arguments: the binary payload argument must
    * be foldable (a literal) and is folded into the expression object
    * so the plan never carries it as a tree node.
    */
  def fromArgs(exprs: Seq[Expression]): CentroidArgmax = {
    require(exprs.length == 2,
      "graft_centroid_argmax expects (vector, packed_binary)")
    require(exprs(1).foldable && exprs(1).dataType == BinaryType,
      "graft_centroid_argmax: centroid payload must be a binary literal")
    CentroidArgmax(exprs.head,
      exprs(1).eval(null).asInstanceOf[Array[Byte]])
  }

  /** Column-level entry point; requires the session to be built with
    * `spark.sql.extensions=graft.plans.GraftExtensions`.
    */
  def apply(vec: Column, cents: Seq[(Long, Seq[Float], Double)]): Column =
    F.call_function("graft_centroid_argmax", vec, F.lit(pack(cents)))
}
