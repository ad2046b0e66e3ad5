package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded grouped top-k state: at most k (score, id) pairs, keeping
  * the k best by (score desc, id asc). Insertion is O(1) for the
  * common reject case (score below the current worst) and O(k) when a
  * candidate displaces — k is small (10..100), so the buffer always
  * fits in a cache line or two.
  */
final class TopKBuf(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0
  /** index of the current worst entry (only valid when n == k) */
  private var worst = 0

  private def isBetter(s: Double, id: Long, i: Int): Boolean =
    s > scores(i) || (s == scores(i) && id < ids(i))

  private def recomputeWorst(): Unit = {
    var w = 0
    var i = 1
    while (i < n) {
      // the worst entry is the one that loses to the current worst
      if (!isBetter(scores(i), ids(i), w)) w = i
      i += 1
    }
    worst = w
  }

  def insert(s: Double, id: Long): Unit = {
    // NaN is uncomparable: it can never win isBetter, so once inside
    // the buffer it would pin `worst` and freeze out every later
    // candidate (and break the sort comparator's contract). A NaN
    // score (0/0 cosine of a zero-norm vector) is "no similarity" —
    // drop it here so the buffer only ever holds ordered values.
    if (s.isNaN) return
    if (n < k) {
      scores(n) = s; ids(n) = id; n += 1
      if (n == k) recomputeWorst()
    } else if (isBetter(s, id, worst)) {
      scores(worst) = s; ids(worst) = id
      recomputeWorst()
    }
  }

  /** Indices sorted by (score desc, id asc). */
  def sortedIdx: Array[Int] =
    Array.range(0, n).sortWith { (a, b) =>
      scores(a) > scores(b) ||
        (scores(a) == scores(b) && ids(a) < ids(b))
    }
}

/** Native grouped top-k aggregate: `topk(score, id, k)` returns the k
  * ids with the highest scores (ties by smaller id), sorted best
  * first. The decisive property at scale: the aggregation state is
  * BOUNDED at k pairs, so map-side partials reduce each partition's
  * contribution to k rows per group — the shuffle carries
  * groups × k × partitions pairs instead of every candidate row,
  * where a rank-window top-k must shuffle and sort ALL candidates.
  * The hot ranking path of the ANN operators (Similarity).
  */
case class TopKPairs(score: Expression, id: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  require(k > 0, s"topk: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  // analysis-time type errors instead of runtime ClassCastExceptions
  // when called via raw SQL with uncast columns (the Column helper
  // `TopKPairs.topk` casts for the caller)
  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (sT, iT) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires (double, bigint) inputs, got ($sT, $iT)")
    }
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    var i = 0
    while (i < other.n) {
      buf.insert(other.scores(i), other.ids(i))
      i += 1
    }
    buf
  }

  override def eval(buf: TopKBuf): Any =
    new GenericArrayData(buf.sortedIdx.map(buf.ids))

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.n * 16)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putDouble(buf.scores(i)).putLong(buf.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuf(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      buf.insert(bb.getDouble(), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "graft_topk"
}

object TopKPairs {
  /** `topk(score, id, k)` as a Column aggregate; requires the session
    * to be built with `spark.sql.extensions=graft.plans.GraftExtensions`.
    */
  def topk(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_topk",
      score.cast(DoubleType), id.cast(LongType),
      org.apache.spark.sql.functions.lit(k))

  /** Registry builder: third argument must be a literal int k. */
  def fromArgs(exprs: Seq[Expression]): TopKPairs = {
    require(exprs.length == 3, "graft_topk(score, id, k)")
    val k = exprs(2) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
      case o => throw new IllegalArgumentException(
        s"graft_topk: k must be a literal int, got $o")
    }
    TopKPairs(exprs(0), exprs(1), k)
  }
}
