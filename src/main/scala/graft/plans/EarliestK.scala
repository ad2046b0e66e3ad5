package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded "earliest k events" state: at most k (ts, payload) pairs,
  * keeping the k smallest by (ts asc, payload asc). A binary max-heap
  * whose root is the current WORST (largest) entry makes the hot
  * reject path O(1) — once the buffer is full, an event later than the
  * root never touches the heap — and a displacing insert O(log k), so
  * a pathological user with 10^8 events costs 10^8 comparisons, not
  * 10^8 × k array shifts.
  */
final class EarliestKBuf(val k: Int) {
  val ts = new Array[Long](k)
  val p = new Array[UTF8String](k)
  var n = 0

  /** true when entry i sorts AFTER entry j — (ts, payload) descending
    * test, i.e. "i is worse than j". */
  private def worse(ti: Long, pi: UTF8String, tj: Long, pj: UTF8String): Boolean =
    ti > tj || (ti == tj && pi.compareTo(pj) > 0)

  private def swap(i: Int, j: Int): Unit = {
    val t = ts(i); ts(i) = ts(j); ts(j) = t
    val s = p(i); p(i) = p(j); p(j) = s
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && worse(ts(i), p(i), ts((i - 1) / 2), p((i - 1) / 2))) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < n && worse(ts(l), p(l), ts(m), p(m))) m = l
      if (r < n && worse(ts(r), p(r), ts(m), p(m))) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  /** true when (t, s) would enter the buffer — the O(1) hot-path test
    * callers use to avoid paying for a payload copy on rejects. */
  def wouldAccept(t: Long, s: UTF8String): Boolean =
    n < k || worse(ts(0), p(0), t, s)

  def insert(t: Long, s: UTF8String): Unit =
    if (n < k) {
      ts(n) = t; p(n) = s; n += 1; siftUp(n - 1)
    } else if (worse(ts(0), p(0), t, s)) {
      ts(0) = t; p(0) = s; siftDown()
    }

  /** Indices sorted ascending by (ts, payload). */
  def sortedIdx: Array[Int] =
    Array.range(0, n).sortWith { (a, b) =>
      ts(a) < ts(b) || (ts(a) == ts(b) && p(a).compareTo(p(b)) < 0)
    }
}

/** Native bounded event-collection aggregate:
  * `graft_earliest_k(ts, payload, k)` returns the group's k EARLIEST
  * (ts asc, payload asc) events as a sorted array<struct<ts, p>>.
  *
  * This is the state bound for the event-sequence operators (funnel /
  * paths / transitions): where `collect_list` holds EVERY event of the
  * group in one aggregation buffer (a 10^8-event bot user = a multi-GB
  * array), this buffer never exceeds k entries, and — like TopKPairs —
  * map-side partials reduce each partition's contribution to k rows
  * per group before the shuffle.
  */
case class EarliestK(tsExpr: Expression, payload: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[EarliestKBuf] {

  require(k > 0, s"graft_earliest_k: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(tsExpr, payload)
  override def checkInputDataTypes(): TypeCheckResult =
    (tsExpr.dataType, payload.dataType) match {
      case (LongType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (tT, pT) => TypeCheckResult.TypeCheckFailure(
        s"graft_earliest_k requires (bigint, string) inputs, got ($tT, $pT)")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ts", LongType, nullable = false),
      StructField("p", StringType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): EarliestKBuf = new EarliestKBuf(k)

  override def update(buf: EarliestKBuf, input: InternalRow): EarliestKBuf = {
    val t = tsExpr.eval(input)
    val s = payload.eval(input)
    if (t != null && s != null) {
      val tv = t.asInstanceOf[Long]
      val sv = s.asInstanceOf[UTF8String]
      // test BEFORE cloning: on the bot-user hot path (buffer full,
      // event later than the worst entry) the reject is O(1) with
      // zero allocation; the copy (the UTF8String may point into a
      // reused row buffer) happens only on actual inserts
      if (buf.wouldAccept(tv, sv)) buf.insert(tv, sv.clone())
    }
    buf
  }

  override def merge(buf: EarliestKBuf, other: EarliestKBuf): EarliestKBuf = {
    var i = 0
    while (i < other.n) { buf.insert(other.ts(i), other.p(i)); i += 1 }
    buf
  }

  override def eval(buf: EarliestKBuf): Any =
    new GenericArrayData(buf.sortedIdx.map { i =>
      new GenericInternalRow(Array[Any](buf.ts(i), buf.p(i)))
    })

  override def serialize(buf: EarliestKBuf): Array[Byte] = {
    var bytes = 0
    var i = 0
    while (i < buf.n) { bytes += buf.p(i).numBytes(); i += 1 }
    val bb = ByteBuffer.allocate(8 + buf.n * 12 + bytes)
    bb.putInt(buf.k).putInt(buf.n)
    i = 0
    while (i < buf.n) {
      bb.putLong(buf.ts(i))
      val b = buf.p(i).getBytes
      bb.putInt(b.length).put(b)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): EarliestKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new EarliestKBuf(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val t = bb.getLong()
      val b = new Array[Byte](bb.getInt())
      bb.get(b)
      buf.insert(t, UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): EarliestK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): EarliestK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EarliestK =
    copy(tsExpr = newChildren(0), payload = newChildren(1))

  override def prettyName: String = "graft_earliest_k"
}

object EarliestK {
  /** `earliestK(ts, payload, k)` as a Column aggregate; requires the
    * session to be built with
    * `spark.sql.extensions=graft.plans.GraftExtensions`.
    */
  def earliestK(ts: Column, payload: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_earliest_k",
      ts.cast(LongType), payload.cast(StringType),
      org.apache.spark.sql.functions.lit(k))

  /** Registry builder: third argument must be a literal int k. */
  def fromArgs(exprs: Seq[Expression]): EarliestK = {
    require(exprs.length == 3, "graft_earliest_k(ts, payload, k)")
    val k = exprs(2) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
      case o => throw new IllegalArgumentException(
        s"graft_earliest_k: k must be a literal int, got $o")
    }
    EarliestK(exprs.head, exprs(1), k)
  }
}
