package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items state: at most `cap` (term, count)
  * counters. The classic streaming guarantee holds after arbitrary
  * merges (Agarwal et al., "Mergeable Summaries", PODS'12):
  * `true - n/(cap+1) <= est <= true` for every term, and any term
  * with true frequency > n/(cap+1) is guaranteed present.
  */
final class FreqBuf(val cap: Int) {
  val counts = new java.util.HashMap[UTF8String, java.lang.Long](cap * 2)

  /** MG update: bump if tracked; admit if room; else decrement all. */
  def add(term: UTF8String, w: Long): Unit = {
    val cur = counts.get(term)
    if (cur != null) {
      counts.put(term, cur + w)
    } else if (counts.size < cap) {
      // eval-time UTF8Strings can alias a reused scan buffer — copy
      counts.put(term.clone(), w)
    } else {
      // decrement every counter by w (weighted MG), dropping zeros;
      // the arriving term absorbs the remainder if it survives
      val it = counts.entrySet().iterator()
      var minC = Long.MaxValue
      while (it.hasNext) { val c = it.next().getValue; if (c < minC) minC = c }
      val dec = math.min(minC, w)
      val it2 = counts.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        val nv = e.getValue - dec
        if (nv <= 0L) it2.remove() else e.setValue(nv)
      }
      val rem = w - dec
      if (rem > 0L) add(term, rem)
    }
  }

  /** Merge-then-trim: sum counters, then subtract the (cap+1)-th
    * largest count from all and drop non-positives.
    */
  def merge(other: FreqBuf): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      if (cur != null) counts.put(e.getKey, cur + e.getValue)
      else counts.put(e.getKey, e.getValue)
    }
    if (counts.size > cap) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(counts.size - cap - 1) // (cap+1)-th largest
      val it2 = counts.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        val nv = e.getValue - cut
        if (nv <= 0L) it2.remove() else e.setValue(nv)
      }
    }
  }
}

/** Native Misra-Gries heavy-hitters aggregate:
  * `graft_freq_sketch(term, cap)` returns the tracked
  * (term, estimated count) pairs sorted by (count desc, term asc).
  *
  * The decisive property at scale: aggregation state is BOUNDED at
  * `cap` counters per partition regardless of vocabulary size, so the
  * shuffle carries cap rows per partition where an exact top-k
  * groupBy must shuffle every distinct term. With
  * cap >= |vocabulary| no decrement ever fires and the result is
  * exact (the deterministic configuration the oracle checks); below
  * that the counts are order-dependent lower bounds within n/(cap+1)
  * of truth (the probe asserts the guarantee in-query).
  */
case class FreqSketch(term: Expression, cap: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqBuf] {

  require(cap > 0, s"freq_sketch: capacity must be positive, got $cap")

  override def children: Seq[Expression] = Seq(term)
  override def checkInputDataTypes(): TypeCheckResult =
    term.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_freq_sketch requires a string input, got $t")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): FreqBuf = new FreqBuf(cap)

  override def update(buf: FreqBuf, input: InternalRow): FreqBuf = {
    val t = term.eval(input)
    if (t != null) buf.add(t.asInstanceOf[UTF8String], 1L)
    buf
  }

  override def merge(buf: FreqBuf, other: FreqBuf): FreqBuf = {
    buf.merge(other); buf
  }

  override def eval(buf: FreqBuf): Any = {
    val entries = new Array[(UTF8String, Long)](buf.counts.size)
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    val sorted = entries.sortWith { (a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1.compareTo(b._1) < 0)
    }
    new GenericArrayData(sorted.map { case (t, c) =>
      new GenericInternalRow(Array[Any](t, c))
    })
  }

  override def serialize(buf: FreqBuf): Array[Byte] = {
    var bytes = 0
    val it0 = buf.counts.keySet().iterator()
    while (it0.hasNext) bytes += it0.next().numBytes()
    val bb = ByteBuffer.allocate(8 + buf.counts.size * 12 + bytes)
    bb.putInt(buf.cap).putInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val tb = e.getKey.getBytes
      bb.putInt(tb.length).put(tb).putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new FreqBuf(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val tb = new Array[Byte](len)
      bb.get(tb)
      buf.counts.put(UTF8String.fromBytes(tb), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(term = newChildren(0))

  override def prettyName: String = "graft_freq_sketch"
}

object FreqSketch {
  /** `freqSketch(term, cap)` as a Column aggregate; requires
    * GraftExtensions.
    */
  def freqSketch(term: Column, cap: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_freq_sketch",
      term.cast(StringType), org.apache.spark.sql.functions.lit(cap))

  /** Registry builder: second argument must be a literal int. */
  def fromArgs(exprs: Seq[Expression]): FreqSketch = {
    require(exprs.length == 2, "graft_freq_sketch(term, cap)")
    val cap = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
      case o => throw new IllegalArgumentException(
        s"graft_freq_sketch: capacity must be a literal int, got $o")
    }
    FreqSketch(exprs(0), cap)
  }
}
