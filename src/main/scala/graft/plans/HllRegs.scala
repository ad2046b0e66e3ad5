package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Native md5-HLL estimator: `graft_hll_regs(hv, p)` aggregates the
  * 60-bit md5-derived hashes `hv` (PF/TextAnalysis.h60 of the key)
  * into 2^p max-rank registers and evaluates to the SAME rounded
  * estimate as `PF.hllMd5` — but as ONE bounded-buffer aggregate
  * instead of a per-(group,bucket) exchange, so a multi-column
  * profile keeps its single-scan single-aggregate shape (no Expand,
  * no extra exchange) and each column costs one 2^p-byte buffer.
  *
  * Every intermediate is deterministic integer arithmetic and the
  * final estimate is rounded to 3 decimals exactly like hllMd5, so a
  * DuckDB oracle replays the value bit-for-bit (cf. the x30 oracle).
  */
case class HllRegs(hash: Expression, p: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 7 && p <= 16, s"graft_hll_regs: p in [7,16], got $p")
  private val m = 1 << p
  private val maxRho = 61 - p

  override def children: Seq[Expression] = Seq(hash)
  override def checkInputDataTypes(): TypeCheckResult =
    hash.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_hll_regs requires a bigint hash input, got $t")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val h = hash.eval(input)
    if (h != null) {
      val hv = h.asInstanceOf[Long]
      val bucket = (hv & (m - 1)).toInt
      val w = hv >>> p
      // leading-rank: maxRho for an all-zero word, else maxRho - bitlen
      // (integer, no float log — mirrors `length(bin(w))` in SQL)
      val rho =
        if (w == 0L) maxRho else maxRho - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    // integer register sum: empty register contributes 2^maxRho —
    // identical branches and arithmetic to PF.hllMd5's estimate
    var s = 0L
    var v = 0L
    var i = 0
    while (i < m) {
      s += 1L << (maxRho - buf(i))
      if (buf(i) == 0) v += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val eRaw = alpha * m.toDouble * m.toDouble /
      (s.toDouble / math.pow(2.0, maxRho))
    val est =
      if (eRaw <= 2.5 * m && v > 0) m.toDouble * math.log(m.toDouble / v)
      else eRaw
    // HALF_UP at 3 decimals, same as F.round — the cross-engine ulp
    // shield on the one ln/div that touches floats
    BigDecimal(est).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegs =
    copy(hash = newChildren(0))

  override def prettyName: String = "graft_hll_regs"
}

object HllRegs {
  /** Approx distinct of `key` as a Column aggregate: hashes with the
    * engine's portable h60 ("hll:" domain prefix, like PF.hllMd5) and
    * estimates from 2^p registers. Requires the GraftExtensions
    * session.
    */
  def approxDistinctMd5(key: Column, p: Int = 12): Column =
    org.apache.spark.sql.functions.call_function("graft_hll_regs",
      graft.ext.TextAnalysis.h60(org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("hll:"),
        key.cast(StringType))),
      org.apache.spark.sql.functions.lit(p))

  /** Registry builder: second argument must be a literal int p. */
  def fromArgs(exprs: Seq[Expression]): HllRegs = {
    require(exprs.length == 2, "graft_hll_regs(hash, p)")
    val p = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
      case o => throw new IllegalArgumentException(
        s"graft_hll_regs: p must be a literal int, got $o")
    }
    HllRegs(exprs.head, p)
  }
}
