package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{broadcast, col, lit}

/** Global row index as a PURE COLUMN computation.
  *
  * `rdd.zipWithIndex` is the classic way to attach a global index
  * without a one-partition window, but it exits Tungsten: every row is
  * deserialized to a `Row`, mapped through a Scala closure, and
  * re-encoded (`createDataFrame(rdd, schema)` breaks whole-stage
  * codegen on both sides). This computes the same index with Catalyst
  * expressions only:
  *
  *   1. freeze the frame (`localCheckpoint`) so both passes see one
  *      partition layout;
  *   2. per-partition row counts via `groupBy(spark_partition_id())` —
  *      partial aggregation makes the shuffle payload one row per
  *      partition, never data rows;
  *   3. index = offset(pid) + local row number, where the local row
  *      number is the low 33 bits of `monotonically_increasing_id()`
  *      (documented layout: `partitionId << 33 | rowInPartition`, the
  *      same partition index `spark_partition_id()` returns).
  *
  * The offset lookup is a small map literal below `mapLiteralMax`
  * partitions and a broadcast-hash join above it (a 100k-partition job
  * should not carry a 100k-entry literal in every task's plan). Both
  * stay inside whole-stage codegen.
  *
  * Limits: 2^33 rows (~8.6e9) per partition — any sanely-sized
  * partition is orders of magnitude below. The checkpoint is the same
  * determinism guarantee `zipWithIndex` gets from its fixed RDD
  * lineage; without it, the count job and the read job would be two
  * separate queries over a possibly nondeterministic / AQE-replanned
  * source.
  */
object GlobalIndex {

  private val LocalBits = 33
  private val LocalMask = (1L << LocalBits) - 1

  /** Returns `df` plus a LongType column `name` holding `startAt`,
    * `startAt`+1, ... in the frame's current partition order.
    */
  def withIndex(df: DataFrame, name: String, startAt: Long = 0L,
                mapLiteralMax: Int = 4096): DataFrame =
    withIndexAndCount(df, name, startAt, mapLiteralMax)._1

  /** As `withIndex`, also returning the total row count — already known
    * from the per-partition counts pass, no extra job.
    */
  def withIndexAndCount(df: DataFrame, name: String, startAt: Long = 0L,
                        mapLiteralMax: Int = 4096): (DataFrame, Long) = {
    val frozen = df.localCheckpoint(true)
    val pid = F.spark_partition_id()
    val counts = frozen.groupBy(pid.as("_gi_pid"))
      .agg(F.count(lit(1)).as("_gi_n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = startAt
    val offsets = counts.map { case (p, n) => val o = acc; acc += n; (p, o) }
    val local = F.monotonically_increasing_id().bitwiseAND(lit(LocalMask))
    val indexed = if (offsets.length <= mapLiteralMax) {
      val off =
        if (offsets.isEmpty) lit(startAt)
        else F.element_at(F.typedlit(offsets.toMap), pid)
      frozen.withColumn(name, (off + local).as(name))
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      val offDf = offsets.toSeq.toDF("_gi_pid", "_gi_off")
      // pid AND the local row number must be evaluated in the scan
      // stage over the frozen frame, before the join changes the
      // evaluation context
      frozen.withColumn("_gi_pid", pid).withColumn("_gi_local", local)
        .join(broadcast(offDf), "_gi_pid")
        .withColumn(name, col("_gi_off") + col("_gi_local"))
        .drop("_gi_pid", "_gi_off", "_gi_local")
    }
    (indexed, acc - startAt)
  }
}
