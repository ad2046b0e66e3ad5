package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.LongType

/** Table-maintenance operators for parquet datasets at scale —
  * extension surface with no reference counterpart (the reference
  * delegates storage to the target SQL database; a Spark-native engine
  * owns its files and must manage them).
  *
  * Two jobs a 100 TB corpus needs constantly:
  *  - **compaction**: streaming/incremental ingest leaves thousands of
  *    small files per partition; scans then pay one task + one open per
  *    file. Rewriting to ~targetBytes files restores scan efficiency.
  *  - **multi-dimensional clustering (Z-order)**: range queries over
  *    two dimensions can't be served by a sort on either one alone;
  *    interleaving the dimensions' bits into one Z-value and clustering
  *    files by it bounds BOTH dimensions' min/max per file, so a
  *    2-D range predicate touches a handful of files instead of all of
  *    them (the same layout trick Delta's OPTIMIZE ZORDER applies).
  */
object Maintenance {

  /** Total length in bytes of the (recursively listed) files under
    * `dir`, via the Hadoop FileSystem API (works on any FS Spark can
    * read — local, HDFS, S3; see Fs's java.io.File warning).
    */
  def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }

  /** Compact the parquet dataset at `inDir` into approximately
    * `targetBytes`-sized files at `outDir`; returns the file count
    * chosen. `coalesce` (not repartition) keeps it shuffle-free: the
    * read tasks are merged, never re-keyed — compaction moves bytes
    * once, through no exchange. Parallelism during the rewrite is
    * capped at the output file count, which is what bounds memory per
    * writer too; at 100 TB you compact per partition-subdirectory
    * (each call is one subdirectory), not the whole table in one job.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val n = math.max(1L,
      (dirBytes(spark, inDir) + targetBytes - 1) / targetBytes).toInt
    compactTo(spark, inDir, outDir, n)
  }

  /** Compact to an exact output file count (the deterministic variant
    * the tests and oracle queries use).
    */
  def compactTo(spark: SparkSession, inDir: String, outDir: String,
                nFiles: Int): Int = {
    require(nFiles > 0, s"nFiles must be > 0, got $nFiles")
    spark.read.parquet(inDir).coalesce(nFiles)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** Write `df` clustered by the Z-order (Morton) interleave of two
    * integer dimension columns. Rows whose Z-values share the top
    * `bucketBits` bits land in the same file, so every file covers a
    * small aligned rectangle of the (a, b) space — its parquet min/max
    * stats on BOTH columns are narrow, and a conjunctive range filter
    * prunes to the few files whose rectangle intersects it. One
    * exchange (on the Z-bucket) paid at write time; the Z-bucket is a
    * PURE function of the row (no range-sampling nondeterminism).
    *
    * `aCol`/`bCol` must be non-negative and < 2^bits (callers bucket
    * raw dimensions down with `%`/`div` first).
    */
  def writeZOrdered(df: DataFrame, dir: String, aCol: String, bCol: String,
                    bits: Int = 10, bucketBits: Int = 6): Unit = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits,
      s"bucketBits must be in [1, ${2 * bits}], got $bucketBits")
    val zb = F.shiftright(
      graft.functions.PF.zvalue(F.col(aCol), F.col(bCol), bits),
      2 * bits - bucketBits)
    df.withColumn("__zb", zb)
      .repartition(1 << bucketBits, F.col("__zb"))
      .drop("__zb")
      .write.mode("overwrite").parquet(dir)
  }
}
