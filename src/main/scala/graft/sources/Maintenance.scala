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

  // ---- keyed tables: partition-pruned upsert / delete ---------------------

  /** The key-bucket partition column: md5-derived (portable, never
    * tied to Spark's internal hash), pure per-row — the same layout
    * contract as the persisted IVF/LSH indexes.
    */
  private def kb(keyCol: String, nBuckets: Int): Column =
    F.pmod(graft.ext.TextAnalysis.h60(F.col(keyCol)), F.lit(nBuckets.toLong))
      // IntegerType to MATCH what partition-column inference reads back
      // (small numeric dir names infer as int; a long here would make
      // the upsert union fail on type mismatch)
      .cast(org.apache.spark.sql.types.IntegerType)

  /** Write `df` as a KEYED table: hash-partitioned into `nBuckets`
    * directories on `kb = h60(key) mod nBuckets`. The layout is what
    * makes `upsertKeyed`/`deleteKeyed` proportional to the BATCH, not
    * the table: a change batch touches only the bucket directories its
    * keys hash into, and the merge job reads exactly those via static
    * partition pruning. Size nBuckets so one bucket ≈ one comfortable
    * rewrite (e.g. 100 TB / 10k buckets = 10 GB merges).
    */
  def writeKeyed(df: DataFrame, dir: String, keyCol: String,
                 nBuckets: Int): Unit = {
    require(nBuckets > 0, s"nBuckets must be > 0, got $nBuckets")
    df.withColumn("kb", kb(keyCol, nBuckets))
      .repartition(F.col("kb"))
      .write.mode("overwrite").partitionBy("kb").parquet(dir)
  }

  /** MERGE (upsert) `updates` into the keyed table at `dir`: rows whose
    * key matches an update are replaced, new keys are inserted, and —
    * the scale contract — only the bucket partitions the batch's keys
    * hash into are read or rewritten. The plan reads the base through a
    * static `kb IN (...)` partition filter (the untouched 99.x% of a
    * 100 TB table contributes zero IO), merges via anti-join + union
    * into a STAGING sibling, and swaps each touched bucket directory
    * into place by rename (see swapBuckets) — unrelated partitions
    * are never read, written, or deleted.
    * `updates` must carry the base schema (minus `kb`); later duplicate
    * keys WITHIN the batch are the caller's contract to avoid (both
    * copies land, same as inserting twice). SINGLE WRITER: like every
    * directory-level table format without a commit log, concurrent
    * merges into the same dir race on the partition overwrite —
    * serialize writers per table (readers are safe: parquet commits
    * are atomic per partition directory).
    */
  def upsertKeyed(spark: SparkSession, dir: String, updates: DataFrame,
                  keyCol: String, nBuckets: Int): Unit = {
    val up = updates.withColumn("kb", kb(keyCol, nBuckets))
      .localCheckpoint()
    val touched = up.select("kb").distinct().collect()
      .map(_.getInt(0)).sorted
    val base = spark.read.parquet(dir)
      .filter(F.col("kb").isin(touched.map(Int.box): _*))
    val merged = base
      .join(up.select(keyCol).distinct(), Seq(keyCol), "left_anti")
      .unionByName(up.select(base.columns.map(F.col).toIndexedSeq: _*))
    swapBuckets(spark, dir, merged, touched)
  }

  /** Write `merged` (rows of the `touched` buckets only, `kb` column
    * included) to a staging sibling, then swap each touched bucket
    * directory into place by rename. This is how the merge reads and
    * replaces the SAME directory without materializing anything: the
    * staging write is an ordinary job to a different path (no
    * read-write cycle, so no localCheckpoint holding whole buckets in
    * executor block storage — non-replicated and memory-bound, the
    * wrong tool for a TB-sized bucket), and the swap is per-bucket
    * metadata renames (instant on HDFS/local; a copy on S3A — there,
    * point `dir` at a rename-capable layer). Readers racing the swap
    * can observe a bucket mid-rename; the documented single-writer /
    * quiesced-reader contract covers it.
    */
  private def swapBuckets(spark: SparkSession, dir: String,
                          merged: DataFrame, touched: Seq[Int]): Unit = {
    // strip trailing slashes: "dir/" + ".staging" would nest the
    // staging INSIDE the table and later reads would scan it as data
    val clean = dir.replaceAll("/+$", "")
    val p = new Path(clean)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging =
      new Path(clean + s".staging_${ProcessHandle.current().pid()}")
    fs.delete(staging, true)
    merged.repartition(F.col("kb"))
      .write.mode("overwrite").partitionBy("kb").parquet(staging.toString)
    touched.foreach { b =>
      val dst = new Path(p, s"kb=$b")
      val src = new Path(staging, s"kb=$b")
      fs.delete(dst, true)
      // a touched bucket absent from staging lost ALL its rows
      // (delete path) — removing the old dir above is the whole swap.
      // rename returns FALSE on failure instead of throwing; a silent
      // false here would drop the bucket
      if (fs.exists(src))
        require(fs.rename(src, dst), s"bucket swap failed: $src -> $dst")
    }
    fs.delete(staging, true)
  }

  /** Delete by key from the keyed table at `dir`; `keys` is a 1-column
    * frame. Same pruned-read + staged-swap shape as upsertKeyed; a
    * bucket whose every row was deleted simply has no staging dir, so
    * the swap removes it outright (a dynamic partition overwrite
    * would have silently left it behind — it only replaces partitions
    * PRESENT in the written data).
    */
  def deleteKeyed(spark: SparkSession, dir: String, keys: DataFrame,
                  keyCol: String, nBuckets: Int): Unit = {
    val ks = keys.select(F.col(keys.columns.head).as(keyCol))
      .withColumn("kb", kb(keyCol, nBuckets)).localCheckpoint()
    val touched = ks.select("kb").distinct().collect()
      .map(_.getInt(0)).sorted
    val base = spark.read.parquet(dir)
      .filter(F.col("kb").isin(touched.map(Int.box): _*))
    val merged = base.join(ks.select(keyCol).distinct(),
      Seq(keyCol), "left_anti")
    swapBuckets(spark, dir, merged, touched)
  }

  /** Layout report for a partitioned dataset: rows and file count per
    * partition value — the "is my table healthy" probe that decides
    * when to compact (files per partition creeping up) or re-bucket
    * (row skew across partitions). One aggregated scan; the file name
    * is projected before the aggregate (Spark 4 rejects
    * nondeterministic expressions inside aggregate arguments).
    */
  def tableStats(spark: SparkSession, dir: String,
                 partCol: String): DataFrame =
    spark.read.parquet(dir)
      .select(F.col(partCol), F.input_file_name().as("__f"))
      .groupBy(F.col(partCol))
      .agg(F.count(F.lit(1)).as("n_rows"),
        F.countDistinct(F.col("__f")).as("n_files"))

  // ---- reconciliation ------------------------------------------------------

  /** Row-level diff of two keyed frames: one row per key present on
    * either side, with status `added` (b only), `removed` (a only),
    * `changed` (both, any shared non-key column differs null-safely) or
    * `same`. Columns are compared DIRECTLY (null-safe `<=>` conjunction
    * over the shared non-key columns) — no hashing, so there is nothing
    * to mirror and no collision caveat. One shuffle per side (the
    * full-outer equi-join); at 100 TB both sides stream through a
    * sort-merge join with no row amplification. Keys are assumed
    * UNIQUE per side (the keyed-table contract); duplicate keys
    * multiply through the full-outer join like in any SQL diff.
    */
  def diff(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    val shared = a.columns.filter(b.columns.contains).filterNot(keyCols.contains)
    val aa = a.select((keyCols ++ shared).map(F.col): _*)
      .withColumn("__pa", F.lit(1)).alias("a")
    val bb = b.select((keyCols ++ shared).map(F.col): _*)
      .withColumn("__pb", F.lit(1)).alias("b")
    val cond = keyCols.map(k => F.col(s"a.$k") === F.col(s"b.$k"))
      .reduce(_ && _)
    val sameCols =
      if (shared.isEmpty) F.lit(true)
      else shared.map(c => F.col(s"a.$c") <=> F.col(s"b.$c")).reduce(_ && _)
    aa.join(bb, cond, "full_outer").select(
      keyCols.map(k =>
        F.coalesce(F.col(s"a.$k"), F.col(s"b.$k")).as(k)) :+
        F.when(F.col("__pb").isNull, F.lit("removed"))
          .when(F.col("__pa").isNull, F.lit("added"))
          .when(sameCols, F.lit("same"))
          .otherwise(F.lit("changed")).as("status"): _*)
  }

  // ---- incremental aggregation (materialized-view maintenance) ------------

  /** Build the persisted partial-aggregate state for an incrementally
    * maintained `group by keys → count / sum(valueCol)` view: one
    * (keys, cnt, sum) row per group, sums held EXACTLY as
    * DECIMAL(28,2) so merge order can never change results. The state
    * is the one full pass over history; every refresh after that is
    * `mergeAggState`, whose cost is O(batch + state) — at 100 TB the
    * difference between a daily full recompute and a minutes-long
    * merge.
    */
  def buildAggState(df: DataFrame, keys: Seq[String], valueCol: String,
                    dir: String): Unit =
    partialAgg(df, keys, valueCol)
      .write.mode("overwrite").parquet(dir)

  private def partialAgg(df: DataFrame, keys: Seq[String],
                         valueCol: String): DataFrame =
    df.groupBy(keys.map(F.col): _*).agg(
      F.count(F.lit(1)).as("__cnt"),
      F.sum(F.col(valueCol).cast(org.apache.spark.sql.types.DecimalType(28, 2)))
        .as("__sum"))

  /** Fold a new batch into the persisted state at `dir` and write the
    * merged state back. The read-write cycle is broken by a staging
    * write + whole-directory rename swap (a durable job to a sibling
    * path, then two metadata ops) — never a localCheckpoint, whose
    * non-replicated executor blocks are the wrong place for a state
    * table that can reach many GB at 100 TB grain. Counts and decimal
    * sums are associative, so state ∪ batch-partial re-aggregated IS
    * the state of history ∪ batch — bit-for-bit, in any merge order.
    * Returns the merged state (reading the swapped-in directory).
    */
  def mergeAggState(spark: SparkSession, dir: String, batch: DataFrame,
                    keys: Seq[String], valueCol: String): DataFrame = {
    val merged = spark.read.parquet(dir)
      .unionByName(partialAgg(batch, keys, valueCol))
      .groupBy(keys.map(F.col): _*)
      .agg(F.sum(F.col("__cnt")).as("__cnt"), F.sum(F.col("__sum")).as("__sum"))
    val clean = dir.replaceAll("/+$", "")
    val p = new Path(clean)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging =
      new Path(clean + s".staging_${ProcessHandle.current().pid()}")
    fs.delete(staging, true)
    merged.write.mode("overwrite").parquet(staging.toString)
    fs.delete(p, true)
    require(fs.rename(staging, p), s"state swap failed: $staging -> $p")
    spark.read.parquet(clean)
  }

  /** Finalize a state frame into the user-facing view:
    * (keys, n, total, mean). */
  def finalizeAgg(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(
      keys.map(F.col) ++ Seq(
        F.col("__cnt").as("n"),
        F.col("__sum").cast(org.apache.spark.sql.types.DoubleType).as("total"),
        // ONE IEEE division over the exact decimal sum (not decimal
        // division, whose result scale differs across engines)
        (F.col("__sum").cast(org.apache.spark.sql.types.DoubleType) /
          F.col("__cnt")).as("mean")): _*)

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
                    bits: Int = 10, bucketBits: Int = 6): Unit =
    writeZOrderedN(df, dir, Seq(aCol, bCol), bits, bucketBits)

  /** N-dimensional variant: cluster files by the top `bucketBits`
    * bits of the k-way Morton interleave, so every file covers an
    * aligned k-rectangle of the dimension space and a conjunctive
    * range predicate over ANY subset of the dimensions prunes files.
    * More dimensions split the same skipping budget — 2-3 is the
    * sweet spot (the same guidance as Delta's OPTIMIZE ZORDER).
    */
  def writeZOrderedN(df: DataFrame, dir: String, cols: Seq[String],
                     bits: Int = 10, bucketBits: Int = 6): Unit = {
    require(bucketBits >= 1 && bucketBits <= cols.length * bits,
      s"bucketBits must be in [1, ${cols.length * bits}], got $bucketBits")
    val zb = F.shiftright(
      graft.functions.PF.zvalueN(cols.map(F.col), bits),
      cols.length * bits - bucketBits)
    df.withColumn("__zb", zb)
      .repartition(1 << bucketBits, F.col("__zb"))
      .drop("__zb")
      .write.mode("overwrite").parquet(dir)
  }
}
