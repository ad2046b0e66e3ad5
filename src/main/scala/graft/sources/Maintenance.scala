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

  // ---- keyed tables: manifest-committed snapshot upsert / delete ----------
  //
  // Layout (a minimal table FORMAT, not just table ops):
  //   dir/
  //     b00003_g000000001/part-*.parquet   immutable bucket-generation dirs
  //     b00007_g000000002/...              (kb kept as a DATA column)
  //     _manifests/v000000001.json         {"version":1,"buckets":{"3":"b00003_g000000001",...}}
  //     _manifests/v000000002.json
  //
  // A commit writes NEW bucket-generation dirs (never visible to any
  // reader until committed — even S3A's copy-rename has no visibility
  // window, because nothing references the paths yet) and then
  // publishes ONE new manifest file. Readers resolve the latest
  // manifest and scan exactly the dirs it lists, so a reader racing a
  // writer sees either the old or the new COMPLETE snapshot — never a
  // missing bucket. Old snapshots stay readable (time travel) until
  // `vacuumKeyed` garbage-collects their unreferenced dirs. Writers
  // remain single-writer per table (manifest version allocation is
  // not locked); readers need no coordination at all.

  /** The key-bucket column: md5-derived (portable, never tied to
    * Spark's internal hash), pure per-row — the same layout contract
    * as the persisted IVF/LSH indexes. A NULL key component fails the
    * job with a clear message (without the guard it would hash to a
    * NULL bucket, land in Hive's default-partition dir and crash the
    * stage listing AFTER the write job ran) — unless `nullSafe`, where
    * a NULL component hashes as a reserved sentinel (the bucketed
    * agg-state path: a NULL GROUP key is a legal group, not a broken
    * primary key).
    *
    * COMPOSITE keys hash the components' string casts joined on
    * `\u0001` (single-column tables keep the exact pre-r10 bytes —
    * `md5(cast(key))` — so every existing layout stays valid). A key
    * component whose string form CONTAINS `\u0001` is out of contract
    * (it could alias another composite); real keys never carry \u0001.
    */
  private def kb(keyCols: Seq[String], nBuckets: Int,
                 nullSafe: Boolean = false,
                 depths: Map[Int, Int] = Map.empty): Column = {
    import org.apache.spark.sql.types.StringType
    require(keyCols.nonEmpty, "keyed table: no key columns")
    val joined =
      if (keyCols.length == 1) F.col(keyCols.head).cast(StringType)
      else F.concat_ws("\u0001",
        keyCols.map(c => F.col(c).cast(StringType)): _*)
    val h = graft.ext.TextAnalysis.h60(
      if (nullSafe)
        // the sentinel marks WHICH components were null (concat_ws
        // silently skips nulls, which would alias ("a", null) with
        // ("a")); \u0000 never appears in a real value's string form
        keyCols.map(c => F.coalesce(F.col(c).cast(StringType),
          F.lit("\u0000"))).reduceLeft((a, b) =>
          F.concat(a, F.lit("\u0001"), b))
      else joined)
    val anyNull = keyCols.map(c => F.col(c).isNull).reduce(_ || _)
    val bucket =
      if (depths.isEmpty || depths.values.forall(_ == 0))
        // the flat layout: the exact pre-r11 expression, byte-for-byte
        F.pmod(h, F.lit(nBuckets.toLong))
          .cast(org.apache.spark.sql.types.IntegerType)
      else {
        // extendible-hashing layout (splitKeyed): the leaf for hash h
        // is the unique id in the depth tree with h mod (N·2^d) = id.
        // The fine-to-leaf table is UNROLLED AT PLAN-BUILD TIME into a
        // literal int array (bounded by the split-depth cap), so the
        // per-row cost is one pmod + one array index — no per-row tree
        // walk, and the expression stays codegen-friendly.
        val dmax = depths.values.max
        val fineN = nBuckets << dmax
        val leafArr = Array.tabulate(fineN)(leafOf(_, nBuckets, depths, dmax))
        F.get(F.lit(leafArr),
          F.pmod(h, F.lit(fineN.toLong))
            .cast(org.apache.spark.sql.types.IntegerType))
      }
    if (nullSafe) bucket
    else F.when(anyNull, F.raise_error(F.lit(
        s"keyed table: key column(s) ${keyCols.mkString(",")} must not " +
          "be NULL")))
      .otherwise(bucket)
      .cast(org.apache.spark.sql.types.IntegerType)
  }

  /** The leaf bucket a fine id (h mod N·2^dmax) belongs to: the unique
    * prefix-tree leaf whose (id, depth) matches — descend from the
    * deepest recorded depth; no match at any positive depth means the
    * flat depth-0 leaf (id mod N).
    */
  private def leafOf(fine: Int, n: Int, depths: Map[Int, Int],
                     dmax: Int): Int = {
    var d = dmax
    while (d > 0) {
      val c = fine % (n << d)
      if (depths.getOrElse(c, -1) == d) return c
      d -= 1
    }
    fine % n
  }

  /** A resolved table snapshot: manifest version → live dir per bucket.
    * `keyCol`/`nBuckets` are TABLE METADATA recorded at writeKeyed time
    * (empty/0 for versioned datasets and pre-metadata manifests) — a
    * querier guessing a different bucket count would compute wrong
    * bucket ids and silently prune away real rows, the same rule as
    * the inverted index's n_buckets.
    *
    * r9 additions (all optional — pre-r9 manifests parse with the
    * defaults and newly-written manifests stay readable by shape):
    *  - `schemaDdl`: the snapshot's schema as Spark DDL, so a legally
    *    EMPTY snapshot stays self-describing after vacuum GCs every
    *    prior generation (it used to borrow a prior manifest's files).
    *  - `deltas`: per-bucket ordered MERGE-ON-READ delta dirs — a
    *    small CDC batch appends one delta dir per touched bucket
    *    instead of rewriting the whole bucket (bytes written ∝ batch,
    *    not bucket); readers resolve base ⊕ deltas last-wins and
    *    `compactKeyed` folds chains back into base generations.
    *  - `rows`: row count per referenced dir, recorded at commit time
    *    from the staged parquet footers, so `keyedStats` and merge
    *    planning read the MANIFEST instead of scanning the table.
    *
    * r10 additions (same compatibility rule):
    *  - `ts`: the commit wall-clock millis, stamped at publish — so
    *    `versionAt` timestamp time travel reads the manifest BODY
    *    instead of trusting FS mtime semantics (object-store "rename"
    *    is a copy that rewrites times; pre-r10 manifests fall back to
    *    mtime, which the atomic rename does set on HDFS/local).
    *  - `statsCols` + `colstats`: per-dir MIN/MAX zone maps for a
    *    column list declared at writeKeyed time, folded from the same
    *    commit-time footer pass that records `rows` — `readKeyedRange`
    *    prunes whole buckets against non-key range predicates
    *    (Iceberg/Delta-style data skipping).
    *  - `resolve`: the table's DELTA-RESOLUTION DISCIPLINE. Empty =
    *    last-wins per key (row data). "agg" = the delta chains hold
    *    AGGREGATE PARTIALS and resolution is RE-AGGREGATION
    *    (`readAggStateKeyed`); the generic last-wins readers fail
    *    loudly on such tables instead of silently keeping only the
    *    newest partial per key. The merge discipline is table
    *    metadata, not a caller guess — same rule as keyCol/nBuckets.
    *  - `txn`: writer-app transaction watermarks (appId → last applied
    *    batch id), the Delta-style idempotent-sink slot. CARRIED
    *    FORWARD through every commit (merge, delta append, compaction)
    *    so an interleaved maintenance commit can never blank it; a
    *    streaming sink whose batch id ≤ the recorded watermark skips
    *    the replay instead of double-counting — the watermark and the
    *    data land in the SAME atomic manifest publish, which is what
    *    makes at-least-once delivery exactly-once in effect.
    *  - `aggP` / `aggK`: the agg state's HLL precision and bounded-
    *    sample size, recorded at build time (resolve=agg tables only)
    *    and carried forward — so reads and compactions self-describe
    *    instead of trusting the caller to repeat the build's numbers
    *    (a wrong p would silently mis-merge registers). 0 / -1 =
    *    unrecorded (pre-r10 states fall back to the old defaults).
    *
    * r11 addition:
    *  - `depths`: per-LEAF-bucket split depth for extendible-hashing
    *    bucket splits (`splitKeyed`) — a leaf at depth d holds the keys
    *    with h mod (nBuckets·2^d) = leaf id. Absent/empty = the flat
    *    layout (every leaf at depth 0, id = h mod nBuckets), which is
    *    every pre-r11 table. The depth map is LAYOUT TRUTH like
    *    keyCol/nBuckets: every reader and writer derives its bucket
    *    function from it, so a caller can never hash a batch under a
    *    stale layout without the guards noticing.
    */
  final case class KeyedManifest(version: Int, buckets: Map[Int, String],
                                 keyCol: String = "", nBuckets: Int = 0,
                                 schemaDdl: String = "",
                                 deltas: Map[Int, Seq[String]] = Map.empty,
                                 rows: Map[String, Long] = Map.empty,
                                 tsMillis: Long = 0L,
                                 statsCols: Seq[String] = Seq.empty,
                                 colStats: Map[String, Map[String, (String, String)]] = Map.empty,
                                 resolve: String = "",
                                 txn: Map[String, Long] = Map.empty,
                                 aggP: Int = 0, aggK: Int = -1,
                                 depths: Map[Int, Int] = Map.empty,
                                 aggSU: String = "",
                                 seqCol: String = "") {
    /** The key as a COLUMN LIST: r10 composite keys store the names
      * comma-joined in `keyCol` (column names in this engine never
      * carry commas — the DDL round-trip would reject them).
      */
    def keyCols: Seq[String] =
      if (keyCol.isEmpty) Seq.empty else keyCol.split(",").toSeq
  }

  /** Memoized `StructType.fromDDL`: the recorded snapshot schema is
    * re-parsed on every read/merge/lookup (fromDDL goes through the
    * full SQL parser), and one lifecycle query parses the same DDL
    * string dozens of times. Keyed by the DDL text itself; bounded.
    */
  private val ddlCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      org.apache.spark.sql.types.StructType]()
  private[graft] def parseDdl(ddl: String)
      : org.apache.spark.sql.types.StructType = {
    if (ddlCache.size() > 1024) ddlCache.clear()
    ddlCache.computeIfAbsent(ddl,
      d => org.apache.spark.sql.types.StructType.fromDDL(d))
  }

  private def cleanDir(dir: String): String = dir.replaceAll("/+$", "")

  private def hadoopFs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(clean: String) = new Path(clean, "_manifests")

  /** Thrown when a concurrent writer committed the manifest version
    * this commit was built against — the optimistic-concurrency
    * signal. upsert/delete/merge catch it and recompute against the
    * fresh snapshot; callers driving commits manually should too.
    */
  final class CommitConflict(msg: String) extends RuntimeException(msg)

  private val stageCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Generation dir names carry a WRITER-UNIQUE suffix so two
    * concurrent writers staging the same version never collide on a
    * rename — the manifest publish is then the ONLY contention point,
    * and it is atomic (rename-if-absent).
    */
  private def bucketDirName(bucket: Int, version: Int): String =
    f"b$bucket%05d_g$version%09d" +
      s"-${ProcessHandle.current().pid()}x${stageCounter.incrementAndGet()}"

  private val ManifestName = """v(\d{9})\.json""".r
  private val BucketEntry = """"(\d+)"\s*:\s*"([^"]+)"""".r
  private val KeyColEntry = """"keyCol"\s*:\s*"([^"]*)"""".r
  private val NBucketsEntry = """"nBuckets"\s*:\s*(\d+)""".r
  private val SchemaEntry = """"schemaB64"\s*:\s*"([^"]*)"""".r
  // section bodies: every value inside is a string / number / flat
  // array (never an object), so the first '}' closes the section
  private val BucketsSection = """"buckets"\s*:\s*\{([^}]*)\}""".r
  private val DeltasSection = """"deltas"\s*:\s*\{([^}]*)\}""".r
  private val RowsSection = """"rows"\s*:\s*\{([^}]*)\}""".r
  private val DeltaEntry = """"(\d+)"\s*:\s*\[([^\]]*)\]""".r
  private val QuotedString = """"([^"]+)"""".r
  private val RowEntry = """"([^"]+)"\s*:\s*(\d+)""".r
  private val TsEntry = """"ts"\s*:\s*(\d+)""".r
  private val ResolveEntry = """"resolve"\s*:\s*"([^"]*)"""".r
  private val TxnSection = """"txn"\s*:\s*\{([^}]*)\}""".r
  private val TxnEntry = """"([^"]+)"\s*:\s*(-?\d+)""".r
  private val AggPEntry = """"aggP"\s*:\s*(\d+)""".r
  private val AggKEntry = """"aggK"\s*:\s*(\d+)""".r
  private val AggSUEntry = """"aggSU"\s*:\s*"([^"]*)"""".r
  private val SeqColEntry = """"seqCol"\s*:\s*"([^"]*)"""".r
  private val StatsColsEntry = """"statsCols"\s*:\s*"([^"]*)"""".r
  private val DepthsSection = """"depths"\s*:\s*\{([^}]*)\}""".r
  private val DepthEntry = """"(\d+)"\s*:\s*(\d+)""".r
  private val ColStatsSection = """"colstats"\s*:\s*\{([^}]*)\}""".r
  private val ColStatEntry = """"([^"]+)\|([^"]+)"\s*:\s*"([^",]*),([^"]*)"""".r

  private def b64enc(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def b64dec(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  /** Union two snapshot schemas field-by-name (additive evolution:
    * the recorded schema only ever grows; types never change — a batch
    * retyping an existing column FAILS here, loudly, instead of the
    * recorded schema silently disagreeing with the data files).
    */
  private def unionSchema(a: org.apache.spark.sql.types.StructType,
                          b: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    val have = a.fields.map(f => f.name -> f.dataType).toMap
    // compare up to NULLABILITY: the recorded schema round-trips
    // through DDL, which drops array/struct element nullability (a
    // fresh plan's containsNull=false array is the SAME type)
    b.fields.foreach(f => have.get(f.name).foreach(t =>
      require(t.catalogString == f.dataType.catalogString,
        s"column '${f.name}' is $t in the table but ${f.dataType} in " +
          "the batch — types never change; rewrite the table to retype")))
    org.apache.spark.sql.types.StructType(
      a.fields ++ b.fields.filterNot(f => have.contains(f.name)))
  }

  /** All committed manifest versions at `dir`, ascending. */
  def manifestVersions(spark: SparkSession, dir: String): Seq[Int] = {
    val md = manifestDir(cleanDir(dir))
    val fs = hadoopFs(spark, md)
    if (!fs.exists(md)) Seq.empty
    else fs.listStatus(md).toSeq.map(_.getPath.getName).collect {
      case ManifestName(v) => v.toInt
    }.sorted
  }

  /** Resolve the manifest at `version` (latest when None). The JSON is
    * engine-written with a fixed shape, so a sectioned-regex parse is
    * exact.
    */
  def readManifest(spark: SparkSession, dir: String,
                   version: Option[Int] = None): KeyedManifest = {
    val clean = cleanDir(dir)
    val versions = manifestVersions(spark, dir)
    require(versions.nonEmpty, s"no keyed-table manifest under $clean")
    val v = version.getOrElse(versions.last)
    require(versions.contains(v),
      s"manifest version $v not found under $clean (have $versions)")
    tryReadManifest(spark, clean, v).getOrElse(throw new IllegalArgumentException(
      s"manifest version $v of $clean disappeared mid-read (vacuumed?)"))
  }

  /** Parsed-manifest cache. Manifest FILES are write-once (the publish
    * is rename/hard-link-if-absent), but a vacuumed-then-recreated
    * table reuses version NUMBERS — so the cache key carries the
    * file's (mtime, length) identity, never just its path: a recreated
    * v1 parses fresh instead of serving the dead table's entry. The
    * payoff is every repeated read/merge/poll of the same snapshot:
    * r10 manifests carry rows/colstats/txn on every commit (~10× the
    * r8 bytes), and the re-open + regex re-parse per readManifest call
    * was measurable on delta-heavy paths (ql51/x98). Bounded LRU.
    */
  private val manifestCache =
    new java.util.LinkedHashMap[(String, Long, Long), KeyedManifest](
      64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long), KeyedManifest])
          : Boolean = size() > 512
    }

  /** Open + parse one manifest by version WITHOUT a directory listing;
    * None when the file is gone (a racing vacuum between a version
    * listing and this read degrades to a skip, not a crash).
    */
  private def tryReadManifest(spark: SparkSession, clean: String,
                              v: Int): Option[KeyedManifest] = {
    val p = new Path(manifestDir(clean), f"v$v%09d.json")
    val fs = hadoopFs(spark, p)
    val st =
      try fs.getFileStatus(p)
      catch { case _: java.io.FileNotFoundException => return None }
    val cacheKey = (p.toString, st.getModificationTime, st.getLen)
    manifestCache.synchronized(Option(manifestCache.get(cacheKey))) match {
      case some @ Some(_) => return some
      case None => ()
    }
    val txt =
      try {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      } catch { case _: java.io.FileNotFoundException => return None }
    // sectioned parse: `rows` keys are dir names and `deltas` values
    // are arrays, so the flat "digits": "string" regex is scoped to
    // the buckets section (pre-r9 manifests have no sections beyond
    // buckets — the same extraction still matches them)
    val bucketsBody = BucketsSection.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse(txt)
    val buckets = BucketEntry.findAllMatchIn(bucketsBody)
      .map(m => m.group(1).toInt -> m.group(2)).toMap
    val deltas = DeltasSection.findFirstMatchIn(txt).map(_.group(1))
      .map(body => DeltaEntry.findAllMatchIn(body).map { m =>
        m.group(1).toInt ->
          QuotedString.findAllMatchIn(m.group(2)).map(_.group(1)).toSeq
      }.toMap).getOrElse(Map.empty[Int, Seq[String]])
    val rows = RowsSection.findFirstMatchIn(txt).map(_.group(1))
      .map(body => RowEntry.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toLong).toMap)
      .getOrElse(Map.empty[String, Long])
    val colStats = ColStatsSection.findFirstMatchIn(txt).map(_.group(1))
      .map(body => ColStatEntry.findAllMatchIn(body).toSeq
        .groupBy(_.group(1)).map { case (d, ms) =>
          d -> ms.map(m =>
            m.group(2) -> (b64dec(m.group(3)), b64dec(m.group(4)))).toMap
        })
      .getOrElse(Map.empty[String, Map[String, (String, String)]])
    val parsed = KeyedManifest(v, buckets,
      KeyColEntry.findFirstMatchIn(txt).map(_.group(1)).getOrElse(""),
      NBucketsEntry.findFirstMatchIn(txt).map(_.group(1).toInt).getOrElse(0),
      SchemaEntry.findFirstMatchIn(txt).map(m => b64dec(m.group(1)))
        .getOrElse(""),
      deltas, rows,
      TsEntry.findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(0L),
      StatsColsEntry.findFirstMatchIn(txt).map(_.group(1))
        .filter(_.nonEmpty).map(_.split(",").toSeq).getOrElse(Seq.empty),
      colStats,
      ResolveEntry.findFirstMatchIn(txt).map(_.group(1)).getOrElse(""),
      TxnSection.findFirstMatchIn(txt).map(_.group(1))
        .map(body => TxnEntry.findAllMatchIn(body)
          .map(m => b64dec(m.group(1)) -> m.group(2).toLong).toMap)
        .getOrElse(Map.empty[String, Long]),
      AggPEntry.findFirstMatchIn(txt).map(_.group(1).toInt).getOrElse(0),
      AggKEntry.findFirstMatchIn(txt).map(_.group(1).toInt).getOrElse(-1),
      DepthsSection.findFirstMatchIn(txt).map(_.group(1))
        .map(body => DepthEntry.findAllMatchIn(body)
          .map(m => m.group(1).toInt -> m.group(2).toInt).toMap)
        .getOrElse(Map.empty[Int, Int]),
      AggSUEntry.findFirstMatchIn(txt).map(m => b64dec(m.group(1)))
        .getOrElse(""),
      SeqColEntry.findFirstMatchIn(txt).map(m => b64dec(m.group(1)))
        .getOrElse(""))
    manifestCache.synchronized(manifestCache.put(cacheKey, parsed))
    Some(parsed)
  }

  /** Publish a manifest: write to a dot-temp in `_manifests`, then one
    * rename to the final `v<N>.json` (on an object store, use a
    * conditional PUT — same atomicity). This rename IS the commit
    * point — everything else a commit did is invisible until it — and
    * because HDFS/local rename FAILS when the destination exists, a
    * concurrent writer racing to the same version loses cleanly: the
    * loser gets a CommitConflict and retries against the fresh
    * snapshot (optimistic concurrency, Delta-style).
    */
  private def writeManifest(spark: SparkSession, clean: String,
                            m: KeyedManifest): Unit = {
    val md = manifestDir(clean)
    val fs = hadoopFs(spark, md)
    fs.mkdirs(md)
    val meta =
      if (m.nBuckets > 0) s""""keyCol": "${m.keyCol}", "nBuckets": ${m.nBuckets}, """
      else ""
    val schema =
      if (m.schemaDdl.nonEmpty) s""""schemaB64": "${b64enc(m.schemaDdl)}", """
      else ""
    val deltas =
      if (m.deltas.isEmpty) ""
      else m.deltas.toSeq.sortBy(_._1).map { case (b, ds) =>
        s""""$b": ${ds.map(d => s""""$d"""").mkString("[", ", ", "]")}"""
      }.mkString(""", "deltas": {""", ", ", "}")
    val rows =
      if (m.rows.isEmpty) ""
      else m.rows.toSeq.sortBy(_._1).map { case (d, n) => s""""$d": $n""" }
        .mkString(""", "rows": {""", ", ", "}")
    val statsCols =
      if (m.statsCols.isEmpty) ""
      else s""", "statsCols": "${m.statsCols.mkString(",")}""""
    val colStats =
      if (m.colStats.isEmpty) ""
      else m.colStats.toSeq.sortBy(_._1).flatMap { case (d, cs) =>
        cs.toSeq.sortBy(_._1).map { case (c, (lo, hi)) =>
          s""""$d|$c": "${b64enc(lo)},${b64enc(hi)}""""
        }
      }.mkString(""", "colstats": {""", ", ", "}")
    val resolve =
      if (m.resolve.isEmpty) "" else s""", "resolve": "${m.resolve}""""
    // appIds are b64-encoded: a writer-chosen id must never break the
    // fixed-shape JSON (quotes, braces)
    val txn =
      if (m.txn.isEmpty) ""
      else m.txn.toSeq.sortBy(_._1).map { case (app, v) =>
        s""""${b64enc(app)}": $v"""
      }.mkString(""", "txn": {""", ", ", "}")
    val aggMeta =
      (if (m.aggP > 0) s""", "aggP": ${m.aggP}""" else "") +
        (if (m.aggK >= 0) s""", "aggK": ${m.aggK}""" else "") +
        // the sample GRAIN column (b64: caller-chosen name) — part of
        // the state's identity, recorded so rebuild/merge default to
        // the BUILD's grain instead of trusting the caller to repeat it
        (if (m.aggSU.nonEmpty) s""", "aggSU": "${b64enc(m.aggSU)}"""" else "") +
        // the SEQUENCE column (b64): once set, delta resolution is
        // max-seq-wins instead of chain-order-wins — the out-of-order
        // CDC contract, part of the table's identity like keyCol
        (if (m.seqCol.nonEmpty) s""", "seqCol": "${b64enc(m.seqCol)}""""
         else "")
    val depths =
      if (m.depths.isEmpty) ""
      else m.depths.toSeq.sorted.map { case (b, dep) => s""""$b": $dep""" }
        .mkString(""", "depths": {""", ", ", "}")
    // the commit wall-clock stamp: the manifest body is the
    // FS-independent truth for `versionAt` (mtime is only a pre-r10
    // fallback)
    val ts = s""", "ts": ${
      if (m.tsMillis > 0) m.tsMillis else System.currentTimeMillis()}"""
    val body = m.buckets.toSeq.sortBy(_._1)
      .map { case (b, d) => s""""$b": "$d"""" }
      .mkString(s"""{"version": ${m.version}, $meta$schema"buckets": {""",
        ", ", "}") + deltas + rows + statsCols + colStats + resolve +
      txn + aggMeta + depths + ts + "}"
    val tmp = new Path(md,
      s".tmp_v${m.version}_${ProcessHandle.current().pid()}x${stageCounter.incrementAndGet()}")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val dst = new Path(md, f"v${m.version}%09d.json")
    // THE commit point must be atomic rename-IF-ABSENT. HDFS rename
    // fails when the destination exists; the LOCAL filesystem does
    // NOT — RawLocalFileSystem.rename is POSIX renameTo, which
    // silently REPLACES an existing destination, so two writers
    // racing the same version could both "succeed" and the second
    // would overwrite the first's commit (a silent lost update — the
    // 4-writer hammer caught exactly this as a missing batch). On the
    // file scheme the publish is a HARD LINK instead: link(2) fails
    // EEXIST atomically when the version is taken, and the linked
    // file is already fully written.
    val committed =
      if (fs.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dst.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else fs.rename(tmp, dst)
    if (!committed) {
      fs.delete(tmp, false)
      throw new CommitConflict(
        s"version ${m.version} of $clean was committed by a concurrent " +
          "writer; recompute against the fresh snapshot and retry")
    }
    if (fs.getScheme == "file") fs.delete(tmp, false)
  }

  /** Optimistic-concurrency retry: re-run `body` (which must re-read
    * the manifest each attempt) until its commit wins or `attempts`
    * conflicts pass through. Staged dirs of losing attempts are
    * unreferenced and reclaimed by vacuum. Every conflict round has a
    * winner, so N contending writers each need at most ~N×(their
    * queue) attempts — the default bounds a realistic writer pool,
    * and the jittered backoff de-synchronizes retriers so the same
    * two writers stop losing to each other in lockstep.
    */
  private def withCommitRetry[T](what: String, attempts: Int = 20)
                                (body: => T): T = {
    var i = 1
    while (true) {
      try return body
      catch {
        case c: CommitConflict =>
          if (i >= attempts)
            throw new CommitConflict(
              s"$what lost $attempts optimistic-commit races: ${c.getMessage}")
          Thread.sleep(java.util.concurrent.ThreadLocalRandom.current()
            .nextLong(20L + 30L * math.min(i, 10)))
          i += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The newest manifest version whose COMMIT TIME is ≤ `tsMillis`:
    * timestamp-based time travel, `readKeyed(dir, Some(versionAt(…)))`.
    * The commit time is the `ts` the manifest BODY records at publish
    * (FS-independent — object-store "renames" copy and rewrite mtime);
    * pre-r10 manifests fall back to the file mtime, which the atomic
    * publish rename does set on HDFS/local. A manifest a concurrent
    * vacuum deletes between the listing and the read is skipped (it
    * was a dropped version anyway); errors when no snapshot existed
    * yet at that time.
    */
  def versionAt(spark: SparkSession, dir: String, tsMillis: Long): Int = {
    val clean = cleanDir(dir)
    val fs = hadoopFs(spark, manifestDir(clean))
    val at = manifestVersions(spark, dir).filter { v =>
      tryReadManifest(spark, clean, v).exists { m =>
        val commitTs =
          if (m.tsMillis > 0) m.tsMillis
          else try fs.getFileStatus(
            new Path(manifestDir(clean), f"v$v%09d.json"))
            .getModificationTime
          catch { case _: java.io.FileNotFoundException => Long.MaxValue }
        commitTs <= tsMillis
      }
    }
    require(at.nonEmpty,
      s"no snapshot of $clean existed at $tsMillis (oldest retained " +
        s"commit is newer — vacuumed, or the table is younger)")
    at.last
  }

  /** Read the keyed table's snapshot at `version` (latest when None).
    * Scans exactly the bucket dirs the manifest lists; `kb` is a data
    * column in the files. Buckets with merge-on-read delta chains are
    * resolved last-wins (see `resolveBuckets`); buckets without deltas
    * read straight through with NO resolution shuffle. Falls back to a
    * plain partitioned read for pre-manifest directories.
    */
  def readKeyed(spark: SparkSession, dir: String,
                version: Option[Int] = None): DataFrame = {
    val clean = cleanDir(dir)
    if (manifestVersions(spark, dir).isEmpty)
      return spark.read.parquet(clean) // legacy kb=N layout
    val m = readManifest(spark, dir, version)
    val live = (m.buckets.keySet ++ m.deltas.keySet).toSeq.sorted
    if (live.isEmpty) return emptySnapshot(spark, clean, m)
    resolveBuckets(spark, clean, m, live, None)
  }

  /** The pristine latest snapshot AND the manifest version it resolved
    * at — ONE manifest read, so the returned pin can never disagree
    * with the data (a separate version listing could race a concurrent
    * commit). The language's `read_keyed` face records this version in
    * the frame's keyed mark; MV routing then requires the registered
    * watermark to equal the PINNED version, not whatever the latest
    * manifest happens to be at query time (a post-read base commit
    * must not change which ROWS the already-read frame aggregates).
    */
  def readKeyedPinned(spark: SparkSession, dir: String): (DataFrame, Int) = {
    val clean = cleanDir(dir)
    val m = readManifest(spark, dir)
    val live = (m.buckets.keySet ++ m.deltas.keySet).toSeq.sorted
    val df =
      if (live.isEmpty) emptySnapshot(spark, clean, m)
      else resolveBuckets(spark, clean, m, live, None)
    (df, m.version)
  }

  /** Range read with ZONE-MAP pruning: the rows where
    * `lo <= colName <= hi`, reading only the buckets whose manifest
    * min/max stats (recorded at commit time for `statsCols` — see
    * `writeKeyed`) can intersect the range — Iceberg/Delta-style data
    * skipping on NON-key predicates, planned entirely from the
    * manifest (zero data IO for skipped buckets).
    *
    * Pruning is at BUCKET granularity, deliberately: inside a
    * delta-carrying bucket the last-wins resolution must see every
    * chain level (a delta may move a key's value OUT of the range —
    * per-dir pruning would resurrect the superseded base row), so a
    * bucket is skipped only when NONE of its dirs can hold a matching
    * row — then no version of any key matches, and the winner can't
    * either. The row filter itself applies AFTER resolution for the
    * same reason. Dirs without recorded stats for the column are
    * unprunable (never a guess).
    */
  def readKeyedRange(spark: SparkSession, dir: String, colName: String,
                     lo: Any, hi: Any,
                     version: Option[Int] = None): DataFrame = {
    val clean = cleanDir(dir)
    val filt = F.col(colName) >= F.lit(lo) && F.col(colName) <= F.lit(hi)
    if (manifestVersions(spark, dir).isEmpty)
      return spark.read.parquet(clean).filter(filt)
    val m = readManifest(spark, dir, version)
    val live = (m.buckets.keySet ++ m.deltas.keySet).toSeq.sorted
    if (live.isEmpty) return emptySnapshot(spark, clean, m).filter(filt)
    val dt: Option[org.apache.spark.sql.types.DataType] =
      if (m.schemaDdl.isEmpty) None
      else parseDdl(m.schemaDdl)
        .fields.find(_.name == colName).map(_.dataType)
    val kept = live.filter { b =>
      val dirs = m.buckets.get(b).toSeq ++ m.deltas.getOrElse(b, Nil)
      dirs.exists { d =>
        (dt, m.colStats.get(d).flatMap(_.get(colName))) match {
          case (Some(t), Some((mn, mx))) => statOverlap(t, mn, mx, lo, hi)
          case _ => true // no stats / unknown type → unprunable
        }
      }
    }
    if (kept.isEmpty) emptySnapshot(spark, clean, m).filter(filt)
    else resolveBuckets(spark, clean, m, kept, None).filter(filt)
  }

  /** Can [lo, hi] intersect a dir whose recorded stats are
    * [mnS, mxS]? Decodes the strings by the column's SPARK type
    * (mirroring `statEncode`'s parquet-value forms); unknown types or
    * unparseable probes answer true (unprunable — pruning must never
    * be a guess).
    */
  /** Predicate-planned read — the scan-planning surface Delta/Iceberg
    * run inside their DSv2 scan builders, as a function: prune buckets
    * from `cond`'s OWN STRUCTURE, then apply the full predicate after
    * resolution.
    *  - Key-pinning conjuncts (`k = 5`, `k IN (…)`, an OR-chain of
    *    equalities; for composite keys an equality per component)
    *    delegate to `lookupKeyed`'s point-read: only the keys' buckets
    *    are scanned and the IN-list pushes into every chain level.
    *  - Range/equality conjuncts on zone-mapped columns skip buckets
    *    via the manifest stats (open-ended ranges included) at BUCKET
    *    granularity — the same delta-safety rule as `readKeyedRange`.
    *    r11 widens the recognized grammar to DISJUNCTIONS OF RANGES on
    *    one column: `v IN (…)`, `v BETWEEN a AND b` (it analyzes to two
    *    conjuncts), and `v < a OR v > b` all prune.
    *  - Unrecognized predicate shapes (e.g. a CROSS-column OR) prune
    *    nothing and filter everything: pruning is never a guess.
    */
  def readKeyedWhere(spark: SparkSession, dir: String, cond: Column,
                     version: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.catalyst.{expressions => E}
    val clean = cleanDir(dir)
    if (manifestVersions(spark, dir).isEmpty)
      return spark.read.parquet(clean).filter(cond)
    val m = readManifest(spark, dir, version)
    val live = (m.buckets.keySet ++ m.deltas.keySet).toSeq.sorted
    if (live.isEmpty) return emptySnapshot(spark, clean, m).filter(cond)
    def conjuncts(e: E.Expression): Seq[E.Expression] = e match {
      case E.And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    def attrName(e: E.Expression): Option[String] = {
      import org.apache.spark.sql.types._
      def integral(t: DataType) = t match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      e match {
        case a: E.Attribute => Some(a.name)
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          Some(u.name)
        // the analyzer wraps BOTH comparison sides in casts to the
        // common type (isin puts a no-op cast on the column itself);
        // identity and integral-widening casts preserve equality and
        // order against a coerced probe, so they are safe to see
        // through — anything else (string/float reinterpretations)
        // changes semantics and prunes nothing
        case c: E.Cast if c.child.dataType == c.dataType ||
            (integral(c.child.dataType) && integral(c.dataType)) =>
          attrName(c.child)
        case _ => None
      }
    }
    def litVal(e: E.Expression): Option[Any] = e match {
      case l: E.Literal =>
        Some(org.apache.spark.sql.catalyst.CatalystTypeConverters
          .convertToScala(l.value, l.dataType))
      // analysis casts the LITERAL side to the column's type (an int
      // probe against a bigint key) — the original value compares fine
      // (lookupKeyed coerces widenings; zone compares are numeric-
      // string based). A cast on the ATTRIBUTE side is NOT looked
      // through: that changes comparison semantics, so prune nothing.
      case c: E.Cast => litVal(c.child)
      case _ => None
    }
    // = and <=> both pin (the language's `==` is null-safe); a NULL
    // literal pins nothing (keys are non-null by construction, and
    // `col = NULL` matches no rows anyway) — conservative, not wrong
    def eq(e: E.Expression): Option[(String, Any)] = (e match {
      case E.EqualTo(a, v) if attrName(a).isDefined && litVal(v).isDefined =>
        Some((attrName(a).get, litVal(v).get))
      case E.EqualTo(v, a) if attrName(a).isDefined && litVal(v).isDefined =>
        Some((attrName(a).get, litVal(v).get))
      case E.EqualNullSafe(a, v)
          if attrName(a).isDefined && litVal(v).isDefined =>
        Some((attrName(a).get, litVal(v).get))
      case E.EqualNullSafe(v, a)
          if attrName(a).isDefined && litVal(v).isDefined =>
        Some((attrName(a).get, litVal(v).get))
      case _ => None
    }).filter(_._2 != null)
    // col IN (…) / OR-chain of equalities on one column / plain =
    def inSet(e: E.Expression): Option[(String, Seq[Any])] = e match {
      case E.In(a, vs) if attrName(a).isDefined &&
          vs.forall(litVal(_).isDefined) =>
        Some((attrName(a).get, vs.map(litVal(_).get)))
      case E.Or(l, r) =>
        for {
          (nl, vl) <- inSet(l)
          (nr, vr) <- inSet(r)
          if nl.equalsIgnoreCase(nr)
        } yield (nl, vl ++ vr)
      case _ => eq(e).map { case (n, v) => (n, Seq(v)) }
    }
    // resolve the predicate against the snapshot's schema by analyzing
    // a filter over the EMPTY snapshot (zero IO): the Filter node's
    // condition is the resolved expression tree — attribute names
    // case-normalized, literal-side casts explicit. Unanalyzable
    // predicates (or schema-less pre-r9 tables) prune nothing.
    val cs = scala.util.Try {
      emptySnapshot(spark, clean, m).filter(cond)
        .queryExecution.analyzed.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition
        }
    }.toOption.flatten.map(conjuncts).getOrElse(Seq.empty)
    val keyCols = m.keyCols
    val keyTuples: Option[Seq[Any]] =
      if (keyCols.length == 1)
        cs.flatMap(inSet(_)).collectFirst {
          case (n, vs) if n.equalsIgnoreCase(keyCols.head) => vs
        }
      else if (keyCols.nonEmpty) {
        val eqs = cs.flatMap(eq(_))
          .groupBy(_._1.toLowerCase).map { case (k, v) => k -> v.head._2 }
        if (keyCols.forall(k => eqs.contains(k.toLowerCase)))
          Some(Seq(keyCols.map(k => eqs(k.toLowerCase))))
        else None
      } else None
    keyTuples match {
      // the point-read path. Capped: a 100k-element IN-list would
      // explode the pushed predicate and the probe frame; past the cap
      // the scan+filter path is the better plan anyway (readKeyBuckets
      // exists for bulk key-frame reads). A PINNED version threads
      // through to lookupKeyed so the point read answers from exactly
      // the caller's snapshot — a base commit between the caller's
      // read_keyed and this selection must not change the frame's rows
      // (the KeyedMark contract; ADVICE r12).
      case Some(ks) if ks.nonEmpty && ks.length <= 1000 =>
        return lookupKeyed(spark, dir, ks, version).filter(cond)
      case _ => ()
    }
    // zone-map pruning: per-conjunct [lo, hi] bounds (conservatively
    // inclusive — strict bounds keep a touching bucket, never drop one)
    def bounds(e: E.Expression)
        : Option[(String, Option[Any], Option[Any])] = e match {
      case E.GreaterThanOrEqual(a, v) if litVal(v).isDefined =>
        attrName(a).map(n => (n, Some(litVal(v).get), None))
      case E.GreaterThan(a, v) if litVal(v).isDefined =>
        attrName(a).map(n => (n, Some(litVal(v).get), None))
      case E.LessThanOrEqual(a, v) if litVal(v).isDefined =>
        attrName(a).map(n => (n, None, Some(litVal(v).get)))
      case E.LessThan(a, v) if litVal(v).isDefined =>
        attrName(a).map(n => (n, None, Some(litVal(v).get)))
      case E.GreaterThanOrEqual(v, a) if litVal(v).isDefined =>
        attrName(a).map(n => (n, None, Some(litVal(v).get)))
      case E.GreaterThan(v, a) if litVal(v).isDefined =>
        attrName(a).map(n => (n, None, Some(litVal(v).get)))
      case E.LessThanOrEqual(v, a) if litVal(v).isDefined =>
        attrName(a).map(n => (n, Some(litVal(v).get), None))
      case E.LessThan(v, a) if litVal(v).isDefined =>
        attrName(a).map(n => (n, Some(litVal(v).get), None))
      case _ => eq(e).map { case (n, v) => (n, Some(v), Some(v)) }
    }
    // a conjunct reduced to a DISJUNCTION of [lo, hi] ranges on ONE
    // column: plain comparisons/equalities give one range, `BETWEEN`
    // arrives as two conjuncts (Column.between analyzes to >= AND <=),
    // an IN-list gives a point range per element, and OR combines
    // same-column disjuncts recursively — so `v IN (…)`,
    // `v < a OR v > b`, and OR-chains of equalities all prune. A
    // cross-column OR (or any unrecognized disjunct) keeps the whole
    // conjunct unrecognized → it prunes nothing (never a guess); the
    // full predicate still applies after resolution either way.
    def ranges(e: E.Expression)
        : Option[(String, Seq[(Option[Any], Option[Any])])] = e match {
      case E.Or(l, r) =>
        for {
          (nl, rl) <- ranges(l)
          (nr, rr) <- ranges(r)
          if nl.equalsIgnoreCase(nr)
        } yield (nl, rl ++ rr)
      case E.In(a, vs) if attrName(a).isDefined &&
          vs.nonEmpty && vs.forall(litVal(_).isDefined) =>
        // a NULL element matches no rows, so it contributes no range
        // (an all-NULL list leaves zero ranges → every bucket prunes,
        // which is exactly `col IN (NULL)`'s empty answer)
        Some((attrName(a).get,
          vs.map(litVal(_).get).filter(_ != null)
            .map(v => (Some(v), Some(v)))))
      case _ => bounds(e).map { case (n, lo, hi) => (n, Seq((lo, hi))) }
    }
    val types: Map[String, org.apache.spark.sql.types.DataType] =
      if (m.schemaDdl.isEmpty) Map.empty
      else parseDdl(m.schemaDdl)
        .fields.map(f => f.name -> f.dataType).toMap
    val zone = cs.flatMap(ranges(_)).flatMap { case (n, rs) =>
      m.statsCols.find(_.equalsIgnoreCase(n)).map(real => (real, rs))
    }
    val kept = live.filter { b =>
      val dirs = m.buckets.get(b).toSeq ++ m.deltas.getOrElse(b, Nil)
      // kept iff, for EVERY recognized conjunct, SOME dir's stats can
      // intersect SOME of its disjunct ranges (bucket granularity — the
      // same delta-safety rule as readKeyedRange)
      zone.forall { case (n, rs) =>
        dirs.exists { d =>
          (types.get(n), m.colStats.get(d).flatMap(_.get(n))) match {
            case (Some(t), Some((mn, mx))) =>
              rs.exists { case (lo, hi) =>
                statOverlapBounds(t, mn, mx, lo, hi) }
            case _ => true
          }
        }
      }
    }
    if (kept.isEmpty) emptySnapshot(spark, clean, m).filter(cond)
    else resolveBuckets(spark, clean, m, kept, None).filter(cond)
  }

  private def statOverlap(dt: org.apache.spark.sql.types.DataType,
                          mnS: String, mxS: String,
                          lo: Any, hi: Any): Boolean =
    statOverlapBounds(dt, mnS, mxS, Some(lo), Some(hi))

  /** Open-ended variant: None = unbounded on that side. Overlap of
    * [lo, hi] with a dir's recorded [mn, mx] requires mn ≤ hi and
    * mx ≥ lo — each check skipped for an open bound, and any
    * undecodable comparison answers true (unprunable, never a guess).
    */
  private def statOverlapBounds(dt: org.apache.spark.sql.types.DataType,
                                mnS: String, mxS: String,
                                lo: Option[Any], hi: Option[Any])
      : Boolean = {
    import org.apache.spark.sql.types._
    def micros(v: Any): Option[Long] = v match {
      case t: java.sql.Timestamp =>
        Some(t.getTime / 1000 * 1000000L + t.getNanos / 1000L)
      case i: java.time.Instant =>
        Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
      case _ => None
    }
    def days(v: Any): Option[Long] = v match {
      case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
      case d: java.time.LocalDate => Some(d.toEpochDay)
      case _ => None
    }
    // sign of (statValue - probe), None when undecodable
    def cmp(statS: String, probe: Any): Option[Int] =
      try dt match {
        case StringType => Some(statS.compareTo(probe.toString))
        case ByteType | ShortType | IntegerType | LongType
             | FloatType | DoubleType =>
          Some(BigDecimal(statS).compare(BigDecimal(probe.toString)))
        case DateType => days(probe).map(p => statS.toLong.compareTo(p))
        case TimestampType =>
          micros(probe).map(p => statS.toLong.compareTo(p))
        case _ => None
      } catch { case _: NumberFormatException => None }
    hi.forall(h => cmp(mnS, h).forall(_ <= 0)) &&
      lo.forall(l => cmp(mxS, l).forall(_ >= 0))
  }

  /** A fully-emptied table is a legal snapshot: an EMPTY frame with
    * the schema the manifest records (r9+ manifests are
    * self-describing, so this survives vacuuming every prior
    * generation); pre-r9 manifests fall back to the latest earlier
    * non-empty snapshot's files.
    */
  private def emptySnapshot(spark: SparkSession, clean: String,
                            m: KeyedManifest): DataFrame = {
    if (m.schemaDdl.nonEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        parseDdl(m.schemaDdl))
    val prior = manifestVersions(spark, clean).filter(_ < m.version)
      .reverse.map(v => readManifest(spark, clean, Some(v)))
      .find(_.buckets.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot v${m.version} of $clean is empty and no prior " +
          "snapshot remains to supply a schema"))
    spark.read.parquet(s"$clean/${prior.buckets.head._2}").limit(0)
  }

  /** Parquet read of generation/delta dirs with the manifest's OWN
    * recorded schema instead of `mergeSchema` footer inference: every
    * commit since r9 records the additively-unioned snapshot schema, so
    * re-deriving it from file footers launched one schema-merge Spark
    * job per read for information the manifest already holds (guide
    * §1/§6 — plan-time cost; measurable across the lifecycle gates,
    * and at 100 TB a footer sweep of a wide snapshot is real IO).
    * Dirs missing a newer column surface it as NULL exactly as the
    * mergeSchema read did; `asNullable` mirrors parquet inference
    * (file-source columns are always nullable on read). Pre-r9
    * manifests (no recorded schema) keep the mergeSchema path.
    */
  private def readGenDirs(spark: SparkSession, clean: String,
                          m: KeyedManifest, dirs: Seq[String],
                          withTomb: Boolean): DataFrame = {
    val paths = dirs.sorted.map(d => s"$clean/$d")
    if (m.schemaDdl.isEmpty)
      spark.read.option("mergeSchema", "true").parquet(paths: _*)
    else {
      val base = parseDdl(m.schemaDdl)
      val sch =
        if (withTomb && !base.fieldNames.contains("__tomb"))
          base.add("__tomb", org.apache.spark.sql.types.BooleanType)
        else base
      // fields forced nullable like parquet inference (asNullable is
      // private[spark]); fromDDL already made nested levels nullable
      spark.read.schema(org.apache.spark.sql.types.StructType(
        sch.fields.map(_.copy(nullable = true)))).parquet(paths: _*)
    }
  }

  /** The live rows of `buckets` under manifest `m`: plain buckets read
    * straight from their generation dir; buckets carrying a delta
    * chain resolve LAST-WINS per key — precedence 0 is the base
    * generation, precedence i the i-th delta, the highest precedence
    * row wins, and a winning tombstone (`__tomb`) removes the key.
    * The resolution window shuffles ONLY the delta-carrying buckets'
    * rows (a same-bucket chain never spans buckets, so the per-key
    * window is correct across the multi-bucket union); `keyFilter`
    * (point lookups) pushes into every level's parquet scan BEFORE
    * the window. Levels union by name so delta batches may carry
    * additive schema changes like any merge.
    */
  private def resolveBuckets(spark: SparkSession, clean: String,
                             m: KeyedManifest, buckets: Seq[Int],
                             keyFilter: Option[Column]): DataFrame = {
    // an agg-state table's delta chains hold AGGREGATE PARTIALS —
    // last-wins resolution would silently keep only the newest partial
    // per key; fail loudly instead (plain chain-free buckets are fine:
    // a compacted/CoW agg state has unique keys and no resolution)
    require(m.resolve != "agg" ||
      buckets.forall(b => !m.deltas.get(b).exists(_.nonEmpty)),
      s"$clean stores aggregate partials in its delta chains " +
        "(resolve=agg) — read through readAggStateKeyed and compact " +
        "with compactAggStateKeyed, never the last-wins readers")
    def rd(dirs: Seq[String], withTomb: Boolean = false): DataFrame = {
      val df = readGenDirs(spark, clean, m, dirs, withTomb)
      keyFilter.fold(df)(df.filter)
    }
    val (deltaB, plainB) = buckets.partition(b =>
      m.deltas.get(b).exists(_.nonEmpty))
    val plain = plainB.flatMap(m.buckets.get) match {
      case Nil => None
      case dirs => Some(rd(dirs))
    }
    val resolved =
      if (deltaB.isEmpty) None
      else {
        val maxChain = deltaB.map(b => m.deltas(b).length).max
        // level 0 = the base generations (a bucket born from a pure
        // delta insert has none), level i = every bucket's i-th delta
        val levels = (0 -> deltaB.flatMap(m.buckets.get)) +:
          (1 to maxChain).map(i =>
            i -> deltaB.flatMap(b => m.deltas(b).lift(i - 1)))
        val parts = levels.filter(_._2.nonEmpty).map { case (i, dirs) =>
          // delta levels (i >= 1) always carry __tomb in their files;
          // the recorded snapshot schema deliberately drops it, so the
          // explicit-schema read adds it back for those levels only
          rd(dirs, withTomb = i >= 1).withColumn("__prec", F.lit(i))
        }
        val un = parts.reduce(
          _.unionByName(_, allowMissingColumns = true))
        // chain-order-wins by default; a table with a registered
        // SEQUENCE column resolves max-seq-wins (ties break by chain
        // order) — the out-of-order CDC contract: a late-arriving old
        // event can never overwrite a newer stored row.
        // ARGMAX aggregate, not a row_number window (r15): the window
        // had to SORT every key partition by (seq, prec) to number
        // rows it then discarded, and got no map-side reduction; the
        // native top-row aggregate keeps one winner per key (bounded
        // state), reduces partials before the exchange, and plans
        // with no Sort. Interpreted struct ordering puts a NULL seq
        // below any stamped one — exactly the window's
        // desc_nulls_last. (seq, prec) is unique per key (the
        // unique-keys-per-level guard), so there are no ties.
        val ord =
          if (m.seqCol.nonEmpty && un.columns.contains(m.seqCol))
            F.struct(F.col(m.seqCol), F.col("__prec"))
          else F.col("__prec")
        val top = un.groupBy(m.keyCols.map(F.col): _*)
          .agg(graft.plans.TopRow.topRow(
            ord, F.struct(un.columns.map(F.col): _*)).as("__win"))
          .select(F.col("__win.*"))
        val alive =
          if (un.columns.contains("__tomb"))
            top.filter(!F.coalesce(F.col("__tomb"), F.lit(false)))
          else top
        Some(alive.drop("__prec", "__tomb"))
      }
    (plain, resolved) match {
      case (Some(p), Some(r)) => p.unionByName(r, allowMissingColumns = true)
      case (Some(p), None) => p
      case (None, Some(r)) => r
      case (None, None) => emptySnapshot(spark, clean, m)
    }
  }

  /** Write `df` as a KEYED table: hash-bucketed into `nBuckets` dirs on
    * `kb = h60(key) mod nBuckets`, committed as manifest v1. The layout
    * is what makes `upsertKeyed`/`deleteKeyed` proportional to the
    * BATCH, not the table: a change batch touches only the buckets its
    * keys hash into, and the merge job reads exactly those dirs via the
    * manifest (path-level pruning — the untouched 99.x% of a 100 TB
    * table contributes zero IO, not even footer reads). Size nBuckets
    * so one bucket ≈ one comfortable rewrite (e.g. 100 TB / 10k buckets
    * = 10 GB merges).
    */
  def writeKeyed(df: DataFrame, dir: String, keyCol: String,
                 nBuckets: Int): Unit =
    writeKeyed(df, dir, Seq(keyCol), nBuckets)

  /** COMPOSITE-key variant (real CDC feeds key on (tenant, id) pairs):
    * the bucket hash joins the components' string casts (see `kb`),
    * the manifest records the column list, and every downstream face —
    * merge/delta/lookup/changes/CDC — keys on the full tuple.
    * `statsCols` declares the zone-map column list: each commit then
    * records per-dir MIN/MAX for them (from the same footer pass that
    * counts rows) and `readKeyedRange` prunes against range predicates.
    */
  def writeKeyed(df: DataFrame, dir: String, keyCols: Seq[String],
                 nBuckets: Int, statsCols: Seq[String] = Seq.empty): Unit =
    writeKeyedInternal(df, dir, keyCols, nBuckets, statsCols,
      nullSafe = false)

  private[sources] def writeKeyedInternal(df: DataFrame, dir: String,
                                          keyCols: Seq[String], nBuckets: Int,
                                          statsCols: Seq[String],
                                          nullSafe: Boolean,
                                          resolve: String = "",
                                          txn: Map[String, Long] = Map.empty,
                                          aggP: Int = 0, aggK: Int = -1,
                                          aggSU: String = "")
      : Unit = {
    require(nBuckets > 0, s"nBuckets must be > 0, got $nBuckets")
    require(statsCols.forall(df.columns.contains),
      s"statsCols ${statsCols.mkString(",")} must exist in the frame")
    val spark = df.sparkSession
    val clean = cleanDir(dir)
    val keyCol = keyCols.mkString(",")
    val withKb = df.withColumn("kb", kb(keyCols, nBuckets, nullSafe))
    if (manifestVersions(spark, dir).isEmpty) {
      val fs = hadoopFs(spark, new Path(clean))
      // reclaim LEGACY (pre-format plain-parquet) files only — never
      // `_manifests` or generation dirs, which a RACING bootstrap may
      // have just committed (a recursive dir delete here was a TOCTOU
      // hole: writer B could wipe writer A's committed v1 between A's
      // publish and B's stage)
      if (fs.exists(new Path(clean)))
        fs.listStatus(new Path(clean)).toSeq
          .filterNot(s => s.getPath.getName == "_manifests" ||
            s.getPath.getName.matches("""[bd]\d{5}_g\d{9}(-.*)?"""))
          .foreach(s => fs.delete(s.getPath, true))
      val (staged, rows, cstats) = stageBuckets(spark, clean, withKb, 1,
        keyCols, statsCols, nBuckets = nBuckets)
      try writeManifest(spark, clean, KeyedManifest(1, staged, keyCol,
        nBuckets, withKb.schema.toDDL, rows = rows,
        statsCols = statsCols, colStats = cstats, resolve = resolve,
        txn = txn, aggP = aggP, aggK = aggK, aggSU = aggSU))
      catch {
        case _: CommitConflict =>
          // another bootstrap won v1 — our staged dirs (writer-unique
          // names, version digits cosmetic) become the next full
          // replacement through the ordinary optimistic path
          withCommitRetry(s"writeKeyed($dir)") {
            val m = readManifest(spark, dir)
            writeManifest(spark, clean, KeyedManifest(m.version + 1,
              staged, keyCol, nBuckets, withKb.schema.toDDL, rows = rows,
              statsCols = statsCols, colStats = cstats, resolve = resolve,
              txn = m.txn ++ txn, aggP = aggP, aggK = aggK, aggSU = aggSU))
          }
      }
    } else {
      // re-bootstrap over an EXISTING keyed table stays snapshot-
      // isolated: stage the replacement generations (invisible) and
      // publish the next manifest — a racing reader sees the old or
      // the new COMPLETE table, never a half-deleted directory (the
      // pre-r9 delete-then-restage violated exactly that); the old
      // generations vacuum away later
      withCommitRetry(s"writeKeyed($dir)") {
        val m = readManifest(spark, dir)
        val (staged, rows, cstats) = stageBuckets(spark, clean, withKb,
          m.version + 1, keyCols, statsCols, nBuckets = nBuckets)
        writeManifest(spark, clean, KeyedManifest(m.version + 1, staged,
          keyCol, nBuckets, withKb.schema.toDDL, rows = rows,
          statsCols = statsCols, colStats = cstats, resolve = resolve,
          txn = m.txn ++ txn, aggP = aggP, aggK = aggK, aggSU = aggSU))
      }
    }
  }

  /** The writer-app transaction watermark recorded for `appId` (the
    * Delta-style idempotent-sink read): the last batch id a streaming
    * sink committed into this table, carried forward through every
    * commit. None when the table has no manifest or no entry yet.
    */
  def lastTxn(spark: SparkSession, dir: String, appId: String)
      : Option[Long] =
    if (manifestVersions(spark, dir).isEmpty) None
    else readManifest(spark, dir).txn.get(appId)

  /** Row count + per-column MIN/MAX zone maps of the parquet files
    * directly under `dir`, from the file FOOTERS alone — no Spark job,
    * no data pages read. This is how staged dirs report into the
    * manifest `rows`/`colstats` maps: O(files) metadata reads at
    * commit time buy every later `keyedStats`/`readKeyedRange`/
    * planning call an O(manifest) answer.
    *
    * A column's stats land only when EVERY file+row-group in the dir
    * carries usable parquet statistics of the expected physical type
    * (a missing/unsupported chunk makes the whole dir unprunable for
    * that column — pruning must never be a guess). Supported Spark
    * types: integral, float/double, string, date, timestamp
    * (INT64-micros layout).
    */
  private def footerInfo(spark: SparkSession, dir: Path,
                         statsCols: Seq[String])
      : (Long, Map[String, (String, String)]) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = hadoopFs(spark, dir)
    var rows = 0L
    // per-column fold: cur = running (min, max) over usable chunks;
    // failed = some chunk carried rows but no usable stats (the dir is
    // then unprunable for that column). A file MISSING the column
    // entirely contributes only nulls there (schema evolution), which
    // never satisfy a range predicate — it doesn't widen or fail.
    val cur = scala.collection.mutable.Map
      .empty[String, (Comparable[Any], Comparable[Any])]
    val failed = scala.collection.mutable.Set.empty[String]
    fs.listStatus(dir).toSeq
      .filter(_.getPath.getName.endsWith(".parquet")).foreach { st =>
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromStatus(st, conf))
        try {
          rows += rd.getRecordCount
          rd.getFooter.getBlocks.forEach { blk =>
            blk.getColumns.forEach { cc =>
              val c = cc.getPath.toDotString
              if (statsCols.contains(c) && !failed(c)) {
                val s = cc.getStatistics
                if (s != null && !s.isEmpty && !s.hasNonNullValue &&
                    s.getNumNulls == blk.getRowCount) {
                  // all-null chunk: contributes nothing, fails nothing
                } else if (s == null || s.isEmpty || !s.hasNonNullValue ||
                    !supportedStat(cc)) {
                  failed += c; cur -= c
                } else {
                  val mn = s.genericGetMin.asInstanceOf[Comparable[Any]]
                  val mx = s.genericGetMax.asInstanceOf[Comparable[Any]]
                  cur(c) = cur.get(c) match {
                    case None => (mn, mx)
                    case Some((a, b)) => (
                      if (mn.compareTo(a) < 0) mn else a,
                      if (mx.compareTo(b) > 0) mx else b)
                  }
                }
              }
            }
          }
        } finally rd.close()
      }
    (rows, cur.toMap.map { case (c, (mn, mx)) =>
      c -> (statEncode(mn), statEncode(mx)) })
  }

  /** Usable physical layouts for zone-map stats: plain primitives and
    * UTF8 binary. Excludes INT96 timestamps (no reliable parquet
    * stats) and decimal/complex encodings.
    */
  private def supportedStat(
      cc: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Boolean = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val pt = cc.getPrimitiveType
    pt.getPrimitiveTypeName match {
      case INT32 | INT64 | FLOAT | DOUBLE =>
        pt.getLogicalTypeAnnotation match {
          // decimal-annotated ints store unscaled values — skip rather
          // than compare a scaled probe against unscaled stats
          case _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
            false
          // the reader decodes timestamps as MICROS — any other unit
          // (or INT96, rejected by the primitive match) stays unpruned
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS
          case _ => true
        }
      case BINARY =>
        pt.getLogicalTypeAnnotation
          .isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
      case _ => false
    }
  }

  private def statEncode(v: Comparable[Any]): String = (v: Any) match {
    case b: org.apache.parquet.io.api.Binary =>
      new String(b.getBytes, "UTF-8")
    case x => x.toString
  }

  /** Footer info for many staged dirs, opened in PARALLEL — a
    * 32-bucket commit pays one footer round-trip, not 32 serial ones
    * (measured: the serial loop added ~1s per commit on local disk;
    * on an object store each open is a network round-trip).
    */
  private def footerInfoAll(spark: SparkSession, clean: String,
                            dirs: Iterable[String], statsCols: Seq[String])
      : (Map[String, Long], Map[String, Map[String, (String, String)]]) = {
    import scala.collection.parallel.CollectionConverters._
    val per = dirs.toSeq.par
      .map(d => d -> footerInfo(spark, new Path(clean, d), statsCols))
      .seq.toMap
    (per.map { case (d, (n, _)) => d -> n },
      per.collect { case (d, (_, cs)) if cs.nonEmpty => d -> cs })
  }

  /** Write `withKb` (any frame carrying the int `kb` column) as one
    * generation's bucket dirs: a staging job partitioned by a DUPLICATE
    * of kb (so kb survives as a data column), then per-bucket renames
    * into `b<bucket>_g<version>` names. The renames move dirs no reader
    * can reference yet, so they need no atomicity; one file per bucket
    * because the hash repartition puts each kb in exactly one task.
    * Rows sort by key WITHIN each bucket, so the parquet row-group
    * min/max stats on the key column are narrow and a point lookup's
    * pushed IN-list skips most row groups inside the bucket too.
    * Returns bucket → dir-name for the buckets that got any rows,
    * plus dir-name → row count (from the staged footers).
    */
  private def stageBuckets(spark: SparkSession, clean: String,
                           withKb: DataFrame, version: Int,
                           keyCols: Seq[String],
                           statsCols: Seq[String] = Seq.empty,
                           prefix: Char = 'b',
                           nBuckets: Int = 0)
      : (Map[Int, String], Map[String, Long],
         Map[String, Map[String, (String, String)]]) = {
    val fs = hadoopFs(spark, new Path(clean))
    // pid + counter: two concurrent writers IN THE SAME JVM (a CDC
    // stream sink plus an ad-hoc merge) must never share a staging
    // dir — the first's delete would wipe the second's in-flight job
    val staging = new Path(clean +
      s".staging_${ProcessHandle.current().pid()}x${stageCounter.incrementAndGet()}")
    fs.delete(staging, true)
    // EXPLICIT partition count (r14): `repartition(col("kb"))` uses the
    // session shuffle-partition count, which AQE then coalesces — on a
    // small commit the whole staging collapses to ONE task that writes
    // every bucket file serially (measured: a 548 ms single-task write
    // after each 32-task map in x144). An explicit count is exempt
    // from AQE coalescing, so each bucket's file writes in its own
    // task. `parts` = the table's bucket count when the caller knows
    // it (one task ≈ one bucket, the rewrite-unit contract — at any
    // scale a bucket is one sorted file written by one task); hash
    // collisions between bucket ids just stack two buckets in a task.
    val parts = math.max(1,
      if (nBuckets > 0) nBuckets
      else spark.sparkContext.defaultParallelism)
    withKb.withColumn("__kbp", F.col("kb"))
      .repartition(parts, F.col("kb"))
      .sortWithinPartitions(F.col("kb") +: keyCols.map(F.col): _*)
      .write.mode("overwrite").partitionBy("__kbp").parquet(staging.toString)
    fs.mkdirs(new Path(clean))
    val out = fs.listStatus(staging).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("__kbp=")).map { src =>
        val b = src.getName.stripPrefix("__kbp=").toInt
        val name = prefix + bucketDirName(b, version).drop(1)
        require(fs.rename(src, new Path(clean, name)),
          s"bucket stage failed: $src -> $clean/$name")
        b -> name
      }.toMap
    fs.delete(staging, true)
    val (rows, cstats) = footerInfoAll(spark, clean, out.values, statsCols)
    (out, rows, cstats)
  }

  /** A staged-but-uncommitted merge: every new bucket-generation dir is
    * on disk, the next manifest is computed, and NO reader can see any
    * of it until `commitKeyed` publishes the manifest. Split out so the
    * snapshot-isolation property is directly testable.
    */
  private[graft] final case class PendingCommit(clean: String,
                                                manifest: KeyedManifest)

  private[graft] def stageMerge(spark: SparkSession, dir: String,
                                merged: DataFrame, touched: Seq[Int],
                                base: KeyedManifest,
                                txn: Map[String, Long] = Map.empty)
      : PendingCommit = {
    val clean = cleanDir(dir)
    // the commit targets base.version + 1 — NOT a re-read of the
    // latest manifest: the merge was computed against `base`'s data,
    // and if a concurrent commit landed since, publishing on top of it
    // would silently drop that writer's changes. Targeting base+1
    // makes the manifest rename fail instead (CommitConflict → the
    // caller recomputes against the fresh snapshot).
    val (staged, stagedRows, stagedStats) = stageBuckets(spark, clean,
      merged, base.version + 1,
      if (base.keyCol.nonEmpty) base.keyCols else Seq("kb"),
      base.statsCols, nBuckets = base.nBuckets)
    // a touched bucket absent from staging lost ALL its rows (delete
    // path): it simply leaves the manifest
    val next = base.buckets -- touched ++ staged
    // a full merge of a bucket FOLDS its delta chain into the new
    // base generation (readTouched resolved it), so touched buckets'
    // deltas leave the manifest
    val nextDeltas = base.deltas -- touched
    val liveDirs = next.values.toSet ++ nextDeltas.values.flatten
    val nextRows = base.rows.filter { case (d, _) => liveDirs(d) } ++ stagedRows
    val nextStats = base.colStats.filter { case (d, _) => liveDirs(d) } ++
      stagedStats
    // snapshot schema grows additively across merges: prior schema
    // ∪ the merged frame's (which carries any new batch columns)
    val schema =
      if (base.schemaDdl.isEmpty) merged.schema.toDDL
      else unionSchema(
        parseDdl(base.schemaDdl),
        merged.schema).toDDL
    PendingCommit(clean,
      KeyedManifest(base.version + 1, next, base.keyCol, base.nBuckets,
        schema, nextDeltas, nextRows,
        statsCols = base.statsCols, colStats = nextStats,
        resolve = base.resolve, txn = base.txn ++ txn,
        aggP = base.aggP, aggK = base.aggK, depths = base.depths,
        aggSU = base.aggSU, seqCol = base.seqCol))
  }

  private[graft] def commitKeyed(spark: SparkSession,
                                 pending: PendingCommit): Unit =
    writeManifest(spark, pending.clean, pending.manifest)

  /** MERGE (upsert) `updates` into the keyed table at `dir`: rows whose
    * key matches an update are replaced, new keys are inserted, and —
    * the scale contract — only the buckets the batch's keys hash into
    * are read or rewritten (the manifest gives path-level pruning).
    * The merge is anti-join + union into new bucket-generation dirs;
    * the commit is one manifest publish, so concurrent READERS always
    * see a complete snapshot (old until the commit, new after).
    * Schema evolves ADDITIVELY: an update batch may carry columns the
    * table doesn't have yet (they land for the merged rows; untouched
    * generations surface them as NULL through readKeyed's mergeSchema)
    * and may omit table columns (the batch's rows get NULL there).
    * Dropping or retyping a column is NOT supported — rewrite.
    * Later duplicate keys WITHIN the batch are the caller's contract
    * to avoid (both copies land, same as inserting twice).
    * CONCURRENT WRITERS are safe on any FS with atomic
    * rename-if-absent (HDFS/local; object stores need a conditional
    * PUT): staged dirs are writer-unique, the manifest publish is the
    * only contention point, and a losing writer transparently
    * recomputes its merge against the winner's snapshot and retries.
    */
  def upsertKeyed(spark: SparkSession, dir: String, updates: DataFrame,
                  keyCol: String, nBuckets: Int): Unit =
    mergeKeyed(spark, dir, Some(updates), None, Seq(keyCol), nBuckets)

  /** Composite-key upsert. */
  def upsertKeyed(spark: SparkSession, dir: String, updates: DataFrame,
                  keyCols: Seq[String], nBuckets: Int): Unit =
    mergeKeyed(spark, dir, Some(updates), None, keyCols, nBuckets)

  /** Delete by key from the keyed table at `dir`; `keys` is a 1-column
    * frame. Same pruned-read + staged-commit shape as upsertKeyed; a
    * bucket whose every row was deleted has no staged dir and leaves
    * the manifest outright.
    */
  def deleteKeyed(spark: SparkSession, dir: String, keys: DataFrame,
                  keyCol: String, nBuckets: Int): Unit =
    mergeKeyed(spark, dir, None,
      Some(keys.select(F.col(keys.columns.head).as(keyCol))),
      Seq(keyCol), nBuckets)

  /** Composite-key delete: `keys` carries the key columns by name. */
  def deleteKeyed(spark: SparkSession, dir: String, keys: DataFrame,
                  keyCols: Seq[String], nBuckets: Int): Unit =
    mergeKeyed(spark, dir, None, Some(keys.select(keyCols.map(F.col): _*)),
      keyCols, nBuckets)

  /** The ONE merge body behind upsert, delete, and the CDC batch sink:
    * upserts and deletes land in a SINGLE staged commit (one manifest
    * publish), so a reader racing a tombstone-carrying batch never
    * observes the updates-applied/deletes-pending intermediate state
    * that two sequential commits would expose.
    */
  def mergeKeyed(spark: SparkSession, dir: String,
                 updates: Option[DataFrame], deleteKeys: Option[DataFrame],
                 keyCols: Seq[String], nBuckets: Int): Unit = {
    // the bucket function derives from the CURRENT layout (the depth
    // map is manifest metadata, r11) — read it before hashing the batch
    val m0 = readManifest(spark, dir)
    // fail the seq-resolved refusal BEFORE the batch checkpoint/probe
    // jobs (readTouched re-checks inside the retry as defense): a
    // caller probing the guard paid ~3 Spark jobs for a driver-side
    // answer the manifest already holds
    require(m0.seqCol.isEmpty,
      s"${cleanDir(dir)} resolves by sequence column '${m0.seqCol}' — " +
        "upsert/delete/CoW-merge are batch-wins and would break it; " +
        "append stamped deltas instead (appendDeltaKeyed) and compact")
    val depths0 = m0.depths
    val up = updates.map(_.withColumn("kb",
        kb(keyCols, nBuckets, depths = depths0))
      .localCheckpoint())
    val dk = deleteKeys.map(_.select(keyCols.map(F.col): _*)
      .withColumn("kb", kb(keyCols, nBuckets, depths = depths0))
      .localCheckpoint())
    val touched = (up.toSeq ++ dk.toSeq)
      .flatMap(_.select("kb").distinct().collect().map(_.getInt(0)))
      .distinct.sorted
    if (touched.isEmpty) return
    val batchForSchema = up.orElse(dk).get
    withCommitRetry(s"mergeKeyed($dir)") {
      // ONE manifest read per attempt, threaded through base read AND
      // commit: the publish targets exactly the version the merge was
      // computed against
      val m = readManifest(spark, dir)
      // the batch was hashed under depths0 — a concurrent SPLIT since
      // would park rows in buckets they no longer hash to
      require(m.depths == depths0,
        s"keyed table $dir re-bucketed mid-merge (splitKeyed) — " +
          "re-run the merge")
      val base = readTouched(spark, dir, m, touched, batchForSchema,
        keyCols, nBuckets)
      val gone = (up.map(_.select(keyCols.map(F.col): _*)).toSeq ++
        dk.map(_.select(keyCols.map(F.col): _*)).toSeq)
        .reduce(_.unionByName(_)).distinct()
      val kept = base.join(gone, keyCols, "left_anti")
      val merged = up.fold(kept)(u =>
        kept.unionByName(u, allowMissingColumns = true))
      commitKeyed(spark, stageMerge(spark, dir, merged, touched, m))
    }
  }

  /** Single-column-key merge (the pre-r10 signature). */
  def mergeKeyed(spark: SparkSession, dir: String,
                 updates: Option[DataFrame], deleteKeys: Option[DataFrame],
                 keyCol: String, nBuckets: Int): Unit =
    mergeKeyed(spark, dir, updates, deleteKeys, Seq(keyCol), nBuckets)

  /** PREDICATE DELETE — `DELETE FROM t WHERE cond` for keyed tables:
    * the predicate's own structure prunes the read (key-equality
    * conjuncts pin buckets, zone-mapped ranges skip via manifest
    * stats — `readKeyedWhere`'s planning), only the buckets that
    * actually HOLD matching rows are rewritten, and one manifest
    * publish commits the whole delete atomically. Returns the number
    * of rows deleted. At 100 TB a retention sweep
    * (`ts < now - 90d` over a zone-mapped ts) touches exactly the
    * cold buckets, never the table.
    */
  def deleteKeyedWhere(spark: SparkSession, dir: String,
                       cond: Column): Long =
    dmlKeyedWhere(spark, dir, cond, None)

  /** PREDICATE UPDATE — `UPDATE t SET c = e, ... WHERE cond`: same
    * pruned plan and atomic commit as `deleteKeyedWhere`; matched
    * rows get the assignments (evaluated against the OLD row, like
    * SQL), unmatched rows in the touched buckets rewrite unchanged.
    * Key columns cannot be reassigned (that is a delete + insert —
    * the row would change buckets). Returns the number of rows
    * matched.
    */
  def updateKeyedWhere(spark: SparkSession, dir: String, cond: Column,
                       assignments: Seq[(String, Column)]): Long = {
    require(assignments.nonEmpty, "updateKeyedWhere: no assignments")
    dmlKeyedWhere(spark, dir, cond, Some(assignments))
  }

  /** MERGE-ON-READ predicate delete: tombstones for the keys matching
    * `cond` (as of the current snapshot) APPEND as per-bucket delta
    * dirs — bytes written ∝ MATCHES, the base generations never
    * rewrite (the copy-on-write `deleteKeyedWhere` pays O(touched
    * buckets), which a narrow delete over fat buckets cannot afford).
    * Resolution hides the rows immediately; `compactKeyed` reclaims
    * the bytes. On a SEQ-RESOLVED table pass `seq` — the stamp the
    * tombstones carry (it must outrank the stored rows to take
    * effect, and late-arriving older events still lose to it); on
    * chain-order tables the append order IS the statement order.
    * Semantics are snapshot-at-read, applied at append order — the
    * same contract as any appendDeltaKeyed batch computed from a
    * read. Returns the number of keys tombstoned.
    */
  def deleteKeyedWhereDelta(spark: SparkSession, dir: String,
                            cond: Column,
                            seq: Option[Column] = None): Long = {
    val clean = cleanDir(dir)
    val m = readManifest(spark, dir)
    require(m.nBuckets > 0, s"$clean has no keyed metadata")
    require(m.resolve != "agg",
      s"$clean is an agg state — DML runs against its BASE table")
    require(m.seqCol.isEmpty || seq.isDefined,
      s"$clean resolves by sequence column '${m.seqCol}' — a delta " +
        "delete must STAMP its tombstones (pass seq = the statement's " +
        "sequence value) or unstamped rows would outlive it")
    // the inverse confusion fails loudly too: a stamp on a NON-seq
    // table would be silently ignored (chain-order semantics) and the
    // caller would believe out-of-order safety they don't have
    require(seq.isEmpty || m.seqCol.nonEmpty,
      s"deleteKeyedWhereDelta($clean): a seq stamp was passed but the " +
        "table is not sequence-resolved — declare the seq column at " +
        "the first delta append, or drop the stamp")
    val hit = readKeyedWhere(spark, clean, cond,
      version = Some(m.version))
    // small by construction (matching KEYS only) — checkpoint so the
    // count and the append's own jobs don't re-run the pruned resolve
    val keys = seq match {
      case Some(sc) if m.seqCol.nonEmpty =>
        hit.select(m.keyCols.map(F.col) :+ sc.as(m.seqCol): _*)
      case _ => hit.select(m.keyCols.map(F.col): _*)
    }
    val tk = keys.localCheckpoint()
    val matched = tk.count()
    if (matched > 0L)
      appendDeltaKeyedCols(spark, clean, hit.drop("kb").limit(0),
        m.keyCols, m.nBuckets, tombstoneKeys = Some(tk))
    matched
  }

  /** MERGE-ON-READ predicate update: the matching rows (as of the
    * current snapshot) with assignments applied APPEND as per-bucket
    * deltas — bytes ∝ matches, bases untouched, resolution serves the
    * new values immediately (`updateKeyedWhere` is the copy-on-write
    * twin that rewrites the touched buckets). Same stamping rule as
    * the delta delete on seq-resolved tables; same
    * snapshot-at-read/applied-at-append contract. Returns the number
    * of rows updated.
    */
  def updateKeyedWhereDelta(spark: SparkSession, dir: String,
                            cond: Column,
                            assignments: Seq[(String, Column)],
                            seq: Option[Column] = None): Long = {
    require(assignments.nonEmpty, "updateKeyedWhereDelta: no assignments")
    val clean = cleanDir(dir)
    val m = readManifest(spark, dir)
    require(m.nBuckets > 0, s"$clean has no keyed metadata")
    require(m.resolve != "agg",
      s"$clean is an agg state — DML runs against its BASE table")
    require(m.seqCol.isEmpty || seq.isDefined,
      s"$clean resolves by sequence column '${m.seqCol}' — a delta " +
        "update must STAMP its rows (pass seq) or stored rows outrank " +
        "them")
    require(seq.isEmpty || m.seqCol.nonEmpty,
      s"updateKeyedWhereDelta($clean): a seq stamp was passed but the " +
        "table is not sequence-resolved — declare the seq column at " +
        "the first delta append, or drop the stamp")
    assignments.foreach { case (c, _) =>
      require(!m.keyCols.contains(c),
        s"updateKeyedWhereDelta cannot reassign key column '$c'")
      // a typo'd assignment would otherwise report matches while
      // changing nothing (r13 ADVICE)
      require(c != "kb" && (m.schemaDdl.isEmpty ||
        parseDdl(m.schemaDdl).fieldNames.contains(c)),
        s"updateKeyedWhereDelta: '$c' is not a column of $clean")
    }
    // every row of the pruned read MATCHES cond, so assignments apply
    // unconditionally; a seq stamp overwrites the row's seq column
    val hit = readKeyedWhere(spark, clean, cond,
      version = Some(m.version)).drop("kb")
    val stamped = (seq, Option(m.seqCol).filter(_.nonEmpty)) match {
      case (Some(sv), Some(sc)) => assignments.toMap + (sc -> sv)
      case _ => assignments.toMap
    }
    val updated = hit.select(hit.columns.toSeq.map { c =>
      stamped.get(c).map(_.as(c)).getOrElse(F.col(c))
    }: _*).localCheckpoint()
    val matched = updated.count()
    if (matched > 0L)
      appendDeltaKeyedCols(spark, clean, updated, m.keyCols, m.nBuckets)
    matched
  }

  private def dmlKeyedWhere(spark: SparkSession, dir: String,
                            cond: Column,
                            assignments: Option[Seq[(String, Column)]])
      : Long = {
    val clean = cleanDir(dir)
    withCommitRetry(s"dmlKeyedWhere($dir)") {
      val m = readManifest(spark, dir)
      require(m.nBuckets > 0, s"$clean has no keyed metadata")
      require(m.resolve != "agg",
        s"$clean is an agg state — DML runs against its BASE table")
      // same batch-wins rule as upsert/delete: a seq-resolved table
      // changes only through stamped appends
      require(m.seqCol.isEmpty,
        s"$clean resolves by sequence column '${m.seqCol}' — " +
          "predicate DML is batch-wins; append stamped deltas instead")
      assignments.foreach(_.foreach { case (c, _) =>
        require(!m.keyCols.contains(c),
          s"updateKeyedWhere cannot reassign key column '$c' (the row " +
            "would change buckets) — delete + re-insert instead")
        // a typo'd assignment name would otherwise report a nonzero
        // matched count while changing nothing (r13 ADVICE)
        require(c != "kb" && (m.schemaDdl.isEmpty ||
          parseDdl(m.schemaDdl).fieldNames.contains(c)),
          s"updateKeyedWhere: '$c' is not a column of $clean " +
            s"(have ${if (m.schemaDdl.isEmpty) "?"
              else parseDdl(m.schemaDdl).fieldNames.mkString(",")})")
      })
      // a NONDETERMINISTIC predicate would match different rows when a
      // lost commit race re-runs the body — refuse up front (analyzed
      // against the empty snapshot: zero IO, resolved attributes).
      // current_timestamp()/current_date()/now() are Catalyst-
      // "deterministic" but re-stamp per query execution, so the probe
      // job and the rewrite job could disagree within ONE statement —
      // refused explicitly (r13 ADVICE).
      val det = scala.util.Try {
        import org.apache.spark.sql.catalyst.{expressions => E}
        val exprs = emptySnapshot(spark, clean, m).filter(cond)
          .queryExecution.analyzed.expressions
        exprs.forall(_.deterministic) && !exprs.exists(_.exists {
          case _: E.CurrentTimestamp | _: E.CurrentDate | _: E.Now |
               _: E.LocalTimestamp => true
          case _ => false
        })
      }.getOrElse(true) // unanalyzable -> the filter below fails loudly
      require(det, "DML predicate must be deterministic " +
        "(current_timestamp/current_date re-stamp per execution — " +
        "resolve them to literals first)")
      // matching rows AT THIS manifest version, bucket-pruned by the
      // predicate's structure; ONE metadata job finds the buckets that
      // actually hold matches (bounded by the leaf count)
      val hit = readKeyedWhere(spark, clean, cond,
        version = Some(m.version))
      val probe = hit.agg(F.count(F.lit(1)),
        F.collect_set(F.col("kb"))).head
      val matched = probe.getLong(0)
      val touched = probe.getSeq[Int](1).sorted
      if (matched > 0L) {
        val resolved = resolveBuckets(spark, clean, m, touched, None)
        // cond is NULL-safe SQL semantics: NULL matches nothing, so a
        // delete KEEPS NULL-cond rows and an update leaves them alone
        val matches = F.coalesce(cond, F.lit(false))
        val out = assignments match {
          case None => resolved.filter(!matches)
          case Some(as) =>
            val amap = as.toMap
            resolved.select(resolved.columns.toSeq.map { c =>
              amap.get(c) match {
                case Some(e) => F.when(matches, e).otherwise(F.col(c)).as(c)
                case None => F.col(c)
              }
            }: _*)
        }
        commitKeyed(spark, stageMerge(spark, clean, out, touched, m))
      }
      matched
    }
  }

  /** One CDC micro-batch, merged ATOMICALLY (one manifest commit) with
    * the cross-batch last-wins guard INSIDE the optimistic-commit
    * retry — a losing race recomputes the guard against the winner's
    * snapshot, so concurrent writers can't resurrect a stale sequence
    * (the pre-r9 shape read the guard once outside the retry).
    * Semantics (same contract as streaming/Streams.upsertKeyedBatch,
    * which delegates here):
    *  - `seqCol`: last-wins per key within the batch AND against the
    *    stored row (`>=` keeps exact replays idempotent);
    *  - `deleteCol`: boolean tombstone — the key's winning row being a
    *    tombstone DELETES it; the column itself never lands.
    */
  def cdcMergeKeyed(spark: SparkSession, dir: String, batch: DataFrame,
                    keyCol: String, nBuckets: Int,
                    seqCol: Option[String] = None,
                    deleteCol: Option[String] = None): Unit =
    cdcMergeKeyedCols(spark, dir, batch, Seq(keyCol), nBuckets, seqCol,
      deleteCol)

  /** Composite-key CDC merge — same contract, keyed on the tuple. */
  def cdcMergeKeyedCols(spark: SparkSession, dir: String, batch: DataFrame,
                        keyCols: Seq[String], nBuckets: Int,
                        seqCol: Option[String] = None,
                        deleteCol: Option[String] = None): Unit = {
    val reduced0 = seqCol match {
      case Some(sc) =>
        // per-key max-seq via the native argmax (no per-key sort, and
        // map-side partial reduction — the window had neither). The
        // ord wraps in a STRUCT so a key whose every row has a NULL
        // seq still keeps one arbitrary row, exactly like the
        // window's desc (nulls-last) ranking did.
        batch.groupBy(keyCols.map(F.col): _*)
          .agg(graft.plans.TopRow.topRow(F.struct(F.col(sc)),
            F.struct(batch.columns.map(F.col): _*)).as("__win"))
          .select(F.col("__win.*"))
      case None => batch
    }
    val depths0 =
      if (manifestVersions(spark, dir).isEmpty) Map.empty[Int, Int]
      else readManifest(spark, dir).depths
    val reduced = reduced0.withColumn("kb",
        kb(keyCols, nBuckets, depths = depths0))
      .localCheckpoint()
    val touched = reduced.select("kb").distinct().collect()
      .map(_.getInt(0)).sorted.toSeq
    if (touched.isEmpty) return
    def split(last: DataFrame): (DataFrame, Option[DataFrame]) =
      deleteCol match {
        case Some(dc) =>
          (last.filter(!F.coalesce(F.col(dc), F.lit(false))).drop(dc),
            Some(last.filter(F.coalesce(F.col(dc), F.lit(false)))
              .select(keyCols.map(F.col): _*)))
        case None => (last, None)
      }
    if (manifestVersions(spark, dir).isEmpty) {
      // bootstrap: no stored rows to guard against; tombstones in the
      // very first batch simply don't insert
      val (ups, _) = split(reduced)
      writeKeyed(ups.drop("kb"), dir, keyCols, nBuckets)
      return
    }
    withCommitRetry(s"cdcMergeKeyed($dir)") {
      val m = readManifest(spark, dir)
      require(m.depths == depths0,
        s"keyed table $dir re-bucketed mid-merge (splitKeyed) — " +
          "re-run the merge")
      val base = readTouched(spark, dir, m, touched, reduced,
        keyCols, nBuckets)
      // cross-batch last-wins: a late batch carrying an older sequence
      // for a stored key (out-of-order source, or a replay interleaved
      // with newer batches) must not regress the row — compare against
      // the SAME snapshot this attempt will merge into
      val last = seqCol match {
        case Some(sc) if base.columns.contains(sc) =>
          reduced.join(
            base.select((keyCols.map(F.col) :+
              F.col(sc).as("__curseq")): _*),
            keyCols, "left")
            .filter(F.col("__curseq").isNull ||
              F.col(sc) >= F.col("__curseq"))
            .drop("__curseq")
        case _ => reduced
      }
      val (ups, dels) = split(last)
      val gone = dels.fold(ups.select(keyCols.map(F.col): _*))(d =>
        ups.select(keyCols.map(F.col): _*).unionByName(d)).distinct()
      val merged = base.join(gone, keyCols, "left_anti")
        .unionByName(ups, allowMissingColumns = true)
      commitKeyed(spark, stageMerge(spark, dir, merged, touched, m))
    }
  }

  /** The pruned base read: exactly the touched buckets' live rows,
    * with any delta chains RESOLVED (so a full merge of a bucket folds
    * its merge-on-read deltas into the staged generation — stageMerge
    * then drops them from the manifest). When none of the touched
    * buckets exists yet (pure-insert batch into new buckets), an empty
    * frame in the STORED column order (from any live bucket, or the
    * batch itself on an emptied table) keeps the merge's union aligned.
    */
  private def readTouched(spark: SparkSession, dir: String,
                          m: KeyedManifest, touched: Seq[Int],
                          batch: DataFrame,
                          keyCols: Seq[String], nBuckets: Int): DataFrame = {
    val clean = cleanDir(dir)
    val keyCol = keyCols.mkString(",")
    // a mismatched bucket count or key would hash the batch into the
    // WRONG buckets and silently merge against the wrong base slices
    require(m.nBuckets == 0 || (m.nBuckets == nBuckets && m.keyCol == keyCol),
      s"keyed table $clean is (${m.keyCol}, ${m.nBuckets}) buckets; " +
        s"caller passed ($keyCol, $nBuckets)")
    // a SEQUENCE-resolved table's winner is max-seq, not batch-wins:
    // the copy-on-write merge/delete paths would silently overwrite
    // newer stored rows with older batch rows — those tables change
    // only through appendDeltaKeyed (stamped) + compactKeyed
    require(m.seqCol.isEmpty,
      s"$clean resolves by sequence column '${m.seqCol}' — upsert/" +
        "delete/CoW-merge are batch-wins and would break it; append " +
        "stamped deltas instead (appendDeltaKeyed) and compact")
    val live = touched.filter(b =>
      m.buckets.contains(b) || m.deltas.get(b).exists(_.nonEmpty))
    if (live.nonEmpty)
      resolveBuckets(spark, clean, m, live, None)
    else if (m.buckets.nonEmpty)
      spark.read.parquet(s"$clean/${m.buckets.head._2}").limit(0)
    else if (m.schemaDdl.nonEmpty)
      emptySnapshot(spark, clean, m) // emptied table keeps its schema
    else batch.limit(0)
  }

  /** MERGE-ON-READ upsert: append the batch as per-bucket DELTA dirs
    * and publish a manifest whose delta chains grew — the base
    * generations are NEVER read or rewritten, so bytes written are
    * ∝ THE BATCH, not the touched buckets (the copy-on-write
    * `upsertKeyed` pays O(bucket) per batch, which a high-frequency
    * CDC stream into 10 GB buckets cannot afford). Readers resolve
    * base ⊕ deltas last-wins per key (`resolveBuckets`); read cost
    * grows with chain length until `compactKeyed` folds the chains
    * back into base generations. `tombstoneKeys` rows delete their
    * keys at resolution (the classic merge-on-read delete vector).
    *
    * Contracts: keys must be UNIQUE within one call (duplicate keys at
    * the same precedence level have no resolution order — reduce CDC
    * batches by sequence first, as `cdcMergeKeyed` does); cross-batch
    * ordering is DELTA ORDER (append order), so out-of-order sequence
    * delivery needs the copy-on-write CDC path's stored-seq guard.
    * The staged delta dirs don't depend on the base snapshot, so a
    * losing commit race just re-publishes against the fresh manifest —
    * no recompute, no restage.
    */
  def appendDeltaKeyed(spark: SparkSession, dir: String, updates: DataFrame,
                       keyCol: String, nBuckets: Int,
                       tombstoneKeys: Option[DataFrame] = None): Unit =
    appendDeltaKeyedCols(spark, dir, updates, Seq(keyCol), nBuckets,
      tombstoneKeys)

  /** Composite-key merge-on-read append — same contract, keyed on the
    * tuple (`tombstoneKeys` carries the key columns by name).
    */
  def appendDeltaKeyedCols(spark: SparkSession, dir: String,
                           updates: DataFrame,
                           keyCols: Seq[String], nBuckets: Int,
                           tombstoneKeys: Option[DataFrame] = None,
                           txn: Map[String, Long] = Map.empty,
                           seqCol: Option[String] = None): Unit = {
    val clean = cleanDir(dir)
    val keyCol = keyCols.mkString(",")
    val m0 = readManifest(spark, dir)
    // the SEQUENCE column (out-of-order CDC): once registered,
    // resolution is max-seq-wins table-wide. It can be declared only
    // while no delta chain exists yet (flipping the comparator under
    // existing chains would reorder history); thereafter callers may
    // omit it (the manifest remembers) but may not contradict it.
    val seqEff = seqCol.map(_.trim).filter(_.nonEmpty)
    seqEff.foreach { sc =>
      require(m0.seqCol.isEmpty || m0.seqCol == sc,
        s"$clean resolves by sequence column '${m0.seqCol}'; the append " +
          s"passed '$sc'")
      require(m0.seqCol == sc || m0.deltas.values.forall(_.isEmpty),
        s"$clean already carries chain-ordered delta history — a " +
          "sequence column must be declared before the first delta " +
          "append (compact first, then re-declare)")
      require(updates.columns.contains(sc),
        s"appendDeltaKeyed($clean): updates carry no '$sc' column")
    }
    val seqActive = seqEff.orElse(Option(m0.seqCol).filter(_.nonEmpty))
    val ups = updates.withColumn("__tomb", F.lit(false))
    val all = tombstoneKeys.fold(ups) { tk =>
      // in seq mode a tombstone must carry ITS OWN sequence number —
      // an unstamped delete would sort nulls-last and lose to every
      // stored row instead of deleting as of its time
      seqActive.foreach(sc => require(tk.columns.contains(sc),
        s"appendDeltaKeyed($clean): tombstones must carry the " +
          s"sequence column '$sc' (nulls would never win resolution)"))
      val sel = seqActive match {
        case Some(sc) => tk.select((keyCols :+ sc).map(F.col): _*)
        case None =>
          if (keyCols.length == 1)
            tk.select(F.col(tk.columns.head).as(keyCols.head))
          else tk.select(keyCols.map(F.col): _*)
      }
      ups.unionByName(sel.withColumn("__tomb", F.lit(true)),
        allowMissingColumns = true)
    }
    require(m0.nBuckets == 0 ||
      (m0.nBuckets == nBuckets && m0.keyCol == keyCol),
      s"keyed table $clean is (${m0.keyCol}, ${m0.nBuckets}) buckets; " +
        s"caller passed ($keyCol, $nBuckets)")
    val withKb = all.withColumn("kb",
      kb(keyCols, nBuckets, depths = m0.depths))
    // Stage FIRST — the batch evaluates exactly ONCE, into the staged
    // files (pre-r14 this was localCheckpoint + a probe aggregate +
    // the staging job: two extra passes over every delta batch). The
    // touched-bucket set falls out of the staged dir names, and the
    // unique-keys-per-call guard runs over the staged rows themselves
    // (frozen on disk, so even a nondeterministic batch is checked
    // against exactly what will commit). Duplicate keys at the same
    // precedence level would have no resolution order, so the window's
    // winner would be NONDETERMINISTIC; fail loudly before publishing
    // (failed stagings are unreferenced and vacuum away like any
    // losing commit attempt — deleted eagerly below anyway).
    val (staged, stagedRows, stagedStats) = stageBuckets(spark, clean,
      withKb, m0.version + 1, keyCols, m0.statsCols, prefix = 'd',
      nBuckets = nBuckets)
    val touched = staged.keys.toSeq.sorted
    if (touched.isEmpty) return
    val guard = spark.read
      .parquet(staged.values.toSeq.sorted.map(d => s"$clean/$d"): _*)
      .agg(F.count(F.lit(1)).as("n"),
        F.count_distinct(F.col(keyCols.head),
          keyCols.tail.map(F.col): _*).as("nk")).head
    if (guard.getLong(0) != guard.getLong(1)) {
      val fs = hadoopFs(spark, new Path(clean))
      staged.values.foreach(d => fs.delete(new Path(clean, d), true))
      throw new IllegalArgumentException(
        s"appendDeltaKeyed($clean): ${guard.getLong(0) - guard.getLong(1)} " +
          "duplicate keys within one call — a delta level has no " +
          "intra-level resolution order; reduce the batch per key first " +
          "(cdcMergeKeyed does this by sequence)")
    }
    withCommitRetry(s"appendDeltaKeyed($dir)") {
      val m = readManifest(spark, dir)
      // re-validate against the FRESH manifest: a concurrent
      // re-bootstrap may have changed the bucket layout since m0, and
      // publishing deltas hashed under the OLD layout would park keys
      // in buckets they no longer hash to (silently unreachable rows)
      require((m.nBuckets == 0 ||
        (m.nBuckets == nBuckets && m.keyCol == keyCol)) &&
        m.depths == m0.depths,
        s"keyed table $clean re-bootstrapped/re-bucketed to " +
          s"(${m.keyCol}, ${m.nBuckets}) buckets mid-append; caller " +
          s"staged for ($keyCol, $nBuckets) — re-run the append")
      val nextDeltas = m.deltas ++ staged.map { case (b, d) =>
        b -> (m.deltas.getOrElse(b, Seq.empty) :+ d)
      }
      val schema =
        if (m.schemaDdl.isEmpty) withKb.drop("__tomb").schema.toDDL
        else unionSchema(
          parseDdl(m.schemaDdl),
          withKb.drop("__tomb").schema).toDDL
      writeManifest(spark, clean, KeyedManifest(m.version + 1, m.buckets,
        m.keyCol, m.nBuckets, schema, nextDeltas, m.rows ++ stagedRows,
        statsCols = m.statsCols, colStats = m.colStats ++ stagedStats,
        resolve = m.resolve, txn = m.txn ++ txn,
        aggP = m.aggP, aggK = m.aggK, depths = m.depths,
        aggSU = m.aggSU,
        seqCol = seqEff.orElse(Option(m.seqCol).filter(_.nonEmpty))
          .getOrElse("")))
    }
  }

  /** Fold merge-on-read delta chains back into base generations: the
    * resolved rows of each target bucket stage as a new generation and
    * ONE manifest commit drops the chains — exactly a full merge whose
    * batch is empty, through the same snapshot-isolated commit path.
    * Defaults to every bucket carrying deltas; pass `buckets` to
    * compact incrementally (e.g. only chains past a length threshold,
    * read straight off the manifest).
    */
  def compactKeyed(spark: SparkSession, dir: String,
                   buckets: Option[Seq[Int]] = None,
                   minChain: Int = 1): Unit = {
    require(minChain >= 1, s"minChain must be >= 1, got $minChain")
    val clean = cleanDir(dir)
    if (manifestVersions(spark, dir).isEmpty) return
    withCommitRetry(s"compactKeyed($dir)") {
      val m = readManifest(spark, dir)
      // `minChain` is the maintenance policy knob: compact only the
      // buckets whose chain reached the threshold — planned entirely
      // from the MANIFEST (zero data IO), so a scheduler can call this
      // every few batches and it no-ops until chains build up
      val target = buckets.getOrElse(m.deltas.keys.toSeq)
        .filter(b => m.deltas.get(b).exists(_.length >= minChain)).sorted
      if (target.nonEmpty)
        commitKeyed(spark, stageMerge(spark, clean,
          resolveBuckets(spark, clean, m, target, None), target, m))
    }
  }

  /** SPLIT PLANNING from the manifest (zero data IO): the current
    * leaf buckets whose LIVE BYTES exceed `targetBytes`, worst first —
    * exactly the feed a maintenance scheduler hands `splitKeyed` on a
    * cadence (the split twin of `compactKeyed(minChain)`'s policy
    * knob). Bytes come from an fs listing of each leaf's dirs
    * (bounded metadata work, ≤ live dirs), never a scan; a leaf's
    * delta-chain bytes count toward it (the chain resolves into the
    * children at split time).
    */
  def splitCandidates(spark: SparkSession, dir: String,
                      targetBytes: Long): Seq[(Int, Long)] = {
    require(targetBytes > 0, s"targetBytes must be > 0")
    val clean = cleanDir(dir)
    val m = readManifest(spark, dir)
    require(m.nBuckets > 0, s"$clean has no keyed metadata")
    val fs = hadoopFs(spark, new Path(clean))
    (m.buckets.keySet ++ m.deltas.keySet).toSeq.sorted.map { b =>
      val dirs = m.buckets.get(b).toSeq ++ m.deltas.getOrElse(b, Nil)
      b -> dirs.map(d =>
        fs.getContentSummary(new Path(clean, d)).getLength).sum
    }.filter(_._2 > targetBytes).sortBy(-_._2)
  }

  /** MERGE PLANNING (the contraction twin of `splitCandidates`, zero
    * data IO): the sibling leaf PAIRS whose combined live bytes fell
    * below `targetBytes / 2` — after deletes/retention, a skew that
    * once forced a split has drained and the two half-empty leaves
    * should fold back into their parent. Returns (parent id, combined
    * bytes), EMPTIEST first (the cheapest rewrites reclaim the most
    * leaf-count pressure per byte). The half-target threshold is the
    * split/merge HYSTERESIS: a freshly-split leaf's children combine
    * to the bytes that exceeded `targetBytes`, so they can never
    * bounce straight back, and a merged parent (< targetBytes/2) can
    * never immediately re-split.
    */
  def mergeCandidates(spark: SparkSession, dir: String,
                      targetBytes: Long): Seq[(Int, Long)] = {
    require(targetBytes > 0, s"targetBytes must be > 0")
    val clean = cleanDir(dir)
    val m = readManifest(spark, dir)
    require(m.nBuckets > 0, s"$clean has no keyed metadata")
    val n = m.nBuckets
    val fs = hadoopFs(spark, new Path(clean))
    def bytes(b: Int): Long =
      (m.buckets.get(b).toSeq ++ m.deltas.getOrElse(b, Nil))
        .map(d => fs.getContentSummary(new Path(clean, d)).getLength).sum
    m.depths.toSeq
      // the LOW sibling names the pair (parent id = its own id); the
      // high sibling must be a leaf at the SAME depth (one side split
      // deeper blocks the merge until its subtree folds first)
      .filter { case (b, d) => d >= 1 && b < (n << (d - 1)) &&
        m.depths.getOrElse(b + (n << (d - 1)), 0) == d }
      .map { case (p, d) => p -> (bytes(p) + bytes(p + (n << (d - 1)))) }
      .filter(_._2 < targetBytes / 2)
      .sortBy(_._2)
  }

  /** EXTENDIBLE-HASHING CONTRACTION — the inverse of `splitKeyed`:
    * fold each listed PARENT's two sibling leaves (parent p at depth
    * d−1 re-absorbs leaves p and p + N·2^(d−1), both at depth d) back
    * into one leaf. Same shape as the split: only the merged leaves'
    * rows are read and restaged (their delta chains fold in the
    * process, by the table's own resolve discipline), and ONE manifest
    * commit publishes the new generation AND the shrunk depth map
    * atomically — a mid-merge reader sees the old or the new COMPLETE
    * layout. Writers racing the merge fail loudly on the same
    * depth-map guard as splits and re-run against the new layout.
    * Without this, leaf count marches monotonically toward the
    * 100000-leaf cap and small-file pressure grows after every
    * retention sweep.
    */
  def mergeLeaves(spark: SparkSession, dir: String,
                  parents: Seq[Int]): Unit = {
    require(parents.nonEmpty, "mergeLeaves: no parents to merge")
    val clean = cleanDir(dir)
    withCommitRetry(s"mergeLeaves($dir)") {
      val m = readManifest(spark, dir)
      require(m.nBuckets > 0, s"$clean has no keyed metadata")
      val n = m.nBuckets
      val pairs = parents.distinct.sorted.map { p =>
        val d = m.depths.getOrElse(p, 0)
        require(d >= 1,
          s"mergeLeaves($clean): $p is not a split leaf (depth 0)")
        require(p < (n << (d - 1)),
          s"mergeLeaves($clean): $p is a HIGH sibling — pass the " +
            s"parent id ${p - (n << (d - 1))}")
        val sib = p + (n << (d - 1))
        require(m.depths.getOrElse(sib, 0) == d,
          s"mergeLeaves($clean): $p's sibling $sib is not a leaf at " +
            s"depth $d (depths: ${m.depths}) — fold its subtree first")
        (p, sib, d)
      }
      val newDepths = pairs.foldLeft(m.depths) { case (ds, (p, sib, d)) =>
        // depth 0 is the ABSENT default for ids < nBuckets — a parent
        // landing back at depth 0 leaves the map entirely
        val cleared = ds - p - sib
        if (d - 1 == 0) cleared else cleared + (p -> (d - 1))
      }
      val children = pairs.flatMap { case (p, sib, _) => Seq(p, sib) }
      val live = children.filter(b => m.buckets.contains(b) ||
        m.deltas.get(b).exists(_.nonEmpty))
      if (live.isEmpty) {
        // depth-only commit: the merged leaves held no rows
        writeManifest(spark, clean, KeyedManifest(m.version + 1,
          m.buckets, m.keyCol, m.nBuckets, m.schemaDdl, m.deltas, m.rows,
          statsCols = m.statsCols, colStats = m.colStats,
          resolve = m.resolve, txn = m.txn,
          aggP = m.aggP, aggK = m.aggK, depths = newDepths,
          aggSU = m.aggSU, seqCol = m.seqCol))
      } else {
        // resolve by the table's own discipline (chains fold here,
        // exactly like their compaction), rehash under the SHRUNK map
        // — every row lands in its pair's parent leaf
        val rows =
          if (m.resolve == "agg")
            readAggStateBuckets(spark, clean, m, live)
          else resolveBuckets(spark, clean, m, live, None).drop("kb")
        val rehashed = rows.withColumn("kb",
          kb(m.keyCols, n, depths = newDepths))
        val pending = stageMerge(spark, dir, rehashed, children, m)
        commitKeyed(spark,
          pending.copy(manifest = pending.manifest.copy(depths = newDepths)))
      }
    }
  }

  /** ONE maintenance pass — the policy loop over `splitCandidates` +
    * chain compaction + `mergeCandidates` that a scheduler calls on a
    * cadence instead of hand-planning layout surgery: split every leaf
    * whose live bytes exceed `targetBytes`, worst first, until
    * `budgetBytes` of rewrite is spent (a split rewrites roughly the
    * leaf's bytes); fold any delta chains that reached `minChain`
    * (dispatching on the table's resolve discipline); then MERGE
    * drained sibling pairs back (combined bytes < targetBytes/2),
    * emptiest first within `mergeBudgetBytes`, cascading up the depth
    * tree until it converges — the contraction half without which leaf
    * count only ever grows. All three phases plan from the MANIFEST
    * and rewrite only their target buckets, so a pass over a healthy
    * table is metadata-only — call it after every few batches and it
    * no-ops until something actually outgrows (or outshrinks) the
    * policy. Returns the split bucket ids (empty = the split phase
    * converged); merges show in the manifest's depth map.
    */
  def maintainKeyed(spark: SparkSession, dir: String, targetBytes: Long,
                    budgetBytes: Long = Long.MaxValue,
                    minChain: Int = 2,
                    mergeBudgetBytes: Long = Long.MaxValue): Seq[Int] = {
    require(budgetBytes > 0, "maintainKeyed: budgetBytes must be > 0")
    require(mergeBudgetBytes >= 0,
      "maintainKeyed: mergeBudgetBytes must be >= 0")
    val cands = splitCandidates(spark, dir, targetBytes)
    var budget = budgetBytes
    val picked = Seq.newBuilder[Int]
    cands.foreach { case (b, bytes) =>
      if (bytes <= budget) { picked += b; budget -= bytes }
    }
    val chosen = picked.result()
    if (chosen.nonEmpty) splitKeyed(spark, dir, chosen)
    // fold chains the split didn't already resolve (splitting a bucket
    // compacts its chain as a side effect)
    if (readManifest(spark, dir).resolve == "agg")
      compactAggStateKeyed(spark, dir, minChain = minChain)
    else compactKeyed(spark, dir, minChain = minChain)
    // contraction, cascading: a merged parent may itself pair with ITS
    // sibling one level up, so re-plan until nothing qualifies or the
    // budget runs out (terminates — each round strictly shrinks the
    // depth map). A merge rewrites roughly the pair's combined bytes.
    var mBudget = mergeBudgetBytes
    var more = mBudget > 0
    while (more) {
      val mc = mergeCandidates(spark, dir, targetBytes)
      val mPicked = Seq.newBuilder[Int]
      mc.foreach { case (p, bytes) =>
        if (bytes <= mBudget) { mPicked += p; mBudget -= bytes }
      }
      val mChosen = mPicked.result()
      if (mChosen.nonEmpty) mergeLeaves(spark, dir, mChosen)
      more = mChosen.nonEmpty && mBudget > 0
    }
    chosen
  }

  /** The resolved live rows of `buckets` under a PINNED manifest —
    * the bounded-initial-load CDC source's chunk read (each chunk
    * reads only its buckets' dirs of one consistent snapshot).
    */
  private[graft] def readKeyedBucketsAt(spark: SparkSession, dir: String,
                                        m: KeyedManifest,
                                        buckets: Seq[Int]): DataFrame = {
    val clean = cleanDir(dir)
    val live = buckets.filter(b => m.buckets.contains(b) ||
      m.deltas.get(b).exists(_.nonEmpty))
    if (live.isEmpty) emptySnapshot(spark, clean, m)
    else resolveBuckets(spark, clean, m, live, None)
  }

  /** Agg-state twin of readKeyedBucketsAt. */
  private[graft] def readAggStateBucketsAt(spark: SparkSession, dir: String,
                                           m: KeyedManifest,
                                           buckets: Seq[Int]): DataFrame = {
    val clean = cleanDir(dir)
    val live = buckets.filter(b => m.buckets.contains(b) ||
      m.deltas.get(b).exists(_.nonEmpty))
    if (live.isEmpty) emptySnapshot(spark, clean, m).drop("kb", "__tomb")
    else readAggStateBuckets(spark, clean, m, live)
  }

  /** ONLINE RE-BUCKETING (extendible-hashing bucket split, r11):
    * split each listed LEAF bucket into two children one hash bit
    * deeper — leaf b at depth d becomes b and b + N·2^d at depth d+1
    * (N = the table's base bucket count; both children keep
    * ≡ b mod N·2^d, so every other leaf's id and contents are
    * untouched). ONLY the split buckets' rows are read and restaged
    * (delta chains fold in the process, like a compaction of those
    * buckets); one manifest commit publishes the new generations AND
    * the new depth map atomically, so a mid-split reader sees the old
    * or the new COMPLETE layout — never a half-split bucket. This is
    * what makes `nBuckets` a day-one ESTIMATE instead of a forever
    * decision: at 100 TB, the handful of buckets that outgrew their
    * rewrite budget split in place for O(those buckets), not a full
    * re-bootstrap.
    *
    * Works for row tables AND bucketed agg states (the rewrite is
    * last-wins resolution or re-aggregation respectively — the same
    * discipline their compactions use). Writers racing a split fail
    * loudly on the depth-map guard and re-run against the new layout.
    */
  def splitKeyed(spark: SparkSession, dir: String,
                 buckets: Seq[Int]): Unit = {
    require(buckets.nonEmpty, "splitKeyed: no buckets to split")
    val clean = cleanDir(dir)
    withCommitRetry(s"splitKeyed($dir)") {
      val m = readManifest(spark, dir)
      require(m.nBuckets > 0, s"$clean has no keyed metadata")
      val n = m.nBuckets
      def leafDepth(b: Int): Int =
        m.depths.getOrElse(b, if (b >= 0 && b < n) 0 else -1)
      val targets = buckets.distinct.sorted
      targets.foreach(b => require(leafDepth(b) >= 0,
        s"splitKeyed($clean): $b is not a current leaf bucket " +
          s"(depths: ${m.depths}, nBuckets: $n)"))
      val newDepths = m.depths ++ targets.flatMap { b =>
        val d = leafDepth(b)
        Seq(b -> (d + 1), (b + (n << d)) -> (d + 1))
      }
      // two hard caps, both layout invariants: bucket dir names carry
      // 5-digit ids (the vacuum/bootstrap patterns match exactly
      // those), and the plan-literal fine-to-leaf array must stay
      // small enough to inline
      val dmax = newDepths.values.max
      require((n.toLong << dmax) <= 100000,
        s"splitKeyed($clean): depth $dmax over $n base buckets exceeds " +
          "the 100000-leaf layout cap")
      val live = targets.filter(b => m.buckets.contains(b) ||
        m.deltas.get(b).exists(_.nonEmpty))
      if (live.isEmpty) {
        // depth-only commit: the split buckets held no rows
        writeManifest(spark, clean, KeyedManifest(m.version + 1,
          m.buckets, m.keyCol, m.nBuckets, m.schemaDdl, m.deltas, m.rows,
          statsCols = m.statsCols, colStats = m.colStats,
          resolve = m.resolve, txn = m.txn,
          aggP = m.aggP, aggK = m.aggK, depths = newDepths,
          aggSU = m.aggSU, seqCol = m.seqCol))
      } else {
        // resolve the split buckets' rows by the table's own
        // discipline (chains fold here, exactly like their compaction)
        val rows =
          if (m.resolve == "agg")
            readAggStateBuckets(spark, clean, m, live)
          else resolveBuckets(spark, clean, m, live, None).drop("kb")
        val rehashed = rows.withColumn("kb",
          kb(m.keyCols, n, depths = newDepths))
        val pending = stageMerge(spark, dir, rehashed, targets, m)
        commitKeyed(spark,
          pending.copy(manifest = pending.manifest.copy(depths = newDepths)))
      }
    }
  }

  /** The live rows of the buckets a key frame hashes into — the
    * pruned read CDC consumers use to compare incoming sequence
    * numbers against stored ones (same bucket set the merge itself
    * will read).
    */
  def readKeyBuckets(spark: SparkSession, dir: String, keys: DataFrame,
                     keyCol: String, nBuckets: Int): DataFrame = {
    val keyCols = keyCol.split(",").toSeq
    val m = readManifest(spark, dir)
    val ks = keys.select(keyCols.map(F.col): _*)
      .withColumn("kb", kb(keyCols, nBuckets, depths = m.depths))
      .localCheckpoint()
    val touched = ks.select("kb").distinct().collect()
      .map(_.getInt(0)).sorted.toSeq
    readTouched(spark, dir, m, touched, ks, keyCols, nBuckets)
  }

  /** Point lookup on the keyed table: the rows whose key is in `keys`,
    * reading ONLY the bucket dirs those keys hash into — the read-side
    * twin of the merge's path pruning. The table's own manifest
    * metadata supplies keyCol and bucket count (never a caller guess),
    * so the cost is O(|keys| buckets' files), independent of table
    * size: this is what a 100 TB key-value probe should cost.
    *
    * Works for EVERY key type the table can store: the probe buckets
    * are computed by the ENGINE'S OWN `kb` expression over a tiny
    * local key frame (one job over |keys| rows — never a scan), so the
    * hash is bit-identical to the stored layout by construction —
    * timestamp/decimal/double keys included (the pre-r10 JVM-toString
    * shortcut had to reject those loudly). Composite-key tables take
    * each key as a Seq of the components in manifest order.
    * `version` pins the snapshot the probe answers from (time-travel
    * point reads, and the pinned-frame selection path) — latest when
    * None.
    */
  def lookupKeyed(spark: SparkSession, dir: String,
                  keys: Seq[Any], version: Option[Int] = None): DataFrame = {
    require(keys.nonEmpty, "lookupKeyed: no keys")
    val clean = cleanDir(dir)
    val m = readManifest(spark, dir, version)
    require(m.nBuckets > 0,
      s"$clean has no keyed metadata (pre-r8 table or versioned dataset)")
    val keyCols = m.keyCols
    // the key columns' types, from the recorded schema (every r9+
    // commit) or a live dir's parquet footer (pre-r9 tables)
    val schema: org.apache.spark.sql.types.StructType =
      if (m.schemaDdl.nonEmpty)
        parseDdl(m.schemaDdl)
      else {
        val anyDir = m.buckets.values.headOption
          .orElse(m.deltas.values.flatten.headOption)
        anyDir match {
          case Some(d) => spark.read.parquet(s"$clean/$d").schema
          case None => return readKeyed(spark, dir, version).limit(0)
        }
      }
    val keyFields = keyCols.map(c => schema.fields.find(_.name == c)
      .getOrElse(throw new IllegalArgumentException(
        s"lookupKeyed: key column '$c' missing from $clean's schema")))
    // normalize each key to a component tuple, coercing common JVM
    // widenings (an Int probe against a LongType key)
    val tuples = keys.map {
      case s: Seq[_] => s
      case p: Product if keyCols.length > 1 => p.productIterator.toSeq
      case k => Seq(k)
    }
    tuples.foreach(t => require(t.length == keyCols.length,
      s"lookupKeyed: table keys on (${keyCols.mkString(",")}); got a " +
        s"${t.length}-component key"))
    import org.apache.spark.sql.types._
    def coerce(v: Any, dt: DataType): Any = (v, dt) match {
      case (n: Number, LongType) => n.longValue
      case (n: Number, IntegerType) => n.intValue
      case (n: Number, ShortType) => n.shortValue
      case (n: Number, ByteType) => n.byteValue
      case (n: Number, DoubleType) => n.doubleValue
      case (n: Number, FloatType) => n.floatValue
      case (d: BigDecimal, _: DecimalType) => d.bigDecimal
      case _ => v
    }
    val rows = tuples.map(t => org.apache.spark.sql.Row(
      t.zip(keyFields).map { case (v, f) => coerce(v, f.dataType) }: _*))
    import scala.jdk.CollectionConverters._
    val probe = spark.createDataFrame(rows.asJava,
      StructType(keyFields.map(f => StructField(f.name, f.dataType))))
    val touched = probe
      .select(kb(keyCols, m.nBuckets, depths = m.depths).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
      .filter(b => m.buckets.contains(b) ||
        m.deltas.get(b).exists(_.nonEmpty)).sorted
    if (touched.isEmpty)
      readKeyed(spark, dir, version).limit(0)
    else {
      // native-typed IN-list (not a string cast) so the predicate
      // PUSHES into the parquet scan of EVERY chain level and the
      // within-bucket key sort lets row-group min/max stats skip most
      // of each bucket file; delta chains resolve AFTER the pushed
      // filter, over the probe keys' rows only (the key never changes
      // across chain levels, so a key filter is resolution-invariant)
      val filt =
        if (keyCols.length == 1)
          F.col(keyCols.head).isin(
            tuples.map(t => coerce(t.head, keyFields.head.dataType)): _*)
        else tuples.map(t =>
          t.zip(keyFields).map { case (v, f) =>
            F.col(f.name) === F.lit(coerce(v, f.dataType))
          }.reduce(_ && _)).reduce(_ || _)
      resolveBuckets(spark, clean, m, touched, Some(filt))
    }
  }

  /** Changelog between two snapshots of the keyed table: one row per
    * key that was added / removed / changed between `fromV` and `toV`
    * (same-rows are omitted — this is a CDC feed, not a diff report).
    * The decisive property: the manifests tell which buckets changed
    * generation, so ONLY those buckets' dirs are read on either side —
    * the cost is O(changed data), never table size. A downstream
    * incremental consumer processes `keyedChanges(v_yesterday, v_now)`
    * instead of re-scanning 100 TB.
    */
  def keyedChanges(spark: SparkSession, dir: String,
                   fromV: Int, toV: Int): DataFrame = {
    val clean = cleanDir(dir)
    val m1 = readManifest(spark, dir, Some(fromV))
    val m2 = readManifest(spark, dir, Some(toV))
    // a materialized view's changelog is the VIEW diff with old_*
    // retractions (aggStateChanges) — never last-wins row comparison
    if (m2.resolve == "agg") return aggStateChanges(spark, dir, fromV, toV)
    require(m1.keyCol.nonEmpty, s"$clean has no keyed metadata")
    // a bucket changed if its base generation OR its delta chain moved
    val changed = (m1.buckets.keySet ++ m2.buckets.keySet ++
      m1.deltas.keySet ++ m2.deltas.keySet)
      .filter(b => m1.buckets.get(b) != m2.buckets.get(b) ||
        m1.deltas.getOrElse(b, Nil) != m2.deltas.getOrElse(b, Nil))
      .toSeq.sorted
    def side(m: KeyedManifest) = {
      val live = changed.filter(b => m.buckets.contains(b) ||
        m.deltas.get(b).exists(_.nonEmpty))
      if (live.nonEmpty) resolveBuckets(spark, clean, m, live, None)
      else readKeyed(spark, dir, Some(m.version)).limit(0)
    }
    // pre-r9 manifests record no snapshot schema, so the shared-column
    // set can't be known without reading — keep the two-resolution +
    // full-outer diff for them
    if (m1.schemaDdl.isEmpty || m2.schemaDdl.isEmpty)
      return diff(side(m1).drop("kb"), side(m2).drop("kb"), m1.keyCols)
        .filter(F.col("status") =!= "same")
    keyedChangesOnePass(spark, clean, m1, m2, changed)
  }

  /** The r15 changelog plan: ONE shuffle. Both versions' generation
    * levels for the changed buckets union into a single frame tagged
    * (side, precedence); ONE per-key aggregate computes each side's
    * winning row via the native argmax (`graft_top_row` — exactly
    * resolveBuckets' resolution order per side), and the status falls
    * out of the two winners. Replaces two window resolutions (each an
    * exchange + a per-key sort) + a full-outer self-join (two more
    * sorted exchanges) — and the aggregate reduces map-side, which the
    * windows never did. Dirs shared by both versions (an unchanged
    * base generation under a grown delta chain) are read once per
    * side, like the old plan read them once per resolution.
    */
  private def keyedChangesOnePass(spark: SparkSession, clean: String,
                                  m1: KeyedManifest, m2: KeyedManifest,
                                  changed: Seq[Int]): DataFrame = {
    val keyCols = m1.keyCols
    // columns both versions' snapshots carry (additive evolution may
    // have grown m2 past m1): only these are comparable — a column
    // new in m2 surfaces as NULL for m1-side rows exactly like the
    // old full-outer diff's missing-column semantics... which never
    // compared it at all (shared-column rule). kb is layout, not data.
    val sch1 = parseDdl(m1.schemaDdl).fieldNames.toSeq
    val sch2 = parseDdl(m2.schemaDdl).fieldNames.toSeq
    val shared = sch1.intersect(sch2)
      .filterNot(c => keyCols.contains(c) || c == "kb")
    def sideLevels(m: KeyedManifest, side: Int): Option[DataFrame] = {
      val live = changed.filter(b => m.buckets.contains(b) ||
        m.deltas.get(b).exists(_.nonEmpty))
      if (live.isEmpty) return None
      val maxChain = live.map(b => m.deltas.getOrElse(b, Nil).length).max
      val levels = (0 -> live.flatMap(m.buckets.get)) +:
        (1 to maxChain).map(i =>
          i -> live.flatMap(b => m.deltas.getOrElse(b, Nil).lift(i - 1)))
      val parts = levels.filter(_._2.nonEmpty).map { case (i, dirs) =>
        readGenDirs(spark, clean, m, dirs, withTomb = i >= 1)
          .withColumn("__prec", F.lit(i))
      }
      if (parts.isEmpty) None
      else Some(parts.reduce(_.unionByName(_, allowMissingColumns = true))
        .withColumn("__side", F.lit(side)))
    }
    val sides = Seq(sideLevels(m1, 0), sideLevels(m2, 1)).flatten
    if (sides.isEmpty)
      // nothing live on either side: the empty changelog, in the
      // changelog's schema
      return emptySnapshot(spark, clean, m2)
        .select(keyCols.map(F.col) :+ F.lit("same").as("status"): _*)
        .limit(0).filter(F.col("status") =!= "same")
    val un = sides.reduce(_.unionByName(_, allowMissingColumns = true))
    val hasTomb = un.columns.contains("__tomb")
    val ordBase =
      if (m2.seqCol.nonEmpty && un.columns.contains(m2.seqCol))
        F.struct(F.col(m2.seqCol), F.col("__prec"))
      else F.struct(F.col("__prec"))
    val valCols = (if (hasTomb) Seq("__tomb") else Nil) ++ shared
    val vstruct = F.struct(
      (F.lit(true).as("__won") +: valCols.map(F.col)): _*)
    def win(side: Int) = graft.plans.TopRow.topRow(
      F.when(F.col("__side") === side, ordBase), vstruct)
    val agged = un.groupBy(keyCols.map(F.col): _*)
      .agg(win(0).as("__a"), win(1).as("__b"))
    def aliveC(c: Column) = c.isNotNull &&
      (if (hasTomb) !F.coalesce(c.getField("__tomb"), F.lit(false))
       else F.lit(true))
    val aliveA = aliveC(F.col("__a"))
    val aliveB = aliveC(F.col("__b"))
    val sameCols =
      if (shared.isEmpty) F.lit(true)
      else shared.map(c =>
        F.col("__a").getField(c) <=> F.col("__b").getField(c))
        .reduce(_ && _)
    agged
      .filter(aliveA || aliveB)
      .select(keyCols.map(F.col) :+
        F.when(aliveA && !aliveB, F.lit("removed"))
          .when(!aliveA && aliveB, F.lit("added"))
          .when(sameCols, F.lit("same"))
          .otherwise(F.lit("changed")).as("status"): _*)
      .filter(F.col("status") =!= "same")
  }

  /** Garbage-collect snapshots: keep the newest `keepVersions`
    * manifests, delete older manifest files and every bucket dir no
    * kept manifest references — but ONLY when the dir is older than
    * `graceMs`. The grace window protects (a) readers still holding a
    * dropped snapshot and (b) a concurrent writer's freshly-staged
    * dirs whose manifest publish has not landed yet (without it, a
    * vacuum racing a commit would delete dirs the imminent manifest
    * references). Crashed-writer residue — orphaned `.tmp_*` manifest
    * files and `<table>.staging_*` sibling dirs — is reclaimed under
    * the same age rule.
    */
  def vacuumKeyed(spark: SparkSession, dir: String,
                  keepVersions: Int = 1,
                  graceMs: Long = 15 * 60 * 1000L,
                  force: Boolean = false): Unit =
    vacuumGenerations(spark, dir, keepVersions, graceMs,
      """[bd]\d{5}_g\d{9}(-.*)?""",
      cursorFloor =
        if (force) 0
        else Seq(registeredCursorMin(spark, dir),
          registeredGroupMin(spark, dir)).filter(_ > 0)
          .minOption.getOrElse(0))

  /** The REGISTERED CDC cursor file path for consumer `name` of the
    * keyed table at `dir`: `<dir>/_cursors/<name>`. A cursor living
    * here is visible to `vacuumKeyed`, which then refuses to drop the
    * manifest versions the consumer still needs (its recorded version
    * onward) unless forced — the retention/CDC coupling that keeps a
    * lagging consumer from failing on a vacuumed `from` snapshot.
    * Cursors elsewhere still work, but are unprotected.
    */
  def registeredCursorPath(dir: String, name: String): String = {
    require(name.nonEmpty && !name.contains("/"),
      s"cursor name must be a plain file name, got '$name'")
    s"${cleanDir(dir)}/_cursors/$name"
  }

  /** The smallest version any registered cursor still needs (0 = no
    * registered consumer, or none that constrains). A consumer at
    * cursor v next diffs (v, v+1..), so versions ≥ v must survive.
    */
  private def registeredCursorMin(spark: SparkSession, dir: String): Int = {
    val cd = new Path(cleanDir(dir), "_cursors")
    val fs = hadoopFs(spark, cd)
    if (!fs.exists(cd)) return 0
    fs.listStatus(cd).toSeq.filterNot(_.getPath.getName.contains(".tmp_"))
      .flatMap { st =>
        try {
          val in = fs.open(st.getPath)
          val s =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
            finally in.close()
          // "i:<v0>:<idx>" = a consumer mid-initial-load pinned at v0
          // (Streams.pollKeyedChangesBounded); plain int = version
          val v = if (s.startsWith("i:")) s.split(":")(1).toInt else s.toInt
          if (v > 0) Some(v) else None
        } catch { case _: Exception => None } // fresh/garbled: no floor
      }.minOption.getOrElse(0)
  }

  /** The COMMIT-GROUP pointer file registering `groupDir` as a
    * consumer of the member table at `memberDir`:
    * `<member>/_groups/<urlb64(groupDir)>`. Written by `commitGroup`
    * for every member it pins; `vacuumKeyed` then reads the LIVE group
    * manifests (never a cached number — manifest publishes are atomic,
    * pointer files just locate them) and retains every member version
    * any group version still pins, unless forced. This closes the r11
    * gap where a pinned version could be GC'd out from under
    * `readGroup` (which then failed loudly).
    */
  def registeredGroupPath(memberDir: String, groupDir: String): String =
    s"${cleanDir(memberDir)}/_groups/${java.util.Base64.getUrlEncoder
      .withoutPadding.encodeToString(
        cleanDir(groupDir).getBytes("UTF-8"))}"

  /** The smallest version of `dir` any registered commit group still
    * pins, across every group version (0 = none constrains). A deleted
    * group dir stops constraining; its stale pointer is ignored.
    */
  private def registeredGroupMin(spark: SparkSession, dir: String): Int = {
    val gd = new Path(cleanDir(dir), "_groups")
    val fs = hadoopFs(spark, gd)
    if (!fs.exists(gd)) return 0
    val member = cleanDir(dir)
    fs.listStatus(gd).toSeq.filterNot(_.getPath.getName.contains(".tmp_"))
      .flatMap { st =>
        try {
          val groupDir = new String(java.util.Base64.getUrlDecoder
            .decode(st.getPath.getName), "UTF-8")
          manifestVersions(spark, groupDir).flatMap(v =>
            readManifest(spark, groupDir, Some(v)).txn.get(member)
              .map(_.toInt))
        } catch { case _: Exception => Nil } // dead group: no floor
      }.filter(_ > 0).minOption.getOrElse(0)
  }

  private def vacuumGenerations(spark: SparkSession, dir: String,
                                keepVersions: Int, graceMs: Long,
                                genPattern: String,
                                cursorFloor: Int = 0): Unit = {
    require(keepVersions >= 1, s"keepVersions must be >= 1")
    val clean = cleanDir(dir)
    val p = new Path(clean)
    val fs = hadoopFs(spark, p)
    val cutoff = System.currentTimeMillis() - graceMs
    val versions = manifestVersions(spark, dir)
    val (drop0, keep) = versions.splitAt(math.max(0, versions.size - keepVersions))
    // retention/CDC coupling: a registered consumer's cursor pins its
    // version and everything after — those manifests (and, through
    // `referenced` below, their data) survive any keepVersions policy
    // unless the caller FORCES the drop (then the consumer fails
    // loudly on its next poll, the pre-r11 behavior)
    val drop = if (cursorFloor > 0) drop0.filter(_ < cursorFloor) else drop0
    // dropped manifest FILES get the same grace as generation dirs: a
    // time traveler that listed versions just before the vacuum can
    // still resolve its snapshot while the grace holds. Deletion
    // happens FIRST so `referenced` can then protect the data dirs of
    // every manifest that survives this pass (kept OR grace-retained) —
    // a graced old manifest must never outlive its own data.
    drop.foreach { v =>
      val mf = new Path(manifestDir(clean), f"v$v%09d.json")
      if (fs.exists(mf) && fs.getFileStatus(mf).getModificationTime < cutoff)
        fs.delete(mf, false)
    }
    val referenced = manifestVersions(spark, dir)
      .map(v => readManifest(spark, dir, Some(v)))
      .flatMap(m => m.buckets.values ++ m.deltas.values.flatten).toSet
    fs.listStatus(p).toSeq
      .filter(s => s.getPath.getName.matches(genPattern) &&
        !referenced.contains(s.getPath.getName) &&
        s.getModificationTime < cutoff)
      .foreach(s => fs.delete(s.getPath, true))
    // pointer hygiene: a `_groups` pointer whose decoded group dir no
    // longer has any committed manifest is DEAD — it stopped
    // constraining already (registeredGroupMin ignores it), but the
    // file would otherwise accumulate forever and cost a listing +
    // failed read per vacuum pass. Swept under the same age rule as
    // everything else (a freshly-registered group whose first commit
    // is in flight must survive).
    val gd = new Path(clean, "_groups")
    if (fs.exists(gd))
      fs.listStatus(gd).toSeq
        .filter(s => !s.getPath.getName.contains(".tmp_") &&
          s.getModificationTime < cutoff)
        .filter { s =>
          // the catch is scoped to the DECODE step only (undecodable
          // name: dead by construction). A transient IO error while
          // LISTING a live group's manifests must NOT classify the
          // pointer as dead — deleting it would let a later vacuum
          // drop versions the group still pins (r13 ADVICE). Keep the
          // pointer this pass; a later clean listing sweeps it.
          val groupDir =
            try Some(new String(java.util.Base64.getUrlDecoder
              .decode(s.getPath.getName), "UTF-8"))
            catch { case _: IllegalArgumentException => None }
          groupDir match {
            case None => true // undecodable: dead
            case Some(g) =>
              try manifestVersions(spark, g).isEmpty
              catch { case _: Exception => false } // IO error: keep
          }
        }
        .foreach(s => fs.delete(s.getPath, false))
    // crashed-writer residue: manifest temps + staging siblings
    val md = manifestDir(clean)
    if (fs.exists(md))
      fs.listStatus(md).toSeq
        .filter(s => s.getPath.getName.startsWith(".tmp_") &&
          s.getModificationTime < cutoff)
        .foreach(s => fs.delete(s.getPath, false))
    val parent = p.getParent
    if (parent != null && fs.exists(parent))
      fs.listStatus(parent).toSeq
        .filter(s => s.getPath.getName.startsWith(p.getName + ".staging_") &&
          s.getModificationTime < cutoff)
        .foreach(s => fs.delete(s.getPath, true))
  }

  /** Layout report over any frame carrying a partition/bucket column:
    * rows and file count per value — the "is my table healthy" probe
    * that decides when to compact (files per value creeping up) or
    * re-bucket (row skew). One aggregated scan; the file name is
    * projected before the aggregate (Spark 4 rejects nondeterministic
    * expressions inside aggregate arguments).
    */
  def tableStats(df: DataFrame, partCol: String): DataFrame =
    df.select(F.col(partCol), F.input_file_name().as("__f"))
      .groupBy(F.col(partCol))
      .agg(F.count(F.lit(1)).as("n_rows"),
        F.countDistinct(F.col("__f")).as("n_files"))

  /** tableStats over a raw partitioned dataset directory. */
  def tableStats(spark: SparkSession, dir: String,
                 partCol: String): DataFrame =
    tableStats(spark.read.parquet(dir), partCol)

  /** tableStats over a keyed table's LIVE snapshot (manifest-resolved;
    * stale generations don't pollute the report). Buckets whose row
    * counts the manifest records (every r9+ commit) and that carry no
    * delta chain answer from the MANIFEST + a file listing — zero data
    * IO; only delta-carrying or legacy buckets fall back to the
    * resolved scan (a chain's live count isn't the sum of its levels).
    * The fs listing per bucket is bounded metadata work (≤ nBuckets
    * dirs), same class as the manifest read itself.
    */
  def keyedStats(spark: SparkSession, dir: String): DataFrame = {
    val clean = cleanDir(dir)
    if (manifestVersions(spark, dir).isEmpty)
      return tableStats(spark.read.parquet(clean), "kb")
    val m = readManifest(spark, dir)
    val (fast, slow) = (m.buckets.keySet ++ m.deltas.keySet).toSeq.sorted
      .partition(b => !m.deltas.get(b).exists(_.nonEmpty) &&
        m.buckets.get(b).exists(m.rows.contains))
    val fs = hadoopFs(spark, new Path(clean))
    def filesIn(d: String): Long = fs.listStatus(new Path(clean, d))
      .count(_.getPath.getName.endsWith(".parquet")).toLong
    val fastRows = fast.map(b => (b, m.rows(m.buckets(b)),
      filesIn(m.buckets(b))))
    // slow buckets (delta chains / legacy commits without recorded
    // rows): live row counts need the resolved scan, but the FILE
    // count comes from the manifest's dir list — input_file_name()
    // above the resolve window's exchange reads empty (the file-block
    // context doesn't cross a shuffle), which under-reported exactly
    // the chained buckets a compaction policy watches
    val slowCounts =
      if (slow.isEmpty) Map.empty[Int, Long]
      else resolveBuckets(spark, clean, m, slow, None)
        .groupBy("kb").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val slowRows = slow.map { b =>
      val dirs = m.buckets.get(b).toSeq ++ m.deltas.getOrElse(b, Nil)
      (b, slowCounts.getOrElse(b, 0L), dirs.map(filesIn).sum)
    }
    val all = (fastRows ++ slowRows).sortBy(_._1)
    if (all.isEmpty) tableStats(readKeyed(spark, dir).limit(0), "kb")
    else spark.createDataFrame(all).toDF("kb", "n_rows", "n_files")
  }

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
    * maintained `group by keys → count / sum / mean / min / max
    * [/ approx distinct]` view: one row per group with
    *   __cnt, __sum (EXACT DECIMAL(28,2) — merge order can never
    *   change results), __min/__max (mergeable under min/max), and,
    *   when `distinctKey` is set, __regs — the 2^p md5-HLL max-rank
    *   registers of `PF.hllMd5` as an int array, mergeable under
    *   element-wise max (so the estimate after any merge sequence is
    *   BIT-IDENTICAL to the full recompute, and DuckDB can mirror it).
    * The state is the one full pass over history; every refresh after
    * that is `mergeAggState`, whose cost is O(batch + state) — at
    * 100 TB the difference between a daily full recompute and a
    * minutes-long merge.
    */
  def buildAggState(df: DataFrame, keys: Seq[String], valueCol: String,
                    dir: String, distinctKey: Option[String] = None,
                    p: Int = 12, sampleK: Int = 0,
                    sampleUnique: Option[String] = None): Unit = {
    val spark = df.sparkSession
    val clean = cleanDir(dir)
    hadoopFs(spark, new Path(clean)).delete(new Path(clean), true)
    writeVersioned(partialAgg(df, keys, valueCol, distinctKey, p, sampleK,
      sampleUnique), dir)
  }

  /** Per-measure state-column suffix: ONE measure keeps the exact
    * pre-r11 names (__sum/__cnv/__min/__max — every existing state
    * stays valid); k ≥ 2 measures suffix each column with the measure
    * name (__sum_price, __min_qty, …). The shared row count stays
    * __cnt either way.
    */
  private def msfx(valueCols: Seq[String], c: String): String =
    if (valueCols.length == 1) "" else s"_$c"

  private def basicAggs(valueCols: Seq[String]) =
    Seq(F.count(F.lit(1)).as("__cnt")) ++ valueCols.flatMap { c =>
      val s = msfx(valueCols, c)
      Seq(
        F.sum(F.col(c).cast(org.apache.spark.sql.types.DecimalType(28, 2)))
          .as(s"__sum$s"),
        // the measure's NON-NULL row count (r11): what `avg(c)` and
        // `count(c)` divide/count by — __cnt is count(*); without this
        // a routed mean over a null-carrying measure would silently
        // disagree with the scan plan. Mergeable under sum.
        F.count(F.col(c)).as(s"__cnv$s"),
        F.min(F.col(c)).as(s"__min$s"),
        F.max(F.col(c)).as(s"__max$s"))
    }

  private def partialAgg(df: DataFrame, keys: Seq[String], valueCol: String,
                         distinctKey: Option[String], p: Int,
                         sampleK: Int = 0,
                         sampleUnique: Option[String] = None): DataFrame =
    partialAggCols(df, keys, Seq(valueCol), distinctKey, p, sampleK,
      sampleUnique)

  /** Multi-measure partial aggregate: one state row per group tracking
    * (__sum/__cnv/__min/__max) PER MEASURE — a dashboard tracking
    * (revenue, qty, latency) per key pays ONE state, one merge, one
    * manifest instead of three. The bounded sample, when requested,
    * tracks the FIRST measure (quantiles over more than one measure =
    * two states by design — the sample is the one state column whose
    * merge isn't a per-column fold).
    */
  private[sources] def partialAggCols(df: DataFrame, keys: Seq[String],
                                      valueCols: Seq[String],
                                      distinctKey: Option[String], p: Int,
                                      sampleK: Int = 0,
                                      sampleUnique: Option[String] = None)
      : DataFrame = {
    require(p >= 7 && p <= 16, s"hll p in [7,16], got $p")
    require(valueCols.nonEmpty, "agg state: no measure columns")
    val valueCol = valueCols.head
    val extra =
      // the native register aggregate (plans.HllRegsState): ONE
      // aggregation, a bounded 2^p-byte buffer per group, registers
      // persisted as BINARY. (A first cut densified a per-bucket
      // rollup with element_at-on-a-map inside a transform lambda —
      // CollapseProject inlined the map construction INTO the lambda
      // and rebuilt it per array element: 41 s for five rows.)
      distinctKey.map(dk =>
        graft.plans.HllRegs.stateMd5(F.col(dk), p).as("__regs")).toSeq ++
        // mergeable deterministic sample: the sampleK rows with the
        // SMALLEST sample hash — a pure function of the rows, so ANY
        // merge order (and a DuckDB ORDER BY hash LIMIT k mirror)
        // reproduces the identical sample; bounded per-group state
        // via the EarliestK heap. Quantiles finalize from the sample
        // (see finalizeAgg).
        //
        // SAMPLE GRAIN — the caller's one modeling decision:
        //  - default (sampleUnique = None): the hash is md5("smp:" ||
        //    value-string), so DUPLICATE VALUES share one hash key and
        //    the sample is uniform over DISTINCT VALUES, not rows. On
        //    skewed data (one value holding 99% of rows) the
        //    finalized quantiles estimate the distinct-value
        //    distribution — a value's multiplicity never raises its
        //    chance of being sampled.
        //  - sampleUnique = Some(rowKey): the hash salts in the
        //    row-unique key, making the sample UNIFORM OVER ROWS —
        //    the right grain for multiset quantiles on skewed data.
        //    The key must be unique per row and stable across
        //    refreshes (re-processing a row reproduces its hash), and
        //    the DuckDB mirror replays the same concatenation.
        // the GRAIN is part of the state's identity: the row-uniform
        // sample persists as __smpr, the distinct-value one as __smp,
        // so a refresh built with the WRONG grain fails loudly at the
        // merge's legacy-align select (missing column) instead of
        // silently mixing two hash functions into one heap
        (if (sampleK > 0) {
          val hashIn = sampleUnique match {
            case Some(u) => F.concat(F.lit("smp:"),
              F.col(valueCol).cast(org.apache.spark.sql.types.StringType),
              F.lit(":"),
              F.col(u).cast(org.apache.spark.sql.types.StringType))
            case None => F.concat(F.lit("smp:"),
              F.col(valueCol).cast(org.apache.spark.sql.types.StringType))
          }
          Seq(graft.plans.EarliestK.earliestK(
            graft.ext.TextAnalysis.h60(hashIn),
            F.col(valueCol).cast(org.apache.spark.sql.types.StringType),
            sampleK).as(
            if (sampleUnique.isDefined) "__smpr" else "__smp"))
        } else Nil)
    val ba = basicAggs(valueCols)
    df.groupBy(keys.map(F.col): _*).agg(ba.head, ba.tail ++ extra: _*)
  }

  /** Merge state rows per key: every state column is associative, so
    * the fold is a per-column aggregate — counts and sums add, min/max
    * fold, HLL registers union, bounded samples keep the k smallest.
    * Column handling is NAME-DRIVEN (prefix match), so single- and
    * multi-measure states, with or without the r11 __cnv columns,
    * merge through the same body.
    */
  private[sources] def aggOfState(state: DataFrame, keys: Seq[String],
                                  p: Int, sampleK: Int): DataFrame = {
    val cols = state.columns
    val aggs =
      Seq(F.sum(F.col("__cnt")).as("__cnt")) ++
      cols.filter(c => c.startsWith("__sum") || c.startsWith("__cnv"))
        .map(c => F.sum(F.col(c)).as(c)) ++
      cols.filter(_.startsWith("__min")).map(c => F.min(F.col(c)).as(c)) ++
      cols.filter(_.startsWith("__max")).map(c => F.max(F.col(c)).as(c)) ++
      (if (cols.contains("__regs"))
        Seq(graft.plans.HllRegs.unionState(F.col("__regs"), p).as("__regs"))
      else Nil) ++
      (Seq("__smp", "__smpr").filter(cols.contains).map(c =>
        // k smallest of the union of the (≤ sources) bounded samples —
        // a tiny interpreted sort over ≤ 2k entries per key; the sort
        // order (hash, value-string) is exactly the heap's
        F.slice(F.array_sort(F.flatten(F.collect_list(F.col(c)))),
          1, sampleK).as(c)))
    state.groupBy(keys.map(F.col): _*).agg(aggs.head, aggs.tail: _*)
  }

  // ---- generic versioned dataset (snapshot-swapped whole tables) ----------
  //
  // The same commit discipline as the keyed table, for UNKEYED whole
  // datasets that are periodically rewritten (agg state, model tables):
  //   dir/g000000001/part-*.parquet     immutable generation dirs
  //   dir/_manifests/v000000001.json    {"version":1,"buckets":{"0":"g..."}}
  // A writer stages the new generation (invisible), then publishes one
  // manifest — readers mid-rewrite see the old or new COMPLETE dataset,
  // never a half-deleted directory. Reuses the keyed manifest format
  // with a single pseudo-bucket.

  /** Commit `df` as the next generation of the versioned dataset at
    * `dir`; returns the committed version. Concurrent writers race on
    * the manifest publish only (writer-unique generation names); the
    * loser recomputes against the fresh version chain and retries.
    */
  def writeVersioned(df: DataFrame, dir: String): Int =
    // the internal retry is safe here because `df` does not depend on
    // the version chain; a caller whose frame DERIVES from the current
    // version (mergeAggState) must use writeVersionedOnce inside its
    // own retry so a conflict re-reads the fresh state
    withCommitRetry(s"writeVersioned($dir)")(writeVersionedOnce(df, dir))

  private def writeVersionedOnce(df: DataFrame, dir: String): Int = {
    val spark = df.sparkSession
    val clean = cleanDir(dir)
    val fs = hadoopFs(spark, new Path(clean))
    val next = manifestVersions(spark, dir).lastOption.getOrElse(0) + 1
    val gen = f"g$next%09d" +
      s"-${ProcessHandle.current().pid()}x${stageCounter.incrementAndGet()}"
    val staging = new Path(clean +
      s".staging_${ProcessHandle.current().pid()}x${stageCounter.incrementAndGet()}")
    fs.delete(staging, true)
    df.write.mode("overwrite").parquet(staging.toString)
    fs.mkdirs(new Path(clean))
    require(fs.rename(staging, new Path(clean, gen)),
      s"generation stage failed: $staging -> $clean/$gen")
    writeManifest(spark, clean, KeyedManifest(next, Map(0 -> gen)))
    next
  }

  /** The versioned dataset's snapshot at `version` (latest when None);
    * falls back to a plain read for pre-manifest directories. */
  def readVersioned(spark: SparkSession, dir: String,
                    version: Option[Int] = None): DataFrame = {
    val clean = cleanDir(dir)
    if (manifestVersions(spark, dir).isEmpty) spark.read.parquet(clean)
    else spark.read.parquet(
      s"$clean/${readManifest(spark, dir, version).buckets(0)}")
  }

  /** GC old generations of a versioned dataset (same contract and
    * grace rule as `vacuumKeyed`). Generation dirs are `g\d{9}-…` at
    * the top level. */
  def vacuumVersioned(spark: SparkSession, dir: String,
                      keepVersions: Int = 1,
                      graceMs: Long = 15 * 60 * 1000L): Unit =
    vacuumGenerations(spark, dir, keepVersions, graceMs,
      """g\d{9}(-.*)?""")

  // ---- segmented datasets (additive segment lists: search indexes) --------
  //
  // A third commit discipline for ADDITIVE datasets (the inverted
  // index): the manifest lists SEGMENT dirs, a rebuild replaces the
  // list, an append extends it — readers always resolve a complete
  // segment set, appends never rewrite existing segments, and old
  // snapshots time-travel/vacuum exactly like the keyed table.
  // Reuses the keyed manifest format with buckets = ordinal → segment.

  /** Stage-side helper: the writer-unique segment dir name for the
    * next commit at `dir` (the version in the name is cosmetic — the
    * suffix guarantees uniqueness; the manifest is the truth).
    */
  private[graft] def nextSegmentName(spark: SparkSession,
                                     dir: String): String = {
    val v = manifestVersions(spark, dir).lastOption.getOrElse(0) + 1
    f"s$v%09d" +
      s"-${ProcessHandle.current().pid()}x${stageCounter.incrementAndGet()}"
  }

  /** Publish the manifest adding `segDir` (an already-staged dir name
    * under `dir`) — `replace = true` makes it the ONLY segment (a full
    * rebuild), otherwise it appends to the current list. Optimistic
    * retry is cheap here: a losing race just re-reads the manifest and
    * re-publishes; the staged segment never depends on the base.
    * Returns the committed version.
    */
  private[graft] def commitSegment(spark: SparkSession, dir: String,
                                   segDir: String,
                                   replace: Boolean): Int = {
    val clean = cleanDir(dir)
    // the staged segment's on-disk bytes, priced ONCE at commit (the
    // writer just wrote these files — the walk is warm): for segment
    // manifests the `rows` map records per-segment BYTES, which is the
    // tiered-compaction policy input (compactIndex smallestK) — read
    // from the manifest instead of re-walking every segment dir per
    // compaction pass (guide §6: manifests beat directory listing)
    val stagedBytes = dirBytes(spark, s"$clean/$segDir")
    withCommitRetry(s"commitSegment($dir)") {
      val versions = manifestVersions(spark, dir)
      // an append onto a pre-manifest (legacy single-dir) dataset must
      // not publish a manifest listing ONLY the new segment — that
      // would silently drop the legacy data from every future read
      require(replace || versions.nonEmpty,
        s"$clean has no segment manifest (pre-r9 layout) — appends " +
          "need one; rebuild the dataset first")
      val next = versions.lastOption.getOrElse(0) + 1
      val (segs, bytes) =
        if (replace || versions.isEmpty)
          (Map(0 -> segDir), Map(segDir -> stagedBytes))
        else {
          val m = readManifest(spark, dir)
          (m.buckets + ((m.buckets.keySet.maxOption.getOrElse(-1) + 1)
            -> segDir),
            m.rows.view.filterKeys(m.buckets.values.toSet).toMap +
              (segDir -> stagedBytes))
        }
      writeManifest(spark, clean, KeyedManifest(next, segs, rows = bytes))
      next
    }
  }

  /** Publish the manifest that FOLDS `folded` (already-listed segment
    * dir names) into `segDir` (an already-staged dir name): the next
    * segment list is the current one minus `folded` plus `segDir` —
    * so segments a concurrent append added since the fold was planned
    * SURVIVE (a replace=true commit would silently drop them). A
    * concurrent rebuild/compact that removed one of the folded
    * segments makes this fold stale — it fails loudly instead of
    * double-counting the fold's rows next to a sibling copy.
    */
  private[graft] def commitSegmentsFold(spark: SparkSession, dir: String,
                                        segDir: String,
                                        folded: Seq[String]): Int = {
    val clean = cleanDir(dir)
    val stagedBytes = dirBytes(spark, s"$clean/$segDir")
    withCommitRetry(s"commitSegmentsFold($dir)") {
      val m = readManifest(spark, dir)
      val cur = m.buckets.toSeq.sortBy(_._1).map(_._2)
      require(folded.forall(cur.contains),
        s"$clean: a concurrent rebuild/compact removed " +
          s"${folded.filterNot(cur.contains).mkString(",")} — this fold " +
          "is stale; re-plan the compaction against the fresh manifest")
      val next = (cur.filterNot(folded.contains) :+ segDir)
        .zipWithIndex.map { case (s, i) => i -> s }.toMap
      val bytes = m.rows.view.filterKeys(next.values.toSet).toMap +
        (segDir -> stagedBytes)
      writeManifest(spark, clean,
        KeyedManifest(m.version + 1, next, rows = bytes))
      m.version + 1
    }
  }

  /** The live segment dirs (full paths, ordinal order) at `version`
    * (latest when None). Pre-manifest layouts resolve to `dir` itself —
    * the caller's legacy single-segment fallback.
    */
  def listSegments(spark: SparkSession, dir: String,
                   version: Option[Int] = None): Seq[String] = {
    val clean = cleanDir(dir)
    if (manifestVersions(spark, dir).isEmpty) Seq(clean)
    else readManifest(spark, dir, version).buckets.toSeq.sortBy(_._1)
      .map { case (_, d) => s"$clean/$d" }
  }

  /** GC unreferenced segments (same contract and grace rule as
    * `vacuumKeyed`). Segment dirs are `s\d{9}-…` at the top level. */
  def vacuumSegments(spark: SparkSession, dir: String,
                     keepVersions: Int = 1,
                     graceMs: Long = 15 * 60 * 1000L): Unit =
    vacuumGenerations(spark, dir, keepVersions, graceMs,
      """s\d{9}(-.*)?""")

  /** Fold a new batch into the persisted state at `dir` and commit the
    * merged state as the next snapshot (see writeVersioned — a reader
    * racing the refresh always resolves a complete state, and the
    * previous state stays readable until vacuumed). Never a
    * localCheckpoint: non-replicated executor blocks are the wrong
    * place for a state table that can reach many GB at 100 TB grain.
    * Every state column is associative (counts, decimal sums, min/max,
    * register-wise max), so state ∪ batch-partial re-aggregated IS the
    * state of history ∪ batch — bit-for-bit, in any merge order.
    * Returns the merged state (reading the committed snapshot).
    */
  def mergeAggState(spark: SparkSession, dir: String, batch: DataFrame,
                    keys: Seq[String], valueCol: String,
                    distinctKey: Option[String] = None,
                    p: Int = 12, sampleK: Int = 0,
                    sampleUnique: Option[String] = None): DataFrame = {
    // the WHOLE read-merge-commit sits in the retry: the merged frame
    // derives from the previous state, so after a losing race it must
    // be rebuilt from the winner's snapshot (committing the stale
    // frame under a new version would silently drop the winner's
    // batch)
    withCommitRetry(s"mergeAggState($dir)") {
      val prev = readVersioned(spark, dir)
      val merged = aggOfState(
        prev.unionByName(
          partialAgg(batch, keys, valueCol, distinctKey, p, sampleK,
            sampleUnique)
          // legacy (cnt, sum)-only states merge with a richer batch
          // partial by dropping what the state never tracked
          .select(prev.columns.map(F.col).toIndexedSeq: _*)), keys, p, sampleK)
      writeVersionedOnce(merged, dir)
    }
    // old generations GC here by default: agg state is refresh-heavy
    // and callers wanting time travel can vacuum on their own cadence
    vacuumVersioned(spark, dir, keepVersions = 2)
    readVersioned(spark, dir)
  }

  /** Finalize a state frame into the user-facing view:
    * (keys, n, total, mean[, vmin, vmax][, approx_distinct]) — the
    * extra columns appear when the state tracks them. `p` must match
    * the build's (the register count is 2^p).
    */
  def finalizeAgg(state: DataFrame, keys: Seq[String],
                  p: Int = 12): DataFrame = {
    // multi-measure states (r11) finalize per measure with suffixed
    // names: n, then total_<m>/mean_<m>/vmin_<m>/vmax_<m> for each —
    // single-measure states keep the exact pre-r11 shape
    val multi = state.columns.filter(_.startsWith("__sum_"))
      .map(_.stripPrefix("__sum_")).toSeq
    val base =
      if (multi.isEmpty) Seq(
        F.col("__cnt").as("n"),
        F.col("__sum").cast(org.apache.spark.sql.types.DoubleType).as("total"),
        // ONE IEEE division over the exact decimal sum (not decimal
        // division, whose result scale differs across engines)
        (F.col("__sum").cast(org.apache.spark.sql.types.DoubleType) /
          F.col("__cnt")).as("mean"))
      else F.col("__cnt").as("n") +: multi.flatMap(c => Seq(
        F.col(s"__sum_$c").cast(org.apache.spark.sql.types.DoubleType)
          .as(s"total_$c"),
        (F.col(s"__sum_$c").cast(org.apache.spark.sql.types.DoubleType) /
          F.col("__cnt")).as(s"mean_$c")))
    val minmax =
      if (multi.nonEmpty)
        multi.filter(c => state.columns.contains(s"__min_$c")).flatMap(c =>
          Seq(F.col(s"__min_$c").as(s"vmin_$c"),
            F.col(s"__max_$c").as(s"vmax_$c")))
      else if (state.columns.contains("__min"))
        Seq(F.col("__min").as("vmin"), F.col("__max").as("vmax"))
      else Nil
    val distinct =
      if (state.columns.contains("__regs"))
        // PF.hllMd5's estimate over the persisted registers — the
        // native scalar shares its arithmetic with graft_hll_regs
        // (and the DuckDB oracle replays it bit-for-bit)
        Seq(graft.plans.HllRegs.estimate(F.col("__regs"), p)
          .as("approx_distinct"))
      else Nil
    val quantiles =
      Seq("__smp", "__smpr").find(state.columns.contains).toSeq.flatMap { sc =>
        // the sample's order statistics estimate the population's at
        // the sample's GRAIN — distinct values (__smp, the default) or
        // rows (__smpr, built with sampleUnique; see partialAgg's
        // sample-grain note); the median uses explicit middle/average
        // arithmetic, other quantiles nearest-rank v[ceil(q·n)] —
        // both exactly replayable in any SQL engine
        val sorted = s"array_sort(transform($sc, e -> CAST(e.p AS DOUBLE)))"
        def rank(q: Double) = F.round(F.expr(
          s"""CASE WHEN size($sc) = 0 THEN NULL ELSE
             |  $sorted[CAST(ceil($q * size($sc)) AS INT) - 1]
             |END""".stripMargin), 6)
        Seq(
          rank(0.25).as("approx_p25"),
          F.round(F.expr(
            s"""CASE WHEN size($sc) = 0 THEN NULL ELSE (
               |  $sorted[CAST((size($sc) + 1) / 2 AS INT) - 1]
               |  + $sorted[CAST(size($sc) / 2 + 1 AS INT) - 1]
               |) / 2.0 END""".stripMargin), 6).as("approx_median"),
          rank(0.9).as("approx_p90"))
      }
    state.select(keys.map(F.col) ++ base ++ minmax ++ distinct ++ quantiles: _*)
  }

  // ---- BUCKETED incremental agg state (merge cost ∝ batch) ---------------
  //
  // `mergeAggState` rewrites the WHOLE state every refresh (the
  // versioned dataset is a single pseudo-bucket) — fine for small
  // states, O(state) write amplification at 100 TB grain with
  // high-cardinality keys and frequent small batches. The bucketed
  // variant stores the state AS A KEYED TABLE hash-bucketed by the
  // group keys (state rows are unique per key by construction, so the
  // keyed layout fits exactly):
  //  - the default refresh is copy-on-write at BUCKET granularity —
  //    only the buckets the batch's keys hash into are read,
  //    re-aggregated, and restaged (manifest path pruning, the same
  //    contract as upsertKeyed);
  //  - `asDeltas = true` APPENDS the batch's partial rows as per-bucket
  //    merge-on-read delta dirs — bytes written ∝ THE BATCH, never the
  //    buckets. Every state column is associative (counts, decimal
  //    sums, min/max, register-wise max, bounded bottom-k samples), so
  //    resolution is RE-AGGREGATION of the chain levels at read
  //    (`readAggStateKeyed`), and `compactAggStateKeyed` folds chains
  //    back into base generations on the `minChain` policy.
  // The manifest records resolve="agg" for these tables, so the
  // generic last-wins readers (readKeyed/lookupKeyed/compactKeyed)
  // fail loudly instead of silently keeping the newest partial per key.

  /** (Re)build the BUCKETED agg state at `dir` from scratch: the
    * partial-aggregate of `df` written as a keyed table keyed on the
    * group keys. Same state columns and sample-grain contract as
    * `buildAggState`; size `nBuckets` so one bucket ≈ one comfortable
    * rewrite at the full state's scale.
    */
  def buildAggStateKeyed(df: DataFrame, dir: String, keys: Seq[String],
                         valueCol: String, nBuckets: Int,
                         distinctKey: Option[String] = None,
                         p: Int = 12, sampleK: Int = 0,
                         sampleUnique: Option[String] = None,
                         txn: Map[String, Long] = Map.empty): Unit =
    buildAggStateKeyedCols(df, dir, keys, Seq(valueCol), nBuckets,
      distinctKey, p, sampleK, sampleUnique, txn)

  /** MULTI-MEASURE variant (r11): one state tracking
    * (__sum/__cnv/__min/__max) per measure — a dashboard's
    * (revenue, qty, latency) per key is ONE state, one merge per
    * refresh, one manifest, instead of N of each. Single-element
    * `valueCols` is byte-identical to the classic build.
    */
  def buildAggStateKeyedCols(df: DataFrame, dir: String, keys: Seq[String],
                             valueCols: Seq[String], nBuckets: Int,
                             distinctKey: Option[String] = None,
                             p: Int = 12, sampleK: Int = 0,
                             sampleUnique: Option[String] = None,
                             txn: Map[String, Long] = Map.empty): Unit = {
    val spark = df.sparkSession
    val clean = cleanDir(dir)
    hadoopFs(spark, new Path(clean)).delete(new Path(clean), true)
    writeKeyedInternal(
      partialAggCols(df, keys, valueCols, distinctKey, p, sampleK,
        sampleUnique),
      dir, keys, nBuckets, Seq.empty, nullSafe = false, resolve = "agg",
      txn = txn,
      // the build's p/sampleK/sampleUnique are TABLE METADATA from
      // here on: reads, merges, compactions, and MV rebuilds default
      // to them instead of trusting the caller to repeat the build's
      // numbers (the sample GRAIN is part of the state's identity)
      aggP = p, aggK = sampleK, aggSU = sampleUnique.getOrElse(""))
  }

  /** Fold one batch into the bucketed agg state. `p`/`sampleK` default
    * to the BUILD's values recorded in the manifest (sentinels 0/-1;
    * pre-r10 states fall back to 12/0); `distinctKey`/`sampleUnique`
    * must still match the build's — a missing state column fails
    * loudly at the align select (the sample GRAIN is part of the
    * state's identity; see `partialAgg`). Copy-on-write mode reads +
    * re-aggregates + restages ONLY the touched buckets inside the
    * optimistic-commit retry; `asDeltas` appends the partial as delta
    * dirs (bytes ∝ batch) — the batch partial has unique keys per call
    * by construction, satisfying appendDeltaKeyed's contract.
    */
  def mergeAggStateKeyed(spark: SparkSession, dir: String, batch: DataFrame,
                         keys: Seq[String], valueCol: String,
                         distinctKey: Option[String] = None,
                         p: Int = 0, sampleK: Int = -1,
                         sampleUnique: Option[String] = None,
                         asDeltas: Boolean = false,
                         txn: Map[String, Long] = Map.empty): Unit =
    mergeAggStateKeyedCols(spark, dir, batch, keys, Seq(valueCol),
      distinctKey, p, sampleK, sampleUnique, asDeltas, txn)

  /** Multi-measure merge — the batch partial carries every measure's
    * columns; a measure set differing from the build's fails loudly at
    * the stored-column align select (same identity rule as the sample
    * grain).
    */
  def mergeAggStateKeyedCols(spark: SparkSession, dir: String,
                             batch: DataFrame,
                             keys: Seq[String], valueCols: Seq[String],
                             distinctKey: Option[String] = None,
                             p: Int = 0, sampleK: Int = -1,
                             sampleUnique: Option[String] = None,
                             asDeltas: Boolean = false,
                             txn: Map[String, Long] = Map.empty): Unit = {
    val clean = cleanDir(dir)
    val m0 = readManifest(spark, dir)
    require(m0.nBuckets > 0 && m0.keyCol == keys.mkString(","),
      s"$clean is keyed on (${m0.keyCol}, ${m0.nBuckets} buckets); " +
        s"the merge passed (${keys.mkString(",")})")
    require(m0.resolve == "agg",
      s"$clean is not an agg-state table (resolve='${m0.resolve}') — " +
        "row tables merge through upsertKeyed/appendDeltaKeyed")
    // p/sampleK default to the BUILD's recorded values (sentinels
    // 0/-1 = "use the manifest"); pre-r10 states without the metadata
    // fall back to the historical defaults
    val pe = if (p > 0) p else if (m0.aggP > 0) m0.aggP else 12
    val ke = if (sampleK >= 0) sampleK else math.max(m0.aggK, 0)
    // the sample GRAIN also defaults to the build's recorded column
    // (r12 manifests): a caller passing None no longer silently flips
    // a row-uniform (__smpr) state to the distinct-value grain — and a
    // caller CONTRADICTING the recorded column fails loudly (two salt
    // columns under one __smpr name would silently mix hash functions
    // in one heap)
    require(sampleUnique.isEmpty || m0.aggSU.isEmpty ||
      sampleUnique.contains(m0.aggSU),
      s"$clean records sample grain column '${m0.aggSU}'; the merge " +
        s"passed sampleUnique='${sampleUnique.get}'")
    val sue = sampleUnique.orElse(Option(m0.aggSU).filter(_.nonEmpty))
    val partial = partialAggCols(batch, keys, valueCols, distinctKey, pe,
      ke, sue)
    if (asDeltas) {
      appendDeltaKeyedCols(spark, dir, partial, keys, m0.nBuckets,
        txn = txn)
      return
    }
    val withKb = partial
      .withColumn("kb", kb(keys, m0.nBuckets, depths = m0.depths))
      .localCheckpoint()
    val touched = withKb.select("kb").distinct().collect()
      .map(_.getInt(0)).sorted.toSeq
    if (touched.isEmpty) return
    withCommitRetry(s"mergeAggStateKeyed($dir)") {
      val m = readManifest(spark, dir)
      // the partial's kb was computed under m0's layout — a concurrent
      // re-bootstrap changing it would park state in the wrong buckets
      require(m.nBuckets == m0.nBuckets && m.keyCol == m0.keyCol &&
        m.depths == m0.depths,
        s"$clean re-bootstrapped/re-bucketed to (${m.keyCol}, " +
          s"${m.nBuckets}) buckets mid-merge — re-run the merge")
      // touched buckets' CURRENT state: base generations ∪ any agg
      // delta chains, read RAW (resolution is the re-aggregate below —
      // never last-wins) — so a CoW merge also folds existing chains
      val dirs = touched.flatMap(b =>
        m.buckets.get(b).toSeq ++ m.deltas.getOrElse(b, Nil))
      val base =
        if (dirs.nonEmpty)
          readGenDirs(spark, clean, m, dirs, withTomb = true)
        else withKb.limit(0)
      // align the batch partial to the STORED column set: a legacy
      // (cnt,sum)-only state merges with a richer partial by dropping
      // what the state never tracked; a state column the partial lacks
      // (wrong sample grain / missing distinctKey) fails loudly here
      val cols = base.columns.filterNot(c => c == "kb" || c == "__tomb")
        .toIndexedSeq
      val merged = aggOfState(
        base.select(cols.map(F.col): _*)
          .unionByName(withKb.select(cols.map(F.col): _*)),
        keys, pe, ke)
        .withColumn("kb", kb(keys, m.nBuckets, depths = m.depths))
      commitKeyed(spark, stageMerge(spark, dir, merged, touched, m,
        txn = txn))
    }
  }

  /** The bucketed agg state's resolved rows at `version` (latest when
    * None): chain-free snapshots read straight through; delta-carrying
    * snapshots RE-AGGREGATE every chain level per key (all state
    * columns are associative, so the re-aggregate IS the merge —
    * bit-for-bit, in any order). `p`/`sampleK` must match the build's
    * when chains exist (same contract as `finalizeAgg`).
    */
  def readAggStateKeyed(spark: SparkSession, dir: String,
                        p: Int = 0, sampleK: Int = -1,
                        version: Option[Int] = None): DataFrame = {
    val clean = cleanDir(dir)
    val m = readManifest(spark, dir, version)
    require(m.nBuckets > 0 && m.resolve == "agg",
      s"$clean is not a bucketed agg state (resolve='${m.resolve}')")
    readAggStateBuckets(spark, clean, m,
      (m.buckets.keySet ++ m.deltas.keySet).toSeq.sorted, p, sampleK)
  }

  /** The resolved agg-state rows of `buckets` only — the bucket-pruned
    * read `aggStateChanges` uses (the changelog's cost must be
    * O(changed buckets), never state size).
    */
  private def readAggStateBuckets(spark: SparkSession, clean: String,
                                  m: KeyedManifest, buckets: Seq[Int],
                                  p: Int = 0, sampleK: Int = -1)
      : DataFrame = {
    val pe = if (p > 0) p else if (m.aggP > 0) m.aggP else 12
    val ke = if (sampleK >= 0) sampleK else math.max(m.aggK, 0)
    def rd(dirs: Seq[String]): DataFrame =
      readGenDirs(spark, clean, m, dirs, withTomb = true)
        .drop("kb", "__tomb")
    // the re-aggregation shuffle is confined to DELTA-CARRYING buckets
    // (a key lives in exactly one bucket, so the per-key fold is
    // complete bucket-by-bucket — same principle as resolveBuckets);
    // chain-free buckets read straight through with no shuffle
    val (deltaB, plainB) = buckets
      .partition(b => m.deltas.get(b).exists(_.nonEmpty))
    val plainDirs = plainB.flatMap(m.buckets.get)
    val deltaDirs = deltaB.flatMap(b =>
      m.buckets.get(b).toSeq ++ m.deltas(b))
    val plain = if (plainDirs.isEmpty) None else Some(rd(plainDirs))
    val resolved =
      if (deltaDirs.isEmpty) None
      else {
        val raw = rd(deltaDirs)
        require(ke > 0 ||
          !raw.columns.exists(c => c == "__smp" || c == "__smpr"),
          s"$clean tracks a bounded sample — pass the build's sampleK " +
            "to resolve its delta chains (r10+ builds record it)")
        Some(aggOfState(raw, m.keyCols, pe, ke))
      }
    (plain, resolved) match {
      case (Some(a), Some(b)) => a.unionByName(b, allowMissingColumns = true)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) => emptySnapshot(spark, clean, m).drop("kb", "__tomb")
    }
  }

  /** Fold the agg state's delta chains back into base generations —
    * the re-aggregation twin of `compactKeyed` (which is last-wins and
    * refuses resolve=agg tables). Planned from the manifest: only
    * buckets whose chain reached `minChain` are read, re-aggregated,
    * and restaged; one manifest commit drops their chains.
    */
  def compactAggStateKeyed(spark: SparkSession, dir: String,
                           p: Int = 0, sampleK: Int = -1,
                           buckets: Option[Seq[Int]] = None,
                           minChain: Int = 1): Unit = {
    require(minChain >= 1, s"minChain must be >= 1, got $minChain")
    val clean = cleanDir(dir)
    if (manifestVersions(spark, dir).isEmpty) return
    withCommitRetry(s"compactAggStateKeyed($dir)") {
      val m = readManifest(spark, dir)
      require(m.resolve == "agg",
        s"$clean is not an agg-state table — use compactKeyed")
      val pe = if (p > 0) p else if (m.aggP > 0) m.aggP else 12
      val ke = if (sampleK >= 0) sampleK else math.max(m.aggK, 0)
      val target = buckets.getOrElse(m.deltas.keys.toSeq)
        .filter(b => m.deltas.get(b).exists(_.length >= minChain)).sorted
      if (target.nonEmpty) {
        val dirs = target.flatMap(b =>
          m.buckets.get(b).toSeq ++ m.deltas.getOrElse(b, Nil))
        val raw = readGenDirs(spark, clean, m, dirs, withTomb = true)
        require(ke > 0 ||
          !raw.columns.exists(c => c == "__smp" || c == "__smpr"),
          s"$clean tracks a bounded sample — pass the build's sampleK")
        val cols = raw.columns.filterNot(c => c == "kb" || c == "__tomb")
          .toIndexedSeq
        val folded = aggOfState(raw.select(cols.map(F.col): _*),
          m.keyCols, pe, ke)
          .withColumn("kb", kb(m.keyCols, m.nBuckets, depths = m.depths))
        commitKeyed(spark, stageMerge(spark, clean, folded, target, m))
      }
    }
  }

  /** REPLACE the agg-state rows whose `tagCol` value is in `tags` with
    * `partial`'s rows (which must all carry tags in `tags`) — the
    * refresh primitive for BUCKET-GRAIN materialized views: the state
    * tracks per-(group, base-bucket) partials, a base commit
    * invalidates the changed buckets' partials wholesale, and this
    * swaps exactly those rows in one manifest commit. Unlike a merge
    * (which FOLDS partials into existing rows — correct only for
    * insert-only feeds), replace handles updates and deletes, and is
    * IDEMPOTENT: re-running the same refresh reproduces the same state.
    *
    * Cost: O(state) to locate the condemned rows (the state is orders
    * smaller than its base by construction) plus a rewrite of only the
    * state buckets holding condemned or fresh rows.
    */
  def replaceAggStateByTag(spark: SparkSession, dir: String,
                           partial: DataFrame, tagCol: String,
                           tags: Seq[Int]): Unit = {
    require(tags.nonEmpty, "replaceAggStateByTag: no tags")
    val clean = cleanDir(dir)
    // freeze the caller's partial BEFORE the retry loop: its lineage
    // reads the BASE table, and a commit conflict must not re-scan it
    val part0 = partial.localCheckpoint()
    withCommitRetry(s"replaceAggStateByTag($dir)") {
      val m = readManifest(spark, dir)
      require(m.resolve == "agg",
        s"$clean is not a bucketed agg state (resolve='${m.resolve}')")
      require(m.keyCols.contains(tagCol),
        s"$clean is keyed on (${m.keyCol}) — no tag column '$tagCol'")
      val live = (m.buckets.keySet ++ m.deltas.keySet).toSeq.sorted
      val st =
        (if (live.isEmpty) emptySnapshot(spark, clean, m).drop("kb", "__tomb")
         else readAggStateBuckets(spark, clean, m, live))
          .withColumn("kb", kb(m.keyCols, m.nBuckets, depths = m.depths))
      val cond = F.col(tagCol).isin(tags: _*)
      val partKb = part0.withColumn("kb",
        kb(m.keyCols, m.nBuckets, depths = m.depths))
      // ONE probe job (r15; was three — an isEmpty guard plus one
      // distinct-collect per side, each a job + a driver gap on a path
      // the profiler showed is job-count bound): a tagged union folds
      // the outside-tag guard count and BOTH sides' touched-bucket
      // sets into a single aggregate over (checkpointed partial ∪
      // replaced state rows).
      val probe = partKb.select(F.col("kb"),
          F.when(!cond, 1L).otherwise(0L).as("__bad"))
        .unionByName(st.filter(cond).select(F.col("kb"),
          F.lit(0L).as("__bad")))
        .agg(F.collect_set(F.col("kb")).as("kbs"),
          F.coalesce(F.sum(F.col("__bad")), F.lit(0L)).as("bad"))
        .head
      require(probe.getLong(1) == 0L,
        s"replaceAggStateByTag($clean): partial carries rows outside " +
          s"the replaced tag set — those would merge, not replace")
      val touched = probe.getSeq[Int](0).distinct.sorted
      if (touched.nonEmpty) {
        val touchedCol = F.col("kb").isin(touched: _*)
        val merged = st.filter(touchedCol && !cond)
          .unionByName(partKb.filter(touchedCol),
            allowMissingColumns = true)
        commitKeyed(spark, stageMerge(spark, dir, merged, touched, m))
      }
    }
  }

  // ---- cross-table commit groups -------------------------------------------
  //
  // A pipeline writing a fact table + its search index + its agg state
  // makes three INDEPENDENT manifest commits — a reader can observe
  // fact v(n+1) next to index v(n). A commit GROUP pins (table dir →
  // manifest version) tuples in one manifest of its own, published
  // with the same hard-link/rename-if-absent discipline, so a reader
  // resolving through the group sees a version SET some writer
  // published atomically — never a mix. Reuses the keyed-manifest
  // format: pins ride the b64-keyed `txn` map (no buckets).

  /** Publish `pins` as the next version of the commit group at
    * `groupDir`; tables the previous group version pinned and this
    * call doesn't re-pin CARRY FORWARD (a pipeline pins what it wrote).
    * Returns the committed group version. Losing a publish race
    * re-reads and re-publishes — pins are writer-local facts, nothing
    * to recompute.
    */
  def commitGroup(spark: SparkSession, groupDir: String,
                  pins: Map[String, Int],
                  keepVersions: Int = 0): Int = {
    require(pins.nonEmpty, "commitGroup: no pins")
    val clean = cleanDir(groupDir)
    val p = pins.map { case (t, v) => cleanDir(t) -> v.toLong }
    val committed = withCommitRetry(s"commitGroup($groupDir)") {
      val versions = manifestVersions(spark, clean)
      val prev =
        if (versions.isEmpty) Map.empty[String, Long]
        else readManifest(spark, clean).txn
      val next = versions.lastOption.getOrElse(0) + 1
      writeManifest(spark, clean,
        KeyedManifest(next, Map.empty, txn = prev ++ p))
      next
    }
    // register the group with each member it pins (idempotent pointer
    // file; the retention floor itself is read from the group's LIVE
    // manifests at vacuum time, so this write races nothing)
    p.keys.foreach { member =>
      val gp = new Path(registeredGroupPath(member, clean))
      val fs = hadoopFs(spark, gp)
      if (!fs.exists(gp)) {
        fs.mkdirs(gp.getParent)
        val out = fs.create(gp, true)
        try out.write(clean.getBytes("UTF-8")) finally out.close()
      }
    }
    // groups need their own retention cadence: every surviving group
    // VERSION's pins floor member vacuum, so a pipeline committing the
    // group per run would otherwise pin members at its FIRST run
    // forever (and each member vacuum re-reads O(versions) group
    // manifests). keepVersions > 0 applies the policy right here —
    // the usual call is keepVersions = 1 (only the newest pin set
    // constrains); 0 keeps every version (a time-travel group).
    if (keepVersions > 0) vacuumGroup(spark, clean, keepVersions)
    committed
  }

  /** GC old versions of the commit group at `groupDir` (same
    * keep-newest + grace contract as `vacuumKeyed` — group manifests
    * are pins only, so this never deletes data, it only RELAXES the
    * members' vacuum floors). A reader time-traveling to a dropped
    * group version fails loudly, like any vacuumed snapshot.
    */
  def vacuumGroup(spark: SparkSession, groupDir: String,
                  keepVersions: Int = 1,
                  graceMs: Long = 15 * 60 * 1000L): Unit =
    vacuumGenerations(spark, groupDir, keepVersions, graceMs,
      genPattern = "(?!)") // groups have no generation dirs

  /** Delete the commit group at `groupDir` ENTIRELY: sweep the pointer
    * files it registered at every member its LATEST version pins, then
    * remove the group dir. Members' vacuum floors relax immediately;
    * a `readGroup` against the dropped group fails loudly. The inverse
    * of the `commitGroup` lifecycle — call when the pipeline the group
    * served is decommissioned.
    */
  def dropGroup(spark: SparkSession, groupDir: String): Unit = {
    val clean = cleanDir(groupDir)
    val members =
      if (manifestVersions(spark, clean).isEmpty) Seq.empty[String]
      else readManifest(spark, clean).txn.keys.toSeq
    members.foreach { member =>
      val gp = new Path(registeredGroupPath(member, clean))
      val fs = hadoopFs(spark, gp)
      fs.delete(gp, false)
    }
    val p = new Path(clean)
    hadoopFs(spark, p).delete(p, true)
  }

  /** Delete the registered CDC cursor `<dir>/_cursors/<name>`: the
    * consumer is decommissioned and its version floor must stop
    * constraining `vacuumKeyed`. (A consumer merely PAUSING keeps its
    * cursor — that is the whole point of registration.)
    */
  def unregisterCursor(spark: SparkSession, dir: String,
                       name: String): Unit = {
    val p = new Path(registeredCursorPath(dir, name))
    hadoopFs(spark, p).delete(p, false)
  }

  /** The group's pins (table dir → pinned manifest version) at
    * `version` (latest when None).
    */
  def groupPins(spark: SparkSession, groupDir: String,
                version: Option[Int] = None): Map[String, Int] =
    readManifest(spark, cleanDir(groupDir), version).txn
      .map { case (t, v) => t -> v.toInt }

  /** Read `tableDir`'s snapshot AT THE VERSION the commit group pins —
    * the consistent-read face. ONE group manifest resolves every
    * member table, so a reader racing a pipeline sees the whole
    * version set of one atomic group publish. Dispatches on the
    * member's own manifest discipline (row table vs agg state). A
    * member vacuumed past its pin fails loudly (size the members'
    * vacuum retention to the group's consumers, like CDC cursors).
    */
  def readGroup(spark: SparkSession, groupDir: String,
                tableDir: String, version: Option[Int] = None): DataFrame = {
    val t = cleanDir(tableDir)
    val pins = groupPins(spark, groupDir, version)
    val v = pins.getOrElse(t, throw new IllegalArgumentException(
      s"commit group ${cleanDir(groupDir)} does not pin $t " +
        s"(pins: ${pins.keys.toSeq.sorted.mkString(", ")})"))
    if (readManifest(spark, t, Some(v)).resolve == "agg")
      readAggStateKeyed(spark, t, version = Some(v))
    else readKeyed(spark, t, Some(v))
  }

  /** Changelog of a MATERIALIZED VIEW (bucketed agg state) between two
    * snapshots: one row per group key whose FINALIZED view row was
    * added / removed / changed between `fromV` and `toV`, carrying the
    * NEW finalized columns (NULL for removed) plus the OLD ones as
    * `old_<col>` (NULL for added) — exactly what a downstream consumer
    * needs to maintain ITS state incrementally (apply new, retract
    * old). The changelog is defined ON THE VIEW: a refresh that left a
    * group's finalized row identical emits nothing.
    *
    * Scale contract (the keyedChanges twin): the manifests tell which
    * buckets changed generation or chain, so only THOSE buckets are
    * read and re-aggregated on either side — O(changed buckets), never
    * state size. A re-bootstrap between the versions (layout change)
    * diffs every bucket, which is what actually happened.
    */
  def aggStateChanges(spark: SparkSession, dir: String,
                      fromV: Int, toV: Int): DataFrame = {
    val clean = cleanDir(dir)
    val m1 = readManifest(spark, dir, Some(fromV))
    val m2 = readManifest(spark, dir, Some(toV))
    require(m2.resolve == "agg" && m1.resolve == "agg",
      s"$clean is not a bucketed agg state — use keyedChanges")
    val sameLayout = m1.nBuckets == m2.nBuckets && m1.keyCol == m2.keyCol &&
      m1.depths == m2.depths
    val changed =
      (m1.buckets.keySet ++ m2.buckets.keySet ++
        m1.deltas.keySet ++ m2.deltas.keySet)
        .filter(b => !sameLayout ||
          m1.buckets.get(b) != m2.buckets.get(b) ||
          m1.deltas.getOrElse(b, Nil) != m2.deltas.getOrElse(b, Nil))
        .toSeq.sorted
    val keys = m2.keyCols
    def side(m: KeyedManifest): DataFrame = {
      val live = changed.filter(b => m.buckets.contains(b) ||
        m.deltas.get(b).exists(_.nonEmpty))
      val st =
        if (live.nonEmpty) readAggStateBuckets(spark, clean, m, live)
        else emptySnapshot(spark, clean, m).drop("kb", "__tomb")
      finalizeAgg(st, keys)
    }
    val o = side(m1)
    val n = side(m2)
    val valCols = n.columns.filterNot(keys.contains).toSeq
    val d = diff(o, n, keys).filter(F.col("status") =!= "same")
    val oldP = o.select(keys.map(F.col) ++
      valCols.map(c => F.col(c).as(s"old_$c")): _*)
    d.join(n, keys, "left").join(oldP, keys, "left")
      .select(keys.map(F.col) ++ (F.col("status") +:
        (valCols.map(F.col) ++ valCols.map(c => F.col(s"old_$c")))): _*)
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
