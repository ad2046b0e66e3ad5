package graft

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.{functions => F}

/** Out-of-order delta CDC: a table with a registered SEQUENCE column
  * resolves max-seq-wins (ties by chain order), so delta batches may
  * land in any order; tombstones are stamped; compaction preserves the
  * comparator; batch-wins writers are refused.
  */
class SeqDeltaSpec extends SparkSpec {
  private val M = graft.sources.Maintenance

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def base(n: Int) = spark.range(0, n).select(col("id").as("k"),
    (col("id") % 31).cast("double").as("v"), lit(0L).as("seq"))

  private def b(n: Int, m: Int, seq: Long, v: Double) =
    spark.range(0, n).filter(col("id") % m === 0).select(
      col("id").as("k"), lit(v).as("v"), lit(seq).as("seq"))

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "v", "seq").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

  test("shuffled delta batches resolve exactly like ordered application") {
    val a = tmp("seq_a"); val o = tmp("seq_o")
    val n = 3000
    // the same four batches, applied in order on `o` and SHUFFLED on
    // `a` — the resolved snapshots must be identical
    val b1 = b(n, 3, 1L, 100.0)
    val b2 = b(n, 5, 2L, 200.0)
    val b3 = b(n, 7, 3L, 300.0)
    val tomb = spark.range(0, n).filter(col("id") % 11 === 0)
      .select(col("id").as("k"), lit(4L).as("seq"))
    for (dir <- Seq(a, o)) M.writeKeyed(base(n), dir, "k", 8)
    M.appendDeltaKeyedCols(spark, o, b1, Seq("k"), 8, seqCol = Some("seq"))
    M.appendDeltaKeyedCols(spark, o, b2, Seq("k"), 8)
    M.appendDeltaKeyedCols(spark, o, b3, Seq("k"), 8)
    M.appendDeltaKeyedCols(spark, o, spark.range(0).select(
      col("id").as("k"), lit(0.0).as("v"), lit(5L).as("seq")),
      Seq("k"), 8, tombstoneKeys = Some(tomb))
    // out of order: deletes first, then 3, 1, 2
    M.appendDeltaKeyedCols(spark, a, spark.range(0).select(
      col("id").as("k"), lit(0.0).as("v"), lit(5L).as("seq")),
      Seq("k"), 8, tombstoneKeys = Some(tomb), seqCol = Some("seq"))
    M.appendDeltaKeyedCols(spark, a, b3, Seq("k"), 8)
    M.appendDeltaKeyedCols(spark, a, b1, Seq("k"), 8)
    M.appendDeltaKeyedCols(spark, a, b2, Seq("k"), 8)
    val ordered = asMap(M.readKeyed(spark, o))
    val shuffled = asMap(M.readKeyed(spark, a))
    assert(shuffled == ordered,
      "max-seq resolution must be order-independent")
    // spot-check the comparator: k=105 (3·5·7) holds seq 3; k=0
    // (also %11) is deleted
    assert(ordered(105L) == ((300.0, 3L)))
    assert(!ordered.contains(0L))
    assert(ordered.get(5L).exists(_._2 == 2L))
    assert(ordered.get(1L).exists(_._2 == 0L), "untouched keys keep base")
    // compaction folds the chains WITHOUT changing the winners, and a
    // LATE OLD event after it still loses to the stored row
    M.compactKeyed(spark, a)
    assert(M.readManifest(spark, a).deltas.values.forall(_.isEmpty))
    assert(asMap(M.readKeyed(spark, a)) == ordered)
    M.appendDeltaKeyedCols(spark, a,
      spark.range(105, 106).select(col("id").as("k"),
        lit(-9.0).as("v"), lit(1L).as("seq")), Seq("k"), 8)
    assert(asMap(M.readKeyed(spark, a))(105L) == ((300.0, 3L)),
      "a late-arriving OLD event must not overwrite a newer stored row")
  }

  test("seq-mode guards: late declaration, contradiction, unstamped tombstones, batch-wins writers") {
    val dir = tmp("seq_g")
    M.writeKeyed(base(500), dir, "k", 4)
    // chain-ordered history first -> declaring seq afterwards refuses
    M.appendDeltaKeyedCols(spark, dir, b(500, 3, 1L, 1.0), Seq("k"), 4)
    intercept[IllegalArgumentException] {
      M.appendDeltaKeyedCols(spark, dir, b(500, 5, 2L, 2.0), Seq("k"), 4,
        seqCol = Some("seq"))
    }
    // compacted (chains folded) -> declaration becomes legal
    M.compactKeyed(spark, dir)
    M.appendDeltaKeyedCols(spark, dir, b(500, 5, 2L, 2.0), Seq("k"), 4,
      seqCol = Some("seq"))
    // contradicting the registered column refuses
    intercept[IllegalArgumentException] {
      M.appendDeltaKeyedCols(spark, dir, b(500, 7, 3L, 3.0), Seq("k"), 4,
        seqCol = Some("v"))
    }
    // unstamped tombstones refuse (nulls would never win)
    intercept[IllegalArgumentException] {
      M.appendDeltaKeyedCols(spark, dir,
        spark.range(0).select(col("id").as("k"), lit(0.0).as("v"),
          lit(9L).as("seq")), Seq("k"), 4,
        tombstoneKeys = Some(spark.range(3).select(col("id").as("k"))))
    }
    // batch-wins writers (upsert/delete/CoW merge) refuse the table
    intercept[IllegalArgumentException] {
      M.upsertKeyed(spark, dir,
        spark.range(1).select(col("id").as("k"), lit(1.0).as("v"),
          lit(9L).as("seq")), "k", 4)
    }
    intercept[IllegalArgumentException] {
      M.deleteKeyed(spark, dir,
        spark.range(1).select(col("id").as("k")), "k", 4)
    }
    // reads and point lookups still honor the comparator
    val lk = M.lookupKeyed(spark, dir, Seq(5L)).select("v", "seq").head
    assert(lk.getDouble(0) == 2.0 && lk.getLong(1) == 2L)
  }

  test("the two out-of-order mechanisms stay disjoint: cdcMergeKeyed refuses seq-registered tables; its own stored-seq CoW guard remains the alternative") {
    // a seq-REGISTERED table ingests through stamped appends only —
    // cdcMergeKeyed's copy-on-write path hits the batch-wins guard
    val a = tmp("seq_cdc_a")
    M.writeKeyed(base(300), a, "k", 4)
    M.appendDeltaKeyedCols(spark, a, b(300, 3, 1L, 1.0), Seq("k"), 4,
      seqCol = Some("seq"))
    val err = intercept[IllegalArgumentException] {
      M.cdcMergeKeyed(spark, a,
        b(300, 5, 2L, 2.0).withColumn("del", lit(false)),
        "k", 4, seqCol = Some("seq"), deleteCol = Some("del"))
    }
    assert(err.getMessage.contains("sequence column"), err.getMessage)
    // an UNREGISTERED table keeps cdcMergeKeyed's own out-of-order
    // protection: a replayed OLDER sequence never regresses the row
    val c = tmp("seq_cdc_c")
    M.cdcMergeKeyed(spark, c,
      base(300).withColumn("del", lit(false)), "k", 4,
      seqCol = Some("seq"), deleteCol = Some("del"))
    M.cdcMergeKeyed(spark, c,
      b(300, 3, 5L, 500.0).withColumn("del", lit(false)), "k", 4,
      seqCol = Some("seq"), deleteCol = Some("del"))
    M.cdcMergeKeyed(spark, c,
      b(300, 3, 2L, 200.0).withColumn("del", lit(false)), "k", 4,
      seqCol = Some("seq"), deleteCol = Some("del")) // late replay
    assert(asMap(M.readKeyed(spark, c))(3L) == ((500.0, 5L)),
      "the CoW stored-seq guard must keep the newer row")
  }

  test("keyedChanges over a seq table diffs RESOLVED rows; a late old event is an empty changelog") {
    val a = tmp("seq_chg")
    val n = 2000
    M.writeKeyed(base(n), a, "k", 4) // v1
    // newest first (seq 3), then an older batch (seq 1)
    M.appendDeltaKeyedCols(spark, a, b(n, 7, 3L, 300.0), Seq("k"), 4,
      seqCol = Some("seq")) // v2
    M.appendDeltaKeyedCols(spark, a, b(n, 3, 1L, 100.0), Seq("k"), 4) // v3
    def chg(f: Int, t: Int) = M.keyedChanges(spark, a, f, t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(chg(1, 2) == (0L until n by 7).map((_, "changed")).toSet)
    // the seq-1 batch surfaces ONLY where it actually won: k%3==0
    // minus the keys whose stored seq-3 row outranks it
    assert(chg(2, 3) == (0L until n by 3).filter(_ % 7 != 0)
      .map((_, "changed")).toSet)
    // a LATE OLD event for a key holding a newer row: the snapshot is
    // unchanged, so the changelog between those versions is EMPTY
    M.appendDeltaKeyedCols(spark, a,
      spark.range(7, 8).select(col("id").as("k"), lit(-1.0).as("v"),
        lit(2L).as("seq")), Seq("k"), 4) // v4 (key 7 holds seq 3)
    assert(chg(3, 4).isEmpty,
      "a losing late event must produce no change rows")
  }

  test("bounded CDC initial load over a seq table emits the RESOLVED snapshot (no resurrection)") {
    val S = graft.streaming.Streams
    val a = tmp("seq_bnd")
    val n = 1200
    M.writeKeyed(base(n), a, "k", 4)
    // tombstones arrive FIRST (seq 4); an OLDER update (seq 2) lands
    // after them — a chain-order reader would RESURRECT the k%45==0
    // keys; max-seq-wins must keep them dead in every initial chunk
    val tomb = spark.range(0, n).filter(col("id") % 9 === 0)
      .select(col("id").as("k"), lit(4L).as("seq"))
    M.appendDeltaKeyedCols(spark, a,
      spark.range(0).select(col("id").as("k"), lit(0.0).as("v"),
        lit(5L).as("seq")),
      Seq("k"), 4, tombstoneKeys = Some(tomb), seqCol = Some("seq"))
    M.appendDeltaKeyedCols(spark, a, b(n, 5, 2L, 200.0), Seq("k"), 4)
    val cur = M.registeredCursorPath(a, "bseq")
    var keys = Set.empty[Long]
    var batches = 0
    while (S.tailKeyedChangesBounded(spark, a, cur,
      initialBuckets = 1) { df =>
      batches += 1
      assert(df.select("status").distinct().collect()
        .forall(_.getString(0) == "added"))
      keys ++= df.select("k").collect().map(_.getLong(0))
    }) ()
    val expected = (0L until n).filterNot(_ % 9 == 0).toSet
    assert(keys == expected,
      s"resolved initial load must exclude dead keys; " +
        s"extra=${(keys -- expected).take(5)} " +
        s"missing=${(expected -- keys).take(5)}")
    assert(batches == 4, s"one chunk per live bucket: $batches")
  }

  test("incremental MV refresh over a seq base: out-of-order commits fold exactly; a late old event never regresses the view") {
    val MV = graft.sources.MatView
    val a = tmp("seq_mvb"); val m = tmp("seq_mvs")
    val n = 2000
    val g = (col("id") % 13).as("g")
    def gb(m0: Int, seq: Long, v: Double) =
      spark.range(0, n).filter(col("id") % m0 === 0).select(
        col("id").as("k"), g, lit(v).as("v"), lit(seq).as("seq"))
    M.writeKeyed(spark.range(0, n).select(col("id").as("k"), g,
      (col("id") % 31).cast("double").as("v"), lit(0L).as("seq")),
      a, "k", 4)
    MV.buildMv(spark, a, m, Seq("g"), Seq("v"), 4, floatSums = true)
    M.appendDeltaKeyedCols(spark, a, gb(7, 3L, 300.0), Seq("k"), 4,
      seqCol = Some("seq"))
    MV.refreshMvIncremental(spark, m)
    M.appendDeltaKeyedCols(spark, a, gb(3, 1L, 100.0), Seq("k"), 4)
    MV.refreshMvIncremental(spark, m)
    // the view equals the scan plan over the RESOLVED snapshot
    def scanAgg() = M.readKeyed(spark, a).groupBy("g")
      .agg(F.count(lit(1)).as("n"),
        F.sum(col("v").cast("decimal(28,2)")).cast("double").as("total"))
    def viewAgg() = MV.readMv(spark, m).select("g", "n", "total")
    assert(M.diff(viewAgg(), scanAgg(), Seq("g"))
      .filter(col("status") =!= "same").count() == 0)
    // LATE OLD EVENT between refreshes: the resolved snapshot is
    // unchanged, so the refresh must be a VIEW no-op (replace
    // semantics re-aggregate the touched bucket to the same rows)
    val before = viewAgg().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    M.appendDeltaKeyedCols(spark, a,
      spark.range(7, 8).select(col("id").as("k"), g, lit(-1.0).as("v"),
        lit(2L).as("seq")), Seq("k"), 4)
    MV.refreshMvIncremental(spark, m)
    val after = viewAgg().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after == before, "a losing late event must not move the view")
    // and the watermark DID advance (the no-op was a real refresh)
    assert(MV.list().find(_.mvDir == m).get.baseVersion ==
      M.manifestVersions(spark, a).last)
  }
}
