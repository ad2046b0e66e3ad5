package graft

import org.apache.spark.sql.functions.{col, lit}

/** Cross-table commit groups (atomic version pinning across tables)
  * and the vacuum/CDC-cursor retention coupling.
  */
class GroupSpec extends SparkSpec {
  private val M = graft.sources.Maintenance

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def one(k: Long, v: Double) =
    spark.range(k, k + 1).select(col("id").as("k"), lit(v).as("v"))

  test("read_group serves the pinned version until the group is re-published") {
    val a = tmp("grp_a"); val b = tmp("grp_b"); val g = tmp("grp_g")
    M.writeKeyed(one(0, 1.0), a, "k", 2)
    M.writeKeyed(one(0, 10.0), b, "k", 2)
    M.commitGroup(spark, g, Map(a -> 1, b -> 1))
    M.upsertKeyed(spark, a, one(0, 2.0), "k", 2) // a@v2, group still pins v1
    assert(M.readGroup(spark, g, a).head.getDouble(1) == 1.0,
      "group reader must see the pinned v1, not a's latest")
    assert(M.readGroup(spark, g, b).head.getDouble(1) == 10.0)
    // re-pin a only: b carries forward
    M.commitGroup(spark, g, Map(a -> 2))
    assert(M.readGroup(spark, g, a).head.getDouble(1) == 2.0)
    assert(M.groupPins(spark, g) == Map(a -> 2, b -> 1))
    // old GROUP versions time-travel too: v1 of the group still pins
    // a@v1
    assert(M.readGroup(spark, g, a, version = Some(1))
      .head.getDouble(1) == 1.0)
    intercept[IllegalArgumentException] {
      M.readGroup(spark, g, tmp("grp_x")) // unpinned member
    }
  }

  test("4-writer 2-table hammer: readers only ever see atomically published pin pairs") {
    val a = tmp("grp_ha"); val b = tmp("grp_hb"); val g = tmp("grp_hg")
    M.writeKeyed(one(0, 0.0), a, "k", 2)
    M.writeKeyed(one(0, 0.0), b, "k", 2)
    M.commitGroup(spark, g, Map(a -> 1, b -> 1))
    val published = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Int, Int)]()
    published.add((1, 1))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writers = (1 to 4).map { w =>
      new Thread(() => {
        try {
          for (r <- 1 to 3) {
            M.upsertKeyed(spark, a, one(0, w * 100.0 + r), "k", 2)
            M.upsertKeyed(spark, b, one(0, w * 100.0 + r), "k", 2)
            val va = M.readManifest(spark, a).version
            val vb = M.readManifest(spark, b).version
            // record BEFORE publishing: a reader may observe the group
            // the instant the hard link lands
            published.add((va, vb))
            M.commitGroup(spark, g, Map(a -> va, b -> vb))
          }
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    @volatile var stop = false
    val reader = new Thread(() => {
      try {
        while (!stop) {
          val pins = M.groupPins(spark, g)
          val pair = (pins(a), pins(b))
          if (!published.contains(pair))
            throw new AssertionError(s"unpublished pin pair $pair")
          // and the pinned snapshots must RESOLVE (no vacuumed holes)
          M.readGroup(spark, g, a).count()
        }
      } catch { case t: Throwable => errs.add(t) }
    })
    reader.start(); writers.foreach(_.start()); writers.foreach(_.join())
    stop = true; reader.join()
    assert(errs.isEmpty, s"hammer errors: ${errs.toArray.mkString("; ")}")
    // the final group resolves to the final tables
    val pins = M.groupPins(spark, g)
    assert(pins(a) == M.readManifest(spark, a).version)
    assert(pins(b) == M.readManifest(spark, b).version)
  }

  test("bounded CDC initial load: chunks cover the pinned snapshot; diffs resume from it") {
    val dir = tmp("grp_init")
    val S = graft.streaming.Streams
    val b = spark.range(0, 2000).select(col("id").as("k"),
      (col("id") % 7).cast("double").as("v"))
    M.writeKeyed(b, dir, "k", 8)
    val cur = M.registeredCursorPath(dir, "init")
    var keys = Set.empty[Long]
    var polls = 0
    def chunkPoll(): Boolean =
      S.tailKeyedChangesBounded(spark, dir, cur, initialBuckets = 3) { df =>
        assert(df.inputFiles.length <= 3,
          s"chunk read ${df.inputFiles.length} files — not bounded")
        assert(df.select("status").distinct().collect()
          .map(_.getString(0)).toSeq == Seq("added"))
        keys ++= df.select("k").collect().map(_.getLong(0))
        polls += 1
      }
    assert(chunkPoll())
    // a writer commits v2 MID-INITIAL — the remaining chunks must keep
    // reading the pinned v1 snapshot (no duplicates, no new keys), and
    // the registered mid-initial cursor pins v1 against vacuum
    M.upsertKeyed(spark, dir,
      spark.range(500000000L, 500000100L).select(col("id").as("k"),
        lit(1.0).as("v")), "k", 8)
    M.vacuumKeyed(spark, dir, keepVersions = 1, graceMs = 0L)
    assert(M.manifestVersions(spark, dir).contains(1),
      "vacuum dropped the snapshot a mid-initial cursor is pinned to")
    assert(chunkPoll() && chunkPoll())
    assert(polls == 3, s"8 buckets / 3 per poll must be 3 chunks: $polls")
    assert(keys == (0L until 2000L).toSet,
      "chunked initial load must cover exactly the pinned snapshot")
    // the next poll switches to the diff path from v1 → latest and
    // emits exactly the mid-initial commit
    assert(S.tailKeyedChangesBounded(spark, dir, cur) { df =>
      val rows = df.collect()
      assert(rows.length == 100 &&
        rows.forall(_.getString(1) == "added"))
    })
    assert(!S.tailKeyedChangesBounded(spark, dir, cur)(_ => ()),
      "up-to-date consumer must not see a batch")
  }

  test("vacuum retains the versions a registered cursor still needs; force drops them") {
    val dir = tmp("grp_vac")
    val S = graft.streaming.Streams
    M.writeKeyed(one(0, 1.0), dir, "k", 2)
    (2 to 6).foreach(v => M.upsertKeyed(spark, dir, one(0, v.toDouble),
      "k", 2)) // versions 1..6
    // a consumer registered under <dir>/_cursors/ read up to v2
    val cur = M.registeredCursorPath(dir, "c1")
    S.commitChangeCursor(spark, cur, 2)
    M.vacuumKeyed(spark, dir, keepVersions = 1, graceMs = 0L)
    val vs = M.manifestVersions(spark, dir)
    assert(vs == (2 to 6), s"cursor floor ignored: $vs")
    // the consumer catches up fine across the retained range
    assert(S.pollKeyedChanges(spark, dir, cur).exists(_._3 == 6))
    // an UNREGISTERED cursor elsewhere gets no protection; and force
    // overrides registration — the consumer then fails loudly
    M.vacuumKeyed(spark, dir, keepVersions = 1, graceMs = 0L, force = true)
    assert(M.manifestVersions(spark, dir) == Seq(6))
    S.commitChangeCursor(spark, cur, 3)
    intercept[Exception] { S.pollKeyedChanges(spark, dir, cur) }
  }

  test("vacuum retains versions a LIVE commit group pins; force still drops") {
    val a = tmp("grp_pa"); val g = tmp("grp_pg")
    M.writeKeyed(one(0, 1.0), a, "k", 2)
    (2 to 6).foreach(v => M.upsertKeyed(spark, a, one(0, v.toDouble),
      "k", 2)) // versions 1..6
    M.commitGroup(spark, g, Map(a -> 3))
    M.vacuumKeyed(spark, a, keepVersions = 1, graceMs = 0L)
    val vs = M.manifestVersions(spark, a)
    assert(vs == (3 to 6), s"group pin ignored by vacuum: $vs")
    // the pinned read still resolves after the vacuum
    assert(M.readGroup(spark, g, a).head.getDouble(1) == 3.0)
    // OLD group versions pin too: the floor is the min across the
    // group's whole manifest chain
    M.commitGroup(spark, g, Map(a -> 6))
    M.vacuumKeyed(spark, a, keepVersions = 1, graceMs = 0L)
    assert(M.manifestVersions(spark, a) == (3 to 6),
      "group v1's older pin must keep its floor until the group " +
        "version itself is gone")
    // a DELETED group stops constraining (its pointer is ignored)
    val fs = new org.apache.hadoop.fs.Path(g)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(g), true)
    M.vacuumKeyed(spark, a, keepVersions = 1, graceMs = 0L)
    assert(M.manifestVersions(spark, a) == Seq(6))
    // force overrides pins: readGroup then fails loudly (pre-r12
    // behavior, now opt-in)
    val b = tmp("grp_pb"); val g2 = tmp("grp_pg2")
    M.writeKeyed(one(0, 1.0), b, "k", 2)
    M.upsertKeyed(spark, b, one(0, 2.0), "k", 2)
    M.commitGroup(spark, g2, Map(b -> 1))
    M.vacuumKeyed(spark, b, keepVersions = 1, graceMs = 0L, force = true)
    intercept[Exception] { M.readGroup(spark, g2, b).collect() }
  }

  test("group retention: keepVersions prunes old pin sets so member floors relax") {
    val a = tmp("grp_ka"); val g = tmp("grp_kg")
    M.writeKeyed(one(0, 1.0), a, "k", 2)
    (2 to 6).foreach(v => M.upsertKeyed(spark, a, one(0, v.toDouble),
      "k", 2)) // versions 1..6
    M.commitGroup(spark, g, Map(a -> 2))
    // re-publishing WITH the keep policy drops group v1 — its old pin
    // stops flooring member vacuum (the r12 accumulation gap)
    M.commitGroup(spark, g, Map(a -> 5), keepVersions = 1)
    // the drop respects the default grace window... with graceMs=0 via
    // the explicit face (commitGroup uses the default; prune again)
    M.vacuumGroup(spark, g, keepVersions = 1, graceMs = 0L)
    assert(M.manifestVersions(spark, g) == Seq(2),
      s"group manifests must prune: ${M.manifestVersions(spark, g)}")
    M.vacuumKeyed(spark, a, keepVersions = 1, graceMs = 0L)
    assert(M.manifestVersions(spark, a) == (5 to 6),
      "only the surviving group version's pin may floor the member")
    assert(M.readGroup(spark, g, a).head.getDouble(1) == 5.0)
    // time travel to the pruned group version fails loudly
    intercept[Exception] {
      M.readGroup(spark, g, a, version = Some(1)).collect()
    }
  }

  test("dropGroup sweeps member pointers; vacuum sweeps dead-group pointers") {
    val a = tmp("grp_da"); val g = tmp("grp_dg")
    M.writeKeyed(one(0, 1.0), a, "k", 2)
    (2 to 4).foreach(v => M.upsertKeyed(spark, a, one(0, v.toDouble),
      "k", 2))
    M.commitGroup(spark, g, Map(a -> 2))
    val gp = new org.apache.hadoop.fs.Path(M.registeredGroupPath(a, g))
    val fs = gp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(gp), "commitGroup must register the pointer")
    M.dropGroup(spark, g)
    assert(!fs.exists(gp), "dropGroup must sweep the member pointer")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(g)))
    M.vacuumKeyed(spark, a, keepVersions = 1, graceMs = 0L)
    assert(M.manifestVersions(spark, a) == Seq(4),
      "a dropped group must stop constraining member vacuum")
    // a pointer whose group dir was deleted OUT OF BAND (no dropGroup)
    // is swept by the member's own vacuum pass
    val g2 = tmp("grp_dg2")
    M.commitGroup(spark, g2, Map(a -> 4))
    val gp2 = new org.apache.hadoop.fs.Path(M.registeredGroupPath(a, g2))
    assert(fs.exists(gp2))
    fs.delete(new org.apache.hadoop.fs.Path(g2), true)
    M.vacuumKeyed(spark, a, keepVersions = 1, graceMs = 0L)
    assert(!fs.exists(gp2),
      "vacuum must sweep pointers whose group is gone")
  }

  test("unregisterCursor: a decommissioned consumer stops flooring vacuum") {
    val dir = tmp("grp_uc")
    val S = graft.streaming.Streams
    M.writeKeyed(one(0, 1.0), dir, "k", 2)
    (2 to 5).foreach(v => M.upsertKeyed(spark, dir, one(0, v.toDouble),
      "k", 2))
    S.commitChangeCursor(spark, M.registeredCursorPath(dir, "dead"), 2)
    M.vacuumKeyed(spark, dir, keepVersions = 1, graceMs = 0L)
    assert(M.manifestVersions(spark, dir) == (2 to 5))
    M.unregisterCursor(spark, dir, "dead")
    M.vacuumKeyed(spark, dir, keepVersions = 1, graceMs = 0L)
    assert(M.manifestVersions(spark, dir) == Seq(5),
      "an unregistered cursor must stop flooring vacuum")
  }
}
