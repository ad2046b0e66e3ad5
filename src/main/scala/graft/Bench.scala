package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * A warmup action runs first so the timings measure query execution,
  * not JVM/codegen/classloading warmup (~10s on first action
  * otherwise).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Force FULL evaluation: a noop-format write materializes every
    // output column (count() would let Catalyst prune unreferenced
    // projections, so projection-heavy queries would measure scan+count
    // instead of the claimed expression work).
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Between queries, drop cached blocks left by materialization points
    // (localCheckpoint) inside the finished query. Without this the
    // blocks of every prior query stay pinned in storage memory, and
    // late queries in the run measure GC/eviction pressure instead of
    // their own work (observed: 4.6s -> 33s for the same query).
    // BLOCKING unpersist: cleanup runs outside the timed window, and an
    // async drop lets the next query race gigabytes of still-evicting
    // checkpoint blocks for storage memory (observed: the 300k-doc
    // near-dup probe 10s solo -> 52s downstream of the ANN probes).
    def cleanup(): Unit = {
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }

    // Warmup: exercise scan + shuffle + join + codegen paths once.
    try {
      run(SparkEntry.queries("q06_join_auto"))
      run(SparkEntry.queries("q03_groupby_agg"))
    } catch { case _: Throwable => () }

    // Optional comma-separated name filter for isolating single queries.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val picked = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }

    // Median-of-N per query (default 3): single-shot cold timings on a
    // 32-core local JVM swing up to 4× on an unchanged query (GC, OS
    // cache, compilation), which has false-flagged regressions before.
    // The cache is cleared between reps, so each rep stays cold-cache;
    // the median drops the one-off outliers.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val results = picked.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { run(fn); true } catch { case _: Throwable => false }
        val elapsed = (System.nanoTime() - t0) / 1e9
        cleanup()
        (elapsed, ok)
      }
      val sorted = times.map(_._1).sorted
      val median = sorted((reps - 1) / 2)
      (name, median, sorted.head, sorted.last, times.forall(_._2))
    }
    // Failed queries report value -1 (never a tiny elapsed time that
    // would read as a speedup) and are listed in "failed".
    val qs = results.map { case (k, v, _, _, ok) => "\"" + k + "\":" + (if (ok) v else -1) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, _, _, true) => v }.sum
    // Per-query [min,max] across the reps: single-JVM timings on a
    // shared host swing several-fold on unchanged code, and the spread
    // is what separates a real regression from scheduler noise when
    // rounds are compared.
    val spread = results.collect { case (k, _, lo, hi, true) =>
      // Locale.ROOT: a comma-decimal default locale would corrupt the
      // JSON line
      "\"" + k + "\":[" +
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(lo)) + "," +
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(hi)) + "]"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"spread":$spread,"sf":"$sfDir"}""")
    spark.stop()
  }
}
