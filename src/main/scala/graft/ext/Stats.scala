package graft.ext

import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.DoubleType
import graft.functions.PF

/** Columnar statistics beyond single aggregates: pairwise correlation
  * matrices and equi-width histograms — the profiling pass a feature
  * pipeline runs before modeling. No reference counterpart beyond
  * per-pair `corr` (which q58 mirrors); these are the multi-column
  * one-pass versions.
  */
object Stats {

  /** Pearson correlation for every pair of `cols`, computed in ONE
    * aggregate over ONE scan — k·(k−1)/2 dcorr expressions share the
    * same partial-aggregation pass, so the cost is one shuffle of a
    * single combine row regardless of how many pairs there are (the
    * naive per-pair loop would scan the table k·(k−1)/2 times). All
    * sums are exact decimals (PF.dcorr), deterministic under any
    * partitioning. Output long: (pair, corr), pair = "x__y".
    */
  def corrMatrix(df: DataFrame, cols: Seq[String],
                 roundTo: Int = 8): DataFrame = {
    require(cols.size >= 2, "corrMatrix: need at least two columns")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (x, y) =>
      F.round(PF.dcorr(col(x), col(y)), roundTo).as(s"${x}__$y")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    Reshape.unpivot(wide, Seq.empty,
      pairs.map { case (x, y) => s"${x}__$y" }, "pair", "corr")
  }

  /** Per-group ordinary-least-squares fit y = slope·x + intercept,
    * plus r², in ONE aggregate over ONE scan. The five co-moments
    * (Σx, Σy, Σxy, Σx², Σy²) accumulate as EXACT decimals (scaled
    * integers — associative, partial-agg safe, identical in any
    * engine), then one fixed-order IEEE formula per group; degenerate
    * groups (zero x-variance, or n < 2) yield NULLs, never
    * Inf/NaN. Rounded to `roundTo` decimals for cross-engine
    * repr-stability of the final few ulps.
    *
    * Scale shape: map-side partial sums → one combine row per group —
    * the same single-shuffle profile as any groupBy sum; regression
    * over 100 TB costs exactly one aggregated pass.
    */
  def linfit(df: DataFrame, keyCols: Seq[String], xCol: String,
             yCol: String, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dx = col(xCol).cast(DecimalType(18, 2))
    val dy = col(yCol).cast(DecimalType(18, 2))
    // only complete (x, y) observations: without this, count(1) would
    // include rows the null-skipping sums exclude and every co-moment
    // would silently mix denominators
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(keyCols.map(col): _*).agg(
      F.count(lit(1)).cast(DoubleType).as("__n"),
      F.sum(dx).cast(DoubleType).as("__sx"),
      F.sum(dy).cast(DoubleType).as("__sy"),
      F.sum((dx * dy).cast(DecimalType(38, 4))).cast(DoubleType).as("__sxy"),
      F.sum((dx * dx).cast(DecimalType(38, 4))).cast(DoubleType).as("__sxx"),
      F.sum((dy * dy).cast(DecimalType(38, 4))).cast(DoubleType).as("__syy"))
    // fixed-order IEEE arithmetic over the exact co-moments: written
    // once here and mirrored token-for-token in oracle SQL
    val cxy = col("__sxy") - col("__sx") * col("__sy") / col("__n")
    val vx = col("__sxx") - col("__sx") * col("__sx") / col("__n")
    val vy = col("__syy") - col("__sy") * col("__sy") / col("__n")
    val slope = F.when(col("__n") < 2 || vx === 0.0, lit(null))
      .otherwise(cxy / vx)
    base.select(keyCols.map(col) ++ Seq(
      col("__n").cast("long").as("n"),
      F.round(slope, roundTo).as("slope"),
      F.round(F.when(col("__n") < 2 || vx === 0.0, lit(null))
        .otherwise(col("__sy") / col("__n") -
          (cxy / vx) * (col("__sx") / col("__n"))), roundTo).as("intercept"),
      F.round(F.when(col("__n") < 2 || vx === 0.0 || vy === 0.0, lit(null))
        .otherwise(cxy * cxy / (vx * vy)), roundTo).as("r2")): _*)
  }

  /** One-pass table profile: per column — row count, nulls, distinct
    * count, min and max (rendered as strings so every column type
    * fits one output schema). The whole profile is ONE logical
    * aggregate over ONE scan.
    *
    * Exact mode plans the multiple exact count-distincts via a single
    * Expand — one duplication of the input per profiled column before
    * the shuffle, the standard exact plan but the one genuinely
    * expensive stat at 100 TB. `approx = true` swaps each distinct for
    * the native md5-HLL register aggregate (graft_hll_regs): NO
    * Expand, no input duplication, a 2^p-byte buffer per column, and
    * the estimate stays cross-engine deterministic (same rounded value
    * a DuckDB oracle computes — unlike approx_count_distinct's
    * xxhash sketch). n_distinct is a double in approx mode.
    * Output long: (col_name, n, nulls, n_distinct, min_s, max_s).
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil,
              approx: Boolean = false, p: Int = 12): DataFrame = {
    val use = if (cols.nonEmpty) cols else df.columns.toSeq
    require(use.nonEmpty, "profile: no columns")
    val aggs = use.flatMap { c =>
      Seq(F.count(col(c)).as(s"__cnt_$c"),
        (if (approx) graft.plans.HllRegs.approxDistinctMd5(col(c), p)
         else F.count_distinct(col(c))).as(s"__nd_$c"),
        F.min(col(c)).cast("string").as(s"__mn_$c"),
        F.max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ F.count(lit(1)).as("__rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = use.map { c =>
      F.named_struct(lit("col_name"), lit(c),
        lit("n"), col("__rows"),
        lit("nulls"), col("__rows") - col(s"__cnt_$c"),
        lit("n_distinct"), col(s"__nd_$c"),
        lit("min_s"), col(s"__mn_$c"),
        lit("max_s"), col(s"__mx_$c"))
    }
    wide.select(F.explode(F.array(entries: _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.n").as("n"),
        col("p.nulls").as("nulls"),
        col("p.n_distinct").as("n_distinct"),
        col("p.min_s").as("min_s"), col("p.max_s").as("max_s"))
  }

  /** Flag rows whose `valCol` sits more than `z` sample standard
    * deviations from their group's mean — the filter-the-outliers
    * pass before training or reporting. Two passes by necessity
    * (the stats must exist before the comparison), but the stats
    * table is group-grain and broadcast back into the scan-shaped
    * probe; mean and stddev come from exact decimal sums (PF), so
    * the flag is deterministic under any partitioning. Groups with
    * fewer than 2 rows have no sample stddev and are never flagged.
    */
  def anomalies(df: DataFrame, keyCols: Seq[String], valCol: String,
                z: Double): DataFrame = {
    require(keyCols.nonEmpty, "anomalies: need at least one key column")
    require(z > 0, s"anomalies: z must be positive, got $z")
    val stats = df.groupBy(keyCols.map(col): _*)
      .agg(PF.davg(col(valCol)).as("__mean"),
        PF.dstddev(col(valCol)).as("__sd"),
        F.count(col(valCol)).as("__n"))
    df.join(F.broadcast(stats), keyCols)
      .filter(col("__n") >= 2 &&
        F.abs(col(valCol) - col("__mean")) > lit(z) * col("__sd"))
      .drop("__mean", "__sd", "__n")
  }

  /** Equi-width histogram of `c` into `nbins` buckets between the
    * column's min and max (both included; the max lands in the last
    * bin). Two jobs by necessity — bounds cannot be known before
    * assignment — but the bounds job reduces to ONE row (index-build
    * grain) and the counting pass is a partial-agg groupBy on a
    * ≤ nbins-value key: one scan, one tiny shuffle. NULLs are
    * excluded (they have no position on the axis).
    *
    * All bin arithmetic is plain IEEE double in a fixed evaluation
    * order — width = (max−min)/nbins, bin = floor((v−min)/width) —
    * so any engine reproducing the same order reproduces the exact
    * same bin boundaries, including ties ON a boundary.
    *
    * Output: (bin, lo, hi, n) for non-empty bins.
    */
  def histogram(df: DataFrame, c: String, nbins: Int): DataFrame = {
    require(nbins >= 1, s"histogram: nbins must be >= 1, got $nbins")
    val bounds = df.agg(F.min(col(c)).cast(DoubleType),
      F.max(col(c)).cast(DoubleType)).head()
    if (bounds.isNullAt(0)) {
      // all-NULL (or empty) input: an empty histogram, typed
      return df.sparkSession.emptyDataFrame
        .select(lit(0L).as("bin"), lit(0.0).as("lo"), lit(0.0).as("hi"),
          lit(0L).as("n"))
        .limit(0)
    }
    val (mn, mx) = (bounds.getDouble(0), bounds.getDouble(1))
    val w = (mx - mn) / nbins
    val bin =
      if (w == 0.0) lit(0L) // degenerate single-value column
      else F.least(
        F.floor((col(c).cast(DoubleType) - lit(mn)) / lit(w)),
        lit(nbins - 1L))
    df.filter(col(c).isNotNull)
      .select(bin.as("bin"))
      .groupBy("bin")
      .agg(F.count(lit(1)).as("n"))
      .select(col("bin"), (lit(mn) + col("bin") * lit(w)).as("lo"),
        (lit(mn) + (col("bin") + 1) * lit(w)).as("hi"), col("n"))
  }
}
