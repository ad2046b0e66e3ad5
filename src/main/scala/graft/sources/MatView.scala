package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Materialized-view ROUTING: serve a grouped aggregate over a keyed
  * table from its registered, FRESH bucketed agg state instead of
  * scanning the base — the reference's compile-and-cache idea
  * (reference: preql/core/evaluate.py:612-638 caches compiled queries)
  * applied to STORAGE, and the same automatic-rewrite contract as a
  * warehouse's materialized views.
  *
  * The registry maps a BASE table dir to its maintained agg states
  * (dir + measures + a base-version WATERMARK). A language group-by
  * over the pristine `read_keyed` snapshot whose keys and aggregates
  * are covered routes onto the state (O(groups) rows read, the base's
  * files never open); anything not covered — or a STALE view (the
  * base's manifest version moved past the watermark) — falls back to
  * the scan plan. Routing never guesses: stale, partial, or
  * type-unroutable views answer from the base.
  *
  * Scale: this is the difference between a dashboard group-by costing
  * O(state) (a few thousand rows) and O(100 TB) — the state is
  * maintained incrementally (`mergeAggStateKeyed`, cost ∝ batch), so
  * the full scan is paid ONCE at build, never per query.
  */
object MatView {

  /** A registered view: `mvDir` holds the bucketed agg state
    * (resolve=agg), `baseDir` the keyed table it summarizes,
    * `keys`/`valueCols` its grain, `baseVersion` the base-manifest
    * watermark the state covers. The keys come from the STATE's own
    * manifest (never a caller guess).
    */
  final case class MvDef(mvDir: String, baseDir: String,
                         keys: Seq[String], valueCols: Seq[String],
                         baseVersion: Int,
                         distinctKey: Option[String] = None,
                         aggP: Int = 12)

  // session-scoped, like the catalog: a registry entry is a ROUTING
  // HINT, not data — the state itself is durable on disk
  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  private def clean(d: String): String = d.replaceAll("/+$", "")

  /** Register the agg state at `mvDir` as a materialized view of
    * `baseDir`, watermarked at the base's CURRENT manifest version.
    * Validates against the state's own manifest: it must be a bucketed
    * agg state, and its schema must carry every declared measure's
    * state columns (single measure = the unsuffixed classic names).
    */
  def register(spark: SparkSession, mvDir: String, baseDir: String,
               valueCols: Seq[String],
               distinctKey: Option[String] = None): MvDef = {
    require(valueCols.nonEmpty, "register: no measure columns")
    val mv = clean(mvDir); val base = clean(baseDir)
    val m = Maintenance.readManifest(spark, mv)
    require(m.resolve == "agg" && m.nBuckets > 0,
      s"$mv is not a bucketed agg state (resolve='${m.resolve}')")
    require(m.schemaDdl.nonEmpty, s"$mv records no schema (pre-r9 state)")
    val cols = StructType.fromDDL(m.schemaDdl).fieldNames.toSet
    val sfx: String => String =
      c => if (valueCols.length == 1) "" else s"_$c"
    valueCols.foreach(c => require(cols.contains(s"__sum${sfx(c)}"),
      s"$mv does not track measure '$c' (missing __sum${sfx(c)})"))
    // the declared distinct column must actually feed the state's HLL
    // registers — routing approx_count_distinct(c) for a c the
    // registers don't track would be a silent wrong answer
    distinctKey.foreach(_ => require(cols.contains("__regs"),
      s"$mv tracks no HLL registers — build with distinctKey first"))
    val baseV = Maintenance.manifestVersions(spark, base).lastOption
      .getOrElse(throw new IllegalArgumentException(
        s"$base has no keyed-table manifest"))
    val d = MvDef(mv, base, m.keyCols, valueCols, baseV, distinctKey,
      if (m.aggP > 0) m.aggP else 12)
    reg.put(mv, d)
    d
  }

  /** Re-arm the watermark after a refresh: the caller merged the
    * base's changes into the state, so the view now covers the base's
    * CURRENT version. Call it with the refresh, not before.
    */
  def refreshed(spark: SparkSession, mvDir: String): MvDef = {
    val mv = clean(mvDir)
    val d = Option(reg.get(mv)).getOrElse(throw new IllegalArgumentException(
      s"$mv is not a registered materialized view"))
    val baseV = Maintenance.manifestVersions(spark, d.baseDir).last
    val nd = d.copy(baseVersion = baseV)
    reg.put(mv, nd)
    nd
  }

  /** Make a stale view fresh again in ONE call: rebuild the state from
    * the base's CURRENT snapshot (the registration remembers grain,
    * measures, distinct column, and the state's bucket/p/sample
    * settings) and re-arm the watermark. This is the fallback refresh —
    * a caller who knows the change batch folds it incrementally with
    * `mergeAggStateKeyed` + `refreshed` instead (cost ∝ batch, not
    * base). Returns the re-armed definition.
    */
  def rebuildMv(spark: SparkSession, mvDir: String): MvDef = {
    val mv = clean(mvDir)
    val d = Option(reg.get(mv)).getOrElse(throw new IllegalArgumentException(
      s"$mv is not a registered materialized view"))
    val m = Maintenance.readManifest(spark, mv)
    Maintenance.buildAggStateKeyedCols(
      Maintenance.readKeyed(spark, d.baseDir), mv, d.keys, d.valueCols,
      m.nBuckets, distinctKey = d.distinctKey,
      p = if (m.aggP > 0) m.aggP else 12,
      sampleK = math.max(m.aggK, 0))
    refreshed(spark, mv)
  }

  def unregister(mvDir: String): Unit = reg.remove(clean(mvDir))
  def clear(): Unit = reg.clear()

  /** Every registered view (registry listing, mvDir order). */
  def list(): Seq[MvDef] = {
    import scala.jdk.CollectionConverters._
    reg.values.asScala.toSeq.sortBy(_.mvDir)
  }

  /** The views registered over `baseDir`. */
  def forBase(baseDir: String): Seq[MvDef] = {
    val b = clean(baseDir)
    import scala.jdk.CollectionConverters._
    reg.values.asScala.filter(_.baseDir == b).toSeq.sortBy(_.mvDir)
  }

  /** Try to serve `SELECT keys, aggs FROM read_keyed(baseDir) GROUP BY
    * keys` from a registered view. `keys` = (output name, base column);
    * `aggs` = (output name, op, measure) with op ∈ count (row count,
    * no measure), countv (non-null count), sum, mean, min, max.
    * Returns None — never a wrong answer — when no registered view is
    * FRESH (base version == watermark), grain-matched (key SET equal),
    * and measure-covering (every agg's measure tracked, with the state
    * columns its op needs; `sum` additionally requires an
    * integral/floating measure so the routed column can be cast back
    * to the scan plan's result type).
    */
  /** The operational kill switch: set the session conf
    * `spark.graft.mv.routing=false` to force every query back onto
    * the scan plan without touching registrations — the first thing
    * to flip when triaging a suspected wrong answer.
    */
  private def routingEnabled(spark: SparkSession): Boolean =
    spark.conf.get("spark.graft.mv.routing", "true").toBoolean

  def route(spark: SparkSession, baseDir: String,
            keys: Seq[(String, String)],
            aggs: Seq[(String, String, Option[String])])
      : Option[DataFrame] = {
    if (!routingEnabled(spark)) return None
    val outNames = keys.map(_._1) ++ aggs.map(_._1)
    if (outNames.distinct.length != outNames.length) return None
    if (keys.isEmpty || aggs.isEmpty) return None
    val curBase = Maintenance.manifestVersions(spark, clean(baseDir))
      .lastOption.getOrElse(return None)
    forBase(baseDir).iterator
      .filter(_.baseVersion == curBase) // fresh
      .filter(_.keys.toSet == keys.map(_._2).toSet) // grain
      .map(d => tryBuild(spark, d, keys, aggs))
      .collectFirst { case Some(df) => df }
  }

  /** GLOBAL-aggregation route: `SELECT aggs FROM read_keyed(baseDir)`
    * (no GROUP BY). Any fresh registered view over the base serves it
    * REGARDLESS of its grain — a global aggregate is the fold of the
    * per-key states (every state column is associative), so the plan
    * becomes one tiny aggregate over O(groups) state rows instead of
    * the base scan. Same op coverage and never-a-guess rules as
    * `route`; `approx_count_distinct` folds the registers
    * (`unionState`) before the same estimate, so it stays
    * bit-identical to the scan plan.
    */
  def routeGlobal(spark: SparkSession, baseDir: String,
                  aggs: Seq[(String, String, Option[String])])
      : Option[DataFrame] = {
    if (!routingEnabled(spark)) return None
    val outNames = aggs.map(_._1)
    if (aggs.isEmpty || outNames.distinct.length != outNames.length)
      return None
    val curBase = Maintenance.manifestVersions(spark, clean(baseDir))
      .lastOption.getOrElse(return None)
    forBase(baseDir).iterator
      .filter(_.baseVersion == curBase)
      .map(d => tryBuildGlobal(spark, d, aggs))
      .collectFirst { case Some(df) => df }
  }

  private def tryBuildGlobal(spark: SparkSession, d: MvDef,
                             aggs: Seq[(String, String, Option[String])])
      : Option[DataFrame] = {
    val st = Maintenance.readAggStateKeyed(spark, d.mvDir)
    val cols = st.columns.toSet
    val sfx: String => String =
      c => if (d.valueCols.length == 1) "" else s"_$c"
    def measure(c: Option[String]): Option[String] =
      c.filter(d.valueCols.contains)
    def sumCast(mc: String): Option[DataType] =
      st.schema.fields.find(_.name == s"__min${sfx(mc)}")
        .map(_.dataType).flatMap {
          case ByteType | ShortType | IntegerType | LongType =>
            Some(LongType)
          case FloatType | DoubleType => Some(DoubleType)
          case _ => None
        }
    val mapped: Seq[Option[Column]] = aggs.map {
      // counts coalesce to 0 like the scan plan's count() over an
      // EMPTY table (sum over zero state rows is NULL)
      case (out, "count", None) =>
        Some(F.coalesce(F.sum(F.col("__cnt")), F.lit(0L)).as(out))
      case (out, "countv", c) =>
        measure(c).filter(mc => cols.contains(s"__cnv${sfx(mc)}"))
          .map(mc => F.coalesce(F.sum(F.col(s"__cnv${sfx(mc)}")),
            F.lit(0L)).as(out))
      case (out, "sum", c) =>
        measure(c).flatMap(mc => sumCast(mc).map(t =>
          F.sum(F.col(s"__sum${sfx(mc)}")).cast(t).as(out)))
      case (out, "mean", c) =>
        measure(c).filter(mc => cols.contains(s"__cnv${sfx(mc)}"))
          .map(mc => (F.sum(F.col(s"__sum${sfx(mc)}")).cast(DoubleType) /
            F.sum(F.col(s"__cnv${sfx(mc)}"))).as(out))
      case (out, "min", c) =>
        measure(c).filter(mc => cols.contains(s"__min${sfx(mc)}"))
          .map(mc => F.min(F.col(s"__min${sfx(mc)}")).as(out))
      case (out, "max", c) =>
        measure(c).filter(mc => cols.contains(s"__max${sfx(mc)}"))
          .map(mc => F.max(F.col(s"__max${sfx(mc)}")).as(out))
      case (out, "adist", c) =>
        c.filter(d.distinctKey.contains).filter(_ => d.aggP == 12)
          .filter(_ => cols.contains("__regs"))
          .map(_ => graft.plans.HllRegs.estimate(
            graft.plans.HllRegs.unionState(F.col("__regs"), d.aggP),
            d.aggP).as(out))
      case _ => None
    }
    if (mapped.exists(_.isEmpty)) None
    else Some(st.agg(mapped.head.get, mapped.tail.map(_.get): _*))
  }

  private def tryBuild(spark: SparkSession, d: MvDef,
                       keys: Seq[(String, String)],
                       aggs: Seq[(String, String, Option[String])])
      : Option[DataFrame] = {
    val st = Maintenance.readAggStateKeyed(spark, d.mvDir)
    val cols = st.columns.toSet
    val sfx: String => String =
      c => if (d.valueCols.length == 1) "" else s"_$c"
    def measure(c: Option[String]): Option[String] =
      c.filter(d.valueCols.contains)
    // the scan plan's sum(col) keeps integral sums LONG and float
    // sums DOUBLE; the state's exact-decimal __sum casts back to
    // either losslessly below 2^53 — other measure types (decimal
    // scale arithmetic differs) stay unrouted
    def sumCast(mc: String): Option[DataType] =
      st.schema.fields.find(_.name == s"__min${sfx(mc)}")
        .map(_.dataType).flatMap {
          case ByteType | ShortType | IntegerType | LongType =>
            Some(LongType)
          case FloatType | DoubleType => Some(DoubleType)
          case _ => None
        }
    val mapped: Seq[Option[Column]] = aggs.map {
      case (out, "count", None) => Some(F.col("__cnt").as(out))
      case (out, "countv", c) =>
        measure(c).filter(mc => cols.contains(s"__cnv${sfx(mc)}"))
          .map(mc => F.col(s"__cnv${sfx(mc)}").as(out))
      case (out, "sum", c) =>
        measure(c).flatMap(mc => sumCast(mc)
          .map(t => F.col(s"__sum${sfx(mc)}").cast(t).as(out)))
      case (out, "mean", c) =>
        // avg(c) divides by the NON-NULL count — __cnv (r11 states);
        // a pre-r11 state without it cannot route mean
        measure(c).filter(mc => cols.contains(s"__cnv${sfx(mc)}"))
          .map(mc => (F.col(s"__sum${sfx(mc)}").cast(DoubleType) /
            F.col(s"__cnv${sfx(mc)}")).as(out))
      case (out, "min", c) =>
        measure(c).filter(mc => cols.contains(s"__min${sfx(mc)}"))
          .map(mc => F.col(s"__min${sfx(mc)}").as(out))
      case (out, "max", c) =>
        measure(c).filter(mc => cols.contains(s"__max${sfx(mc)}"))
          .map(mc => F.col(s"__max${sfx(mc)}").as(out))
      case (out, "adist", c) =>
        // approx_count_distinct(c) routes to the state's merged HLL
        // registers — BIT-IDENTICAL to the scan plan by construction
        // (register-wise max is associative; the estimate is the same
        // scalar over the same registers), but only when c IS the
        // column the registers track and the state was built at the
        // language's p (12)
        c.filter(d.distinctKey.contains).filter(_ => d.aggP == 12)
          .filter(_ => cols.contains("__regs"))
          .map(_ => graft.plans.HllRegs.estimate(F.col("__regs"), d.aggP)
            .as(out))
      case _ => None
    }
    if (mapped.exists(_.isEmpty)) None
    else Some(st.select(
      keys.map { case (out, src) => F.col(src).as(out) } ++
        mapped.map(_.get): _*))
  }
}
