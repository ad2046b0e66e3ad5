package graft.sqlesc

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.dsl.PTable

/** `SQL(type, "code")` escape hatch (reference:
  * preql/core/pql_functions.py:86-123): embed raw SQL with `$var`
  * interpolation of table values.
  *
  * Spark-first: each `$var` PTable is registered as a uniquely-named
  * temp view and the substituted text runs through `spark.sql` — so the
  * escape-hatch query still goes through Catalyst and fuses with the
  * surrounding plan (temp views are plan aliases, not materialization).
  *
  * `$self` (reference compiler.py:516-518; used by graph.pql:14,34)
  * names the query's own result — a recursive CTE. Two paths:
  *  - every top-level set operator is UNION ALL → native Spark
  *    `WITH RECURSIVE` (one query, zero driver-side looping; Spark 4
  *    executes it semi-naively inside the engine);
  *  - any top-level distinct UNION (Spark rejects it inside a
  *    recursive CTE) → the standard semi-naive fixpoint: branches not
  *    referencing `$self` seed the result, branches referencing it
  *    step the FRONTIER only (the recursive reference in SQL sees the
  *    previous iteration's rows, not the accumulated set), new rows =
  *    step − seen, loop until the frontier drains. Each round
  *    materializes (localCheckpoint) so plan depth stays O(1), the
  *    per-round shuffle is frontier×step + one distinct — the same
  *    scale shape as graft.rec.Graph.bfs, which remains the fast path
  *    for the stdlib graph functions.
  */
object SqlEscape {

  private val counter = new AtomicLong(0)

  def sql(spark: SparkSession, code: String, vars: (String, PTable)*): PTable =
    sqlMaxIter(spark, code, 1000, vars: _*)

  /** `selfCols`: declared column names for the `$self` relation — the
    * reference's `SQL(list[int], ...)` / `SQL(node, ...)` TYPE argument
    * names the recursive CTE's columns (`item`; the table's fields), so
    * the recursive branch can reference them even when the seed branch
    * computes them under other names (graph.pql:14,34).
    */
  def sqlMaxIter(spark: SparkSession, code: String, maxIter: Int,
                 vars: (String, PTable)*): PTable =
    sqlTyped(spark, code, maxIter, None, vars: _*)

  def sqlTyped(spark: SparkSession, code: String, maxIter: Int,
               selfCols: Option[Seq[String]],
               vars: (String, PTable)*): PTable = {
    var text = code
    val recursive = code.matches("(?s).*\\$self(?![A-Za-z0-9_]).*")
    // A $self fixpoint re-evaluates every $var view ONCE PER LEVEL — a
    // 20-deep BFS re-scanned its edges source 20 times. Persist the
    // var inputs for the loop's duration (MEMORY_AND_DISK, so a big
    // edges table spills instead of OOMing — the same trade a Pregel
    // superstep loop makes) and drop them when the fixpoint returns.
    val pinned = if (recursive) vars.map(_._2.df.persist()) else Seq.empty
    vars.foreach { case (name, t) =>
      val view = s"graft_sqlesc_${name}_${counter.incrementAndGet()}"
      t.df.createOrReplaceTempView(view)
      // identifier-boundary match: `$t` must not corrupt `$t2`/`$total`
      text = text.replaceAll(
        "\\$" + java.util.regex.Pattern.quote(name) + "(?![A-Za-z0-9_])",
        java.util.regex.Matcher.quoteReplacement(view))
    }
    if (!recursive) PTable(spark.sql(text))
    else
      try PTable(recursiveFixpoint(spark, text, maxIter, selfCols))
      finally pinned.foreach(_.unpersist(false))
  }

  private def castTo(df: DataFrame,
                     schema: org.apache.spark.sql.types.StructType): DataFrame =
    df.select(schema.fields.toSeq.map(f =>
      org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)): _*)

  private def subSelf(text: String, view: String): String =
    text.replaceAll("\\$self(?![A-Za-z0-9_])",
      java.util.regex.Matcher.quoteReplacement(view))

  /** Split `text` into top-level branches on UNION [ALL] at paren
    * depth 0 (outside string literals). Returns (branches, anyDistinct).
    */
  private[graft] def splitUnions(text: String): (Seq[String], Boolean) = {
    val branches = Seq.newBuilder[String]
    var depth = 0
    var inStr = false
    var start = 0
    var anyDistinct = false
    val upper = text.toUpperCase
    var i = 0
    def isWord(from: Int, until: Int): Boolean =
      (from == 0 || !Character.isLetterOrDigit(text(from - 1)) &&
        text(from - 1) != '_') &&
      (until >= text.length || !Character.isLetterOrDigit(text(until)) &&
        text(until) != '_')
    while (i < text.length) {
      val c = text(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else c match {
        case '\'' => inStr = true; i += 1
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case 'u' | 'U' if depth == 0 && upper.startsWith("UNION", i) &&
            isWord(i, i + 5) =>
          branches += text.substring(start, i)
          var j = i + 5
          while (j < text.length && Character.isWhitespace(text(j))) j += 1
          if (upper.startsWith("ALL", j) && isWord(j, j + 3)) i = j + 3
          else { anyDistinct = true; i = j }
          start = i
        case _ => i += 1
      }
    }
    branches += text.substring(start)
    (branches.result().map(_.trim).filter(_.nonEmpty), anyDistinct)
  }

  private def recursiveFixpoint(spark: SparkSession, text: String,
                                maxIter: Int,
                                selfCols: Option[Seq[String]] = None): DataFrame = {
    val (branches, anyDistinct) = splitUnions(text)
    if (!anyDistinct) {
      // all-UNION ALL recursion runs natively in one Spark query
      val name = s"graft_self_${counter.incrementAndGet()}"
      val colList = selfCols.map(cs => cs.mkString("(", ", ", ")")).getOrElse("")
      return spark.sql(
        s"WITH RECURSIVE $name$colList AS (${subSelf(text, name)}) " +
        s"SELECT * FROM $name")
    }
    val (seedB, stepB) = branches.partition(
      !_.matches("(?s).*\\$self(?![A-Za-z0-9_]).*"))
    if (seedB.isEmpty || stepB.isEmpty)
      throw new graft.types.TypeError(
        "$self query needs both a non-recursive and a recursive " +
        "UNION branch")
    def materialize(df: DataFrame): DataFrame = {
      val ckpt = df.localCheckpoint(true)
      spark.createDataFrame(ckpt.rdd, ckpt.schema)
    }
    val stepSql = stepB.map(b => s"($b)").mkString(" UNION ALL ")
    val seed0 = spark.sql(seedB.map(b => s"($b)").mkString(" UNION ")).distinct()
    // the declared type's column names win over the seed branch's
    val seed = selfCols.map(cs => seed0.toDF(cs: _*)).getOrElse(seed0)
    val cols = seed.columns.toSeq
    val schema = seed.schema
    // Hybrid fixpoint (same shape as Graph.bfs): while the visited set
    // fits the driver limit, each round is ONE job — step the local
    // frontier relation through the engine, dedup against a driver-side
    // seen set. Recursion depth costs one small query per level either
    // way; keeping frontier/seen local avoids the per-round
    // checkpoint+except jobs that dominate deep, narrow recursions.
    val driverLimit = graft.GraftConf.graphDriverLimit(spark)
    val seen = scala.collection.mutable.LinkedHashSet[org.apache.spark.sql.Row]()
    var frontierRows = seed.collect()
    seen ++= frontierRows
    var iter = 0
    import scala.jdk.CollectionConverters._
    while (frontierRows.nonEmpty && iter < maxIter &&
           seen.size <= driverLimit) {
      iter += 1
      val v = s"graft_self_${counter.incrementAndGet()}"
      spark.createDataFrame(frontierRows.toSeq.asJava, schema)
        .createOrReplaceTempView(v)
      // CTE column names AND types come from the seed: rename the
      // step output positionally and cast to the seed schema
      // (standard recursive-CTE behavior). Dedup DRIVER-side: the
      // level's rows are bounded by driverLimit anyway, and a
      // .distinct() here costs a 32-partition exchange per level —
      // the dominant cost of a deep, narrow recursion.
      val stepped = castTo(spark.sql(subSelf(stepSql, v)).toDF(cols: _*),
        schema).collect()
      frontierRows = stepped.distinct.filterNot(seen.contains)
      seen ++= frontierRows
    }
    if (frontierRows.isEmpty || iter >= maxIter)
      return spark.createDataFrame(seen.toSeq.asJava, schema)
    // visited set outgrew the driver: continue distributed — frontier
    // steps through temp views, new rows = step − seen, both
    // materialized per round so plan depth stays O(1)
    var acc = materialize(spark.createDataFrame(seen.toSeq.asJava, schema))
    var frontier = materialize(
      spark.createDataFrame(frontierRows.toSeq.asJava, schema))
    while (!frontier.isEmpty && iter < maxIter) {
      iter += 1
      val v = s"graft_self_${counter.incrementAndGet()}"
      frontier.createOrReplaceTempView(v)
      frontier = materialize(
        castTo(spark.sql(subSelf(stepSql, v)).toDF(cols: _*), schema)
          .distinct().exceptAll(acc))
      acc = materialize(acc.unionAll(frontier))
    }
    acc
  }
}
