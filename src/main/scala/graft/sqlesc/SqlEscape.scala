package graft.sqlesc

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession
import graft.dsl.PTable

/** `SQL(type, "code")` escape hatch (reference:
  * preql/core/pql_functions.py:86-123): embed raw SQL with `$var`
  * interpolation of table values.
  *
  * Spark-first: each `$var` PTable is registered as a uniquely-named
  * temp view and the substituted text runs through `spark.sql` — so the
  * escape-hatch query still goes through Catalyst and fuses with the
  * surrounding plan (temp views are plan aliases, not materialization).
  * `$self` recursion is NOT supported here — use graft.rec.Graph.
  */
object SqlEscape {

  private val counter = new AtomicLong(0)

  def sql(spark: SparkSession, code: String, vars: (String, PTable)*): PTable = {
    var text = code
    vars.foreach { case (name, t) =>
      val view = s"graft_sqlesc_${name}_${counter.incrementAndGet()}"
      t.df.createOrReplaceTempView(view)
      // identifier-boundary match: `$t` must not corrupt `$t2`/`$total`
      text = text.replaceAll(
        "\\$" + java.util.regex.Pattern.quote(name) + "(?![A-Za-z0-9_])",
        java.util.regex.Matcher.quoteReplacement(view))
    }
    PTable(spark.sql(text))
  }
}
