package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{col, lit, when}

/** Data-quality expectations — the validation gate a pipeline runs
  * before committing a batch (the role Great Expectations / Deequ play
  * around Spark; extension surface, no reference counterpart).
  *
  * One aggregated pass REGARDLESS of rule count: every rule compiles
  * to a conditional partial sum inside a single HashAggregate, so
  * validating 50 expectations over 100 TB costs exactly one
  * projection-pruned scan — never a scan per rule.
  */
object Checks {

  private val SafeName = "[A-Za-z0-9_]+".r

  /** Evaluate boolean `rules` over `df` in one pass; returns one row
    * per rule: (rule, n_rows, n_violations, pass). A row violates a
    * rule when the predicate is FALSE **or NULL** — an expectation
    * that cannot be evaluated is a failed expectation, deliberately
    * (the silent alternative lets a fully-null column "pass" every
    * check on it).
    */
  def checkConstraints(df: DataFrame,
                       rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "checkConstraints needs at least one rule")
    rules.foreach { case (n, _) =>
      require(SafeName.matches(n), s"rule names must be [A-Za-z0-9_]+: '$n'")
    }
    require(rules.map(_._1).distinct.length == rules.length,
      s"duplicate rule names in ${rules.map(_._1)}")
    val aggs = F.count(lit(1)).as("__n") +: rules.map { case (name, c) =>
      F.sum(when(c, 0L).otherwise(1L)).as(name)
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    Reshape.unpivot(wide, Seq("__n"), rules.map(_._1), "rule",
      "n_violations", castTo = "bigint")
      .select(col("rule"), col("__n").as("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }
}
