package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** Syntax sugar so queries read close to the reference language:
  *   t.project("a", "b" -> col("x") * 2)
  *   t.orderBy(desc("population"), "name")
  */
package object dsl {
  import scala.language.implicitConversions

  implicit def stringToNamedCol(name: String): NamedCol =
    NamedCol(name, F.col(name))
  implicit def pairToNamedCol(p: (String, Column)): NamedCol =
    NamedCol(p._1, p._2)

  implicit def stringToSort(name: String): Sort = Sort(F.col(name))
  implicit def colToSort(c: Column): Sort = Sort(c)

  /** Preql `^x` — descending sort key. */
  def desc(name: String): Sort = Sort(F.col(name), ascending = false)
  def desc(c: Column): Sort = Sort(c, ascending = false)
}
