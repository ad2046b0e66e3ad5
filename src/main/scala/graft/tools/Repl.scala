package graft.tools

import scala.io.StdIn
import org.apache.spark.sql.SparkSession
import graft.dsl.PTable
import graft.lang.{Ast, Interp, Parser}
import graft.sources.Tables

/** Interactive REPL over the language front-end — the engine's
  * analogue of the reference's `preql` shell (reference: preql/repl.py).
  *
  * Usage: graft.tools.Repl [testdataDir]
  * All testdata tables are pre-loaded under their names; assignments
  * and `func` definitions persist across lines; any other expression
  * evaluates and prints.
  */
object Repl {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-repl")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var env: Map[String, PTable] = Tables.metas.keys.map { n =>
      n -> Tables.load(spark, dir, n)
    }.toMap
    var prelude: List[String] = Nil // accumulated assignments + funcs

    println(s"graft repl — tables: ${env.keys.toSeq.sorted.mkString(", ")}")
    println("end with :quit; statements persist; expressions print")
    var running = true
    while (running) {
      print("graft> ")
      Console.flush()
      val line = StdIn.readLine()
      if (line == null || line.trim == ":quit") running = false
      else if (line.trim.nonEmpty) {
        try {
          if (isStatement(line)) {
            prelude = prelude :+ line
            println("ok")
          } else {
            Interp.run(spark, (prelude :+ line).mkString("\n"),
              env.toSeq: _*).df.show(20, truncate = false)
          }
        } catch {
          case e: Throwable => println(s"error: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }

  /** A line is a persistent statement if the whole line parses as only
    * assignments/func defs (no final expression).
    */
  private def isStatement(line: String): Boolean = {
    try {
      val prog = Parser.parse(line + "\n0") // dummy result
      // if line alone parses with the dummy as the only result, the
      // line itself was statements only
      prog.stmts.nonEmpty && (prog.result match {
        case Ast.IntLit(0) => true
        case _ => false
      })
    } catch { case _: Throwable => false }
  }
}
