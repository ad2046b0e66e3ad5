package graft

import org.apache.spark.sql.functions.col
import graft.dsl.PTable
import graft.sqlesc.SqlEscape

class SqlEscapeSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Int, Int)*): PTable =
    PTable(pairs.toSeq.toDF("src", "dst"))
  private def initial(ns: Int*): PTable =
    PTable(ns.toSeq.toDF("node"))

  test("splitUnions: top-level only, quotes and parens respected") {
    val (b1, d1) = SqlEscape.splitUnions(
      "SELECT a FROM (x UNION y) UNION ALL SELECT 'union' UNION SELECT b")
    assert(b1 == Seq("SELECT a FROM (x UNION y)", "SELECT 'union'",
      "SELECT b"))
    assert(d1) // one distinct UNION present
    val (b2, d2) = SqlEscape.splitUnions("SELECT a UNION ALL SELECT b")
    assert(b2.length == 2 && !d2)
  }

  test("$self with distinct UNION: cyclic bfs terminates (graph.pql:14 shape)") {
    // 1→2→3→1 cycle plus a tail 3→4; 9 unreachable
    val out = SqlEscape.sql(spark,
      "SELECT n.node AS item FROM $initial n UNION " +
        "SELECT e.dst FROM $edges e JOIN $self bfs ON e.src = bfs.item",
      "initial" -> initial(1),
      "edges" -> edges(1 -> 2, 2 -> 3, 3 -> 1, 3 -> 4, 9 -> 9))
    assert(out.df.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3, 4))
  }

  test("$self with UNION ALL runs as a native recursive CTE (walk_tree shape)") {
    val out = SqlEscape.sql(spark,
      "SELECT n.node AS id, 0 AS rank FROM $initial n UNION ALL " +
        "SELECT e.dst, bfs.rank + 1 FROM $edges e " +
        "JOIN $self bfs ON e.src = bfs.id WHERE bfs.rank < 3",
      "initial" -> initial(1), "edges" -> edges(1 -> 2, 2 -> 3, 3 -> 1))
    // ranks walk the cycle up to the bound; nodes may repeat (UNION ALL)
    val rows = out.df.collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    assert(rows.toSeq == Seq((1, 0), (1, 3), (2, 1), (3, 2)))
    // plan check: no driver loop — single query with a recursive CTE
    val p = out.df.queryExecution.analyzed.toString
    assert(!p.contains("LogicalRDD"), s"native path must not checkpoint:\n$p")
  }

  test("$self distributed fallback (driverLimit=0) matches the hybrid path") {
    def run() = SqlEscape.sql(spark,
      "SELECT n.node AS item FROM $initial n UNION " +
        "SELECT e.dst FROM $edges e JOIN $self bfs ON e.src = bfs.item",
      "initial" -> initial(1),
      "edges" -> edges(1 -> 2, 2 -> 3, 3 -> 1, 3 -> 4))
      .df.collect().map(_.getInt(0)).sorted.toSeq
    val hybrid = run()
    val key = GraftConf.GraphDriverLimitKey
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "0")
    try assert(run() == hybrid && hybrid == Seq(1, 2, 3, 4))
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("$self without a non-recursive branch errors") {
    intercept[graft.types.TypeError] {
      SqlEscape.sql(spark,
        "SELECT e.dst FROM $edges e JOIN $self b ON e.src = b.dst UNION " +
          "SELECT e.src FROM $edges e JOIN $self b ON e.src = b.dst",
        "edges" -> edges(1 -> 2))
    }
  }
}
