package graft

import org.apache.spark.sql.functions._
import graft.lang.Interp
import graft.sources.Tables

class LangSpec extends SparkSpec {

  private def nation = Tables.load(spark, sf, "nation")
  private def region = Tables.load(spark, sf, "region")
  private def customer = Tables.load(spark, sf, "customer")
  private def orders = Tables.load(spark, sf, "orders")

  test("projection with rename and computed column") {
    val out = Interp.run(spark,
      "nation{n_name, key10: n_nationkey * 10}", "nation" -> nation)
    assert(out.columns == Seq("n_name", "key10"))
    assert(out.df.filter(col("key10") === 240).count() == 1)
  }

  test("selection with null-safe == and conjunction") {
    val out = Interp.run(spark,
      "nation[n_regionkey == 0, n_nationkey > 5]", "nation" -> nation)
    val expected = nation.df
      .filter(col("n_regionkey") <=> 0 && col("n_nationkey") > 5).count()
    assert(out.df.count() == expected)
  }

  test("group-by forms: {k=>a}, {=>a}, {k=>}") {
    val g1 = Interp.run(spark,
      "customer{c_mktsegment => n: count()}", "customer" -> customer)
    assert(g1.df.count() == 5)
    val g2 = Interp.run(spark, "customer{=> n: count()}", "customer" -> customer)
    assert(g2.df.head().getLong(0) == customer.df.count())
    val g3 = Interp.run(spark, "customer{c_mktsegment =>}", "customer" -> customer)
    assert(g3.df.count() == 5)
  }

  test("order with ^ desc and slice") {
    val out = Interp.run(spark,
      "nation order {^n_nationkey} [..3] {n_nationkey}", "nation" -> nation)
    assert(out.df.collect().map(_.getInt(0)).toSeq == Seq(24, 23, 22))
  }

  test("ellipsis with exclusion") {
    val out = Interp.run(spark, "nation{... !n_regionkey}", "nation" -> nation)
    assert(out.columns == Seq("n_nationkey", "n_name"))
  }

  test("auto-join via FK metadata in the language") {
    val out = Interp.run(spark,
      "join(n: nation, r: region){name: r.r_name => nations: count()}",
      "nation" -> nation, "region" -> region)
    assert(out.df.count() == 5)
    assert(out.df.agg(sum("nations")).head().getLong(0) == 25)
  }

  test("in-table condition becomes a semi join; !in an anti join") {
    val src = "customer[c_custkey in big{o_custkey}]"
    val out = Interp.run(spark,
      "big = orders[o_totalprice > 200000]\n" + src,
      "customer" -> customer, "orders" -> orders)
    val expected = graft.joins.Joins.semi(customer, "c_custkey",
      orders.where(col("o_totalprice") > 200000), "o_custkey").df.count()
    assert(out.df.count() == expected)
    val outAnti = Interp.run(spark,
      "big = orders[o_totalprice > 200000]\ncustomer[c_custkey !in big{o_custkey}]",
      "customer" -> customer, "orders" -> orders)
    assert(outAnti.df.count() == customer.df.count() - expected)
  }

  test("arithmetic semantics: / float, /~ floor, ** pow") {
    val out = Interp.run(spark,
      "nation{a: n_nationkey / 2, b: n_nationkey /~ 2, c: n_nationkey ** 2}",
      "nation" -> nation)
    val r = out.df.filter(col("b") === 3 && col("a") === 3.5).head()
    assert(r.getDouble(2) == 49.0)
  }

  test("range and list literals as tables") {
    val r = Interp.run(spark, "[1..11]{ => total: sum(item)}")
    assert(r.df.head().getLong(0) == 55L)
    val l = Interp.run(spark, "[3, 1, 2] order {item}")
    assert(l.df.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("update and delete through the language") {
    val upd = Interp.run(spark,
      "nation[n_nationkey == 0] update {n_name: 'X'}", "nation" -> nation)
    assert(upd.df.filter(col("n_name") === "X").count() == 1)
    assert(upd.df.count() == 25)
    val del = Interp.run(spark,
      "nation delete [n_regionkey == 0]", "nation" -> nation)
    assert(del.df.count() == nation.df
      .filter(!(col("n_regionkey") <=> 0)).count())
  }

  test("string ops: like, in-string, concat, repeat") {
    val out = Interp.run(spark,
      "nation[n_name ~ '%ION_1%']{msg: 'x: ' + n_name}", "nation" -> nation)
    assert(out.df.count() > 0)
    assert(out.df.head().getString(0).startsWith("x: "))
  }

  test("user functions inline into queries, incl. aggregation scope") {
    // reference tests/test_basic.py:569-574: func sqsum(x) = sum(x*x)
    val out = Interp.run(spark,
      """func sqsum(x) = sum(x * x)
         func double(x) = x * 2
         nation{n_regionkey => s: sqsum(n_nationkey), d: sum(double(n_nationkey))}""",
      "nation" -> nation)
    assert(out.df.count() == 5)
    val direct = nation.df.groupBy("n_regionkey")
      .agg(sum(col("n_nationkey") * col("n_nationkey")),
        sum(col("n_nationkey") * 2))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val got = out.df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == direct)
  }

  test("user function composing table ops") {
    val out = Interp.run(spark,
      """func by_region(k) = nation[n_regionkey == k]
         by_region(2){n_name}""",
      "nation" -> nation)
    assert(out.df.count() == nation.df.filter(col("n_regionkey") <=> 2).count())
  }

  test("new and += mutation statements") {
    val out = Interp.run(spark,
      """new region(r_name: 'MIDDLE EARTH')
         region += region[r_regionkey == 0]
         region""",
      "region" -> region)
    assert(out.df.count() == region.df.count() + 2)
    assert(out.df.filter(col("r_name") === "MIDDLE EARTH").count() == 1)
    assert(out.df.filter(col("r_regionkey") === 0).count() == 2)
  }

  test("iif conditional expression") {
    val out = Interp.run(spark,
      "nation{n_nationkey, side: iif(n_nationkey < 12, 'low', 'high')}",
      "nation" -> nation)
    assert(out.df.filter(col("side") === "low").count() == 12)
  }

  test("parse errors are reported with position") {
    intercept[graft.lang.ParseError] {
      Interp.run(spark, "nation{", "nation" -> nation)
    }
  }

  test("unknown names raise typed errors") {
    intercept[graft.types.NameError] {
      Interp.run(spark, "nosuch{x}")
    }
  }
}
