package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.dsl._
import graft.functions.PF

class PFSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column) =
    spark.range(1).select(c).head().get(0)

  test("/ always yields float; /~ floors (incl. negatives)") {
    assert(eval1(PF.div(lit(7), lit(2))) == 3.5)
    assert(eval1(PF.floorDiv(lit(7), lit(2))) == 3L)
    assert(eval1(PF.floorDiv(lit(-7), lit(2))) == -4L)
  }

  test("== is null-safe (IS NOT DISTINCT FROM)") {
    val nullC = lit(null).cast(StringType)
    assert(eval1(PF.eq(nullC, nullC)) == true)
    assert(eval1(PF.eq(nullC, lit("x"))) == false)
    assert(eval1(PF.neq(nullC, lit("x"))) == true)
  }

  test("and/or have value semantics like the reference") {
    // 0 and x -> 0 ; 1 and x -> x ; 0 or x -> x
    assert(eval1(PF.vAnd(lit(0), lit(5), IntegerType)) == 0)
    assert(eval1(PF.vAnd(lit(1), lit(5), IntegerType)) == 5)
    assert(eval1(PF.vOr(lit(0), lit(5), IntegerType)) == 5)
    assert(eval1(PF.vOr(lit(2), lit(5), IntegerType)) == 2)
    assert(eval1(PF.vNot(lit(""), StringType)) == true)
  }

  test("strict string->int raises on junk, passes on digits") {
    assert(eval1(PF.strictToInt(lit("42"))) == 42L)
    val e = intercept[Exception] {
      spark.range(1).select(PF.strictToInt(lit("4x"))).collect()
    }
    assert(e.getMessage.contains("Cannot cast to int") ||
      e.getCause != null)
  }

  test("string helpers: 0-based index, end-exclusive slice, repeat") {
    assert(eval1(PF.strIndex(lit("hello"), lit("ll"))) == 2)
    assert(eval1(PF.strIndex(lit("hello"), lit("z"))) == -1)
    assert(eval1(PF.strSlice(lit("hello"), lit(1), lit(3))) == "el")
    assert(eval1(PF.strRepeat(lit("ab"), lit(3))) == "ababab")
  }

  test("product aggregator multiplies exactly") {
    val df = Seq(1.5, 2.0, 4.0).toDF("x")
    assert(df.agg(PF.product(col("x"))).head().getDouble(0) == 12.0)
  }

  test("approxProduct = exp(sum(log))") {
    val df = Seq(2.0, 8.0).toDF("x")
    val v = df.agg(PF.approxProduct(col("x"))).head().getDouble(0)
    assert(math.abs(v - 16.0) < 1e-9)
  }

  test("countTrue/countFalse partition the rows") {
    val df = Seq(1, 2, 3, 4, 5).toDF("x")
    val row = df.agg(PF.countTrue(col("x") > 2), PF.countFalse(col("x") > 2))
      .head()
    assert(row.getLong(0) == 3L && row.getLong(1) == 2L)
  }

  test("dcovar/dcorr agree with Spark's streaming covar/corr to 1e-6") {
    val df = Seq((1.0, 2.0), (2.0, 4.5), (3.0, 5.5), (4.0, 9.0), (5.0, 9.5))
      .toDF("x", "y")
    val row = df.agg(
      PF.dcovar(col("x"), col("y")), covar_samp(col("x"), col("y")),
      PF.dcorr(col("x"), col("y")), corr(col("x"), col("y"))).head()
    assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-6)
    assert(math.abs(row.getDouble(2) - row.getDouble(3)) < 1e-6)
  }

  test("keyedSample is deterministic and key-stable") {
    val a = spark.range(1000).select(PF.keyedSample(col("id"), 100, 10))
      .collect().map(_.getBoolean(0))
    val b = spark.range(1000).select(PF.keyedSample(col("id"), 100, 10))
      .collect().map(_.getBoolean(0))
    assert(a.toSeq == b.toSeq)
    val kept = a.count(identity)
    assert(kept > 50 && kept < 200) // ~10%
  }

  test("hllMd5: estimate within 5% of exact, invariant to partitioning") {
    import spark.implicits._
    // 3 groups with known cardinalities (duplicated memberships)
    val rows = (1 to 20000).map { i =>
      val g = i % 3
      val card = Seq(500, 3000, 9000)(g)
      (s"g$g", (i * 2654435761L) % card)
    }
    val df = rows.toDF("grp", "uid")
    val est = graft.functions.PF.hllMd5(df, "grp", col("uid"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = df.groupBy("grp").agg(countDistinct("uid")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n) / n.toDouble < 0.05,
        s"$g: est ${est(g)} vs exact $n")
    }
    // the integer register sums make the estimate independent of
    // partitioning / aggregation order (no float accumulation)
    val est32 = graft.functions.PF.hllMd5(df.repartition(32), "grp", col("uid"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est == est32)
  }
}
