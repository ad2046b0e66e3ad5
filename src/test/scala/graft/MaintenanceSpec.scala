package graft

import org.apache.spark.sql.functions._
import graft.functions.PF
import graft.sources.Maintenance

/** Behavior of the table-maintenance layer: small-file compaction and
  * Z-order clustering (sources/Maintenance.scala).
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("zvalue interleaves bits (known vector) and is a bijection") {
    // a=3 (011), b=5 (101), bits=3: z = a0<<0 | b0<<1 | a1<<2 | b2<<5
    val z = Seq((3L, 5L)).toDF("a", "b")
      .select(PF.zvalue(col("a"), col("b"), 3).as("z"))
      .head().getLong(0)
    assert(z == (1 + 2 + 4 + 32))
    // all 8×8 inputs map to 64 distinct z values in [0, 64)
    val grid = spark.range(0, 64)
      .select((col("id") % 8).as("a"), (col("id") / 8).cast("long").as("b"))
      .select(PF.zvalue(col("a"), col("b"), 3).as("z"))
      .collect().map(_.getLong(0))
    assert(grid.distinct.length == 64 && grid.forall(z => z >= 0 && z < 64))
  }

  test("zvalueSql mirrors zvalue through Spark SQL itself") {
    // the oracle string uses only >> & << + — valid in Spark SQL too,
    // so cross-check the mirror against the Column version directly
    val df = spark.range(0, 500)
      .select((col("id") * 7 % 1024).as("a"), (col("id") * 13 % 1024).as("b"))
    val mismatch = df.select(
        PF.zvalue(col("a"), col("b"), 10).as("zc"),
        expr(PF.zvalueSql("a", "b", 10)).as("zs"))
      .filter(col("zc") =!= col("zs")).count()
    assert(mismatch == 0)
  }

  test("compactTo rewrites many small files into the exact count, data intact") {
    val in = tmp("graft_cpt_in"); val out = tmp("graft_cpt_out")
    val df = spark.range(0, 1000).select(col("id"), (col("id") * 3).as("v"))
    df.repartition(16).write.mode("overwrite").parquet(in)
    assert(Maintenance.compactTo(spark, in, out, 2) == 2)
    val r = spark.read.parquet(out)
    // project first: Spark 4 forbids nondeterministic expressions
    // directly inside aggregate arguments
    assert(r.select(input_file_name().as("f"))
      .agg(countDistinct(col("f"))).head().getLong(0) == 2)
    assert(r.count() == 1000 &&
      r.agg(sum("v")).head().getLong(0) == df.agg(sum("v")).head().getLong(0))
  }

  test("compactParquet sizes the file count from the input bytes") {
    val in = tmp("graft_cptb_in"); val out = tmp("graft_cptb_out")
    spark.range(0, 100).repartition(8).write.mode("overwrite").parquet(in)
    // targetBytes far above the dir size → exactly one output file
    assert(Maintenance.compactParquet(spark, in, out, 1L << 30) == 1)
    assert(spark.read.parquet(out).count() == 100)
    val bytes = Maintenance.dirBytes(spark, in)
    assert(bytes > 0)
    // ceil division: a target of bytes-1 needs 2 files
    val out2 = tmp("graft_cptb_out2")
    assert(Maintenance.compactParquet(spark, in, out2, bytes - 1) == 2)
  }

  test("writeZOrdered clusters: a 2-D range hits few files, data intact") {
    val dir = tmp("graft_zord")
    val df = spark.range(0, 4096).select(
      col("id"), (col("id") % 64).as("a"), (col("id") / 64).cast("long").as("b"))
    Maintenance.writeZOrdered(df, dir, "a", "b", bits = 6, bucketBits = 4)
    val r = spark.read.parquet(dir)
    assert(r.count() == 4096 && !r.columns.contains("__zb"))
    val rf = r.withColumn("f", input_file_name())
    val total = rf.agg(countDistinct(col("f"))).head().getLong(0)
    // low-corner rectangle (both dims < 16): z < 2^8, top-4 bucket = 0
    val hit = rf.filter(col("a") < 16 && col("b") < 16)
      .agg(countDistinct(col("f"))).head().getLong(0)
    assert(hit == 1, s"low corner should live in one file, hit=$hit")
    assert(total >= 8, s"full span should spread across files, total=$total")
  }

  test("writeZOrdered rejects an unsplittable bucketBits") {
    val df = Seq((1L, 1L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Maintenance.writeZOrdered(df, "/tmp/never", "a", "b", 4, 9)
    }
  }
}
