package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for the named queries into
  * `<outDir>/<name>_<suffix>.txt` — the plans/r14 before/after
  * evidence files. Building a query's frame runs any side-effectful
  * setup it contains (lifecycle gates), so plans here reflect the
  * exact state the bench measures.
  *
  * Usage: R14Plans <outDir> <suffix> <name>[,<name>...]
  */
object R14Plans {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: R14Plans <outDir> <suffix> <names>")
    val Array(outDir, suffix, nameCsv) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probes = sys.env.getOrElse("SPARK_GRAFT_PROBES", "5")
    graft.SparkEntry.probeScale = probes match {
      case "full" => 1.0
      case n => 1.0 / scala.util.Try(n.toDouble).getOrElse(5.0).max(1.0)
    }
    new java.io.File(outDir).mkdirs()
    nameCsv.split(',').foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(s"$outDir/${n}_$suffix.txt", "UTF-8")
      try w.println(txt) finally w.close()
      println(s"wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
