package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM under Test/fork). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  lazy val sf: String = "/root/testdata/sf0.001"

  /** Run `body` with the given session confs set, UNSETTING them
    * after. Unset (not save/re-set) is the correct restore for keys
    * absent from the session builder: conf.get returns a default for
    * registered-but-unset keys, and re-setting that value explicitly
    * would pin a fallback conf (e.g. adaptive.autoBroadcastJoinThreshold)
    * to a snapshot, severing its link to its base conf for every
    * later suite in the shared session.
    */
  def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  /** (path → (length, mtime)) of every parquet data file under `dir` —
    * the immutability fingerprint the "bases/segments never rewritten"
    * assertions compare before and after an append.
    */
  def parquetFileState(dir: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
    walk(new java.io.File(dir))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
  }
}
