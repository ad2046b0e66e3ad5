package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem probes that resolve through the Hadoop `FileSystem` API,
  * so they work on ANY filesystem Spark can write to (local paths,
  * `file:`, `hdfs:`, `s3a:`, ...). `java.io.File` must never be used
  * for data-directory discovery: on a non-local URI it silently reports
  * "missing" (isDirectory=false, listFiles=null), which for a persisted
  * dedup index means the seen-set reads as EMPTY and every historical
  * duplicate is readmitted without any error.
  */
object Fs {

  private def resolve(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** True when `dir` exists and directly contains at least one parquet
    * part file — the "has this index ever been written?" bootstrap
    * probe for incremental dedup.
    */
  def hasParquet(spark: SparkSession, dir: String): Boolean = {
    val (fs, p) = resolve(spark, dir)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
  }

  /** Fully-qualified immediate subdirectories of `dir` whose NAME
    * matches `pattern` (a full-name regex — e.g. `"b\\d+"` for the
    * streaming index's per-batch layout, so an unrelated `backup/`
    * cannot be read as fingerprints). Empty when `dir` doesn't exist.
    */
  def subdirs(spark: SparkSession, dir: String, pattern: String): Seq[String] = {
    val (fs, p) = resolve(spark, dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toIndexedSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches(pattern))
      .map(_.getPath.toString)
  }
}
