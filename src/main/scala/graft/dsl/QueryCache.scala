package graft.dsl

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.DataFrame

/** Per-signature plan memo — the engine's analogue of the reference's
  * compiled-SQL cache for parameterized functions (reference:
  * preql/core/evaluate.py:612-638, which compiles a function body once
  * per argument-type signature and substitutes parameters per call).
  *
  * Catalyst re-analysis is cheap, so this is an optional optimization
  * for hot parameterized query shapes (repeated dashboard lookups,
  * point queries): building the DataFrame once per (name, args)
  * signature skips repeated plan construction and lets Spark reuse
  * the analyzed/optimized plan and any cached data underneath.
  */
final class QueryCache {
  private val cache = TrieMap.empty[(String, Seq[Any]), DataFrame]

  def memo(name: String, args: Any*)(build: => DataFrame): DataFrame =
    cache.getOrElseUpdate((name, args.toSeq), build)

  def invalidate(name: String): Unit =
    cache.keys.filter(_._1 == name).foreach(cache.remove)

  def clear(): Unit = cache.clear()
  def size: Int = cache.size
}
