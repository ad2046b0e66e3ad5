package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.LongType

/** Corpus-preparation operators for training-data pipelines: the three
  * standard moves between "filtered documents" and "model input" —
  * deterministic train/val/test splitting, token-window chunking, and
  * sequence packing. None exist in the reference (it stops at
  * relational queries); all three are everyday operations over a
  * 100 TB text corpus, so they get the same treatment as the dedup /
  * ANN extensions: scan-parallel Catalyst plans, md5-derived
  * determinism (cross-engine oracle-able), no RDD exits.
  */
object Corpus {

  /** Deterministic train/val/test assignment: bucket = md5-derived
    * uniform of the row key in [0,100), split by cumulative
    * percentages. Pure per-row expression — scan-parallel, stable
    * across runs/engines (the property that matters: a re-run of the
    * pipeline must not move documents between splits), and
    * join-free. `"split:" + key` domain-separates the hash from other
    * md5 uses of the same key (sampling, dedup).
    */
  def trainSplit(df: DataFrame, key: Column,
                 trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = TextAnalysis.h60(F.concat(F.lit("split:"), key.cast("string"))) % 100
    df.withColumn("split",
      F.when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Token-window chunking: split each document into windows of
    * `size` tokens advancing by `size - overlap` (the long-context
    * preprocessing move). One output row per chunk; all offsets are
    * computed per row and exploded — linear output, whole-stage
    * codegen, zero shuffles. A document of n tokens yields
    * max(1, floor((n - overlap - 1) / stride) + 1) chunks, so every
    * token is covered and consecutive chunks share `overlap` tokens.
    */
  def chunk(df: DataFrame, id: Column, text: Column,
            size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"chunk: need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val toks = F.split(F.trim(text), "\\s+")
    val n = F.size(toks)
    // Column `/` is DOUBLE division — floor() recovers the integral
    // quotient (operands are non-negative after the greatest() guard)
    val nChunks = F.greatest(F.lit(1L),
      F.floor((n - overlap - 1) / F.lit(stride)) + 1)
    df.select(id.as("doc_id"), toks.as("toks"), nChunks.as("nc"))
      .select(F.col("doc_id"),
        F.explode(F.sequence(F.lit(0L), F.col("nc") - 1)).as("chunk_id"),
        F.col("toks"))
      // slice() is 1-based; chunks past the end are naturally short
      .select(F.col("doc_id"), F.col("chunk_id").cast(LongType).as("chunk_id"),
        F.array_join(F.slice(F.col("toks"),
          (F.col("chunk_id") * stride + 1).cast("int"), F.lit(size)), " ")
          .as("chunk_text"))
      .withColumn("chunk_tokens",
        F.size(F.split(F.col("chunk_text"), " ")).cast(LongType))
  }

  /** Sequence packing, concat-and-split attribution: documents are
    * laid out contiguously in `order` and cut every `budget` tokens;
    * a document belongs to the sequence where it STARTS
    * (seq_id = floor(tokens_before / budget) — the attribution used
    * when packed training sequences are sliced from a concatenated
    * stream). The global prefix sum is the scale-critical part: a
    * single-partition window would funnel 100 TB through one task, so
    * it runs as the standard two-pass — bounded per-group windows over
    * a PURE partition function of the row (`order div groupEvery`;
    * range-repartition sampling is nondeterministic across plan
    * re-executions), per-group totals collected to the driver (one row
    * per group), prefix offsets broadcast back.
    */
  def packSequences(df: DataFrame, order: Column, tokens: Column,
                    budget: Long, groupEvery: Long = 65536): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val grp = (order / groupEvery).cast(LongType)
    val base = df.select(order.cast(LongType).as("ord"),
      tokens.cast(LongType).as("n_tokens"), grp.as("grp"))
    // pass 1: per-group token totals — one small row per 65k docs
    val totals = base.groupBy("grp").agg(F.sum("n_tokens").as("t"))
      .orderBy("grp").collect()
    var acc = 0L
    val offsets = totals.map { r =>
      val o = r.getLong(0) -> acc; acc += r.getLong(1); o
    }.toMap
    val offsetDf = spark.createDataFrame(
      offsets.toSeq.map { case (g, o) => (g, o) }).toDF("grp", "grp_offset")
    // pass 2: within-group running sum (bounded window) + group offset
    val w = Window.partitionBy("grp").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(F.broadcast(offsetDf), "grp")
      .withColumn("tokens_before",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0L)) + F.col("grp_offset"))
      .select(F.col("ord"), F.col("n_tokens"),
        (F.col("tokens_before") / budget).cast(LongType).as("seq_id"))
  }
}
