package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns plus typed metadata. Images decode for REAL via
  * javax.imageio (`decodeImage` / `extractImageFeatures`, conf-gated);
  * `decodeImageStub` / `extractFeaturesStub` keep a deterministic
  * fake path for formats without a JVM codec (audio/video), with the
  * same Spark-side plumbing — schema, batch shape, partition sizing.
  *
  * Scale design:
  *  - blobs stay in `binary` columns; Parquet stores them page-
  *    compressed and column pruning means metadata-only queries never
  *    read the bytes;
  *  - decode runs per-partition (`mapPartitions`) so a real codec
  *    (JNI/FFI) amortizes init per partition, not per row;
  *  - `maxPartitionBytes` should be lowered for blob tables so a
  *    partition of decoded frames fits in executor memory.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Cheap, expression-level metadata over a binary column — byte
    * length plus a deterministic fake format/width/height derived from
    * the content hash (stands in for a real header sniff).
    */
  def blobMeta(blob: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = TextAnalysis.h60(F.md5(blob))
    F.struct(
      F.octet_length(blob).cast(LongType).as("n_bytes"),
      F.when(h % 3 === 0, "png").when(h % 3 === 1, "jpeg").otherwise("webp")
        .as("format"),
      (F.pmod(h, lit(1920L)) + 1L).cast(IntegerType).as("width"),
      (F.pmod(F.shiftright(h, 16), lit(1080L)) + 1L).cast(IntegerType).as("height"))
  }

  /** STUB decode: a real implementation would call an image codec here
    * (per-partition init, e.g. via JNI) and emit pixel tensors. The
    * fake emits a deterministic 4-byte "thumbnail" derived from the
    * blob so downstream plumbing (schema, batching, joins) is
    * exercised for real.
    */
  def decodeImageStub(df: DataFrame, blobCol: String, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("thumb", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // real codec init would happen once per partition here
      rows.map { r =>
        val blob = r.getAs[Array[Byte]](blobIdx)
        val thumb = if (blob.length >= 4) blob.take(4)
          else blob.padTo(4, 0.toByte)
        Row(r.getAs[Number](idIdx).longValue(), blob.length.toLong, thumb)
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** REAL image decode via javax.imageio (pure JVM — PNG/JPEG/GIF/BMP
    * readers ship with the JDK), gated by
    * `spark.graft.multimodal.realDecode` (default true). Blobs that
    * decode emit their true width/height plus an RGB thumbnail
    * (nearest-neighbor sample down to `thumbSize`²); undecodable blobs
    * fall back to the deterministic stub shape so mixed corpora never
    * fail the job. Decode runs per-partition so a heavier codec would
    * amortize its init; at 100 TB the binary column never leaves the
    * scan task — only the fixed-size thumbnail/meta survive.
    */
  def decodeImage(df: DataFrame, blobCol: String, idCol: String,
                  thumbSize: Int = 2): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("thumb", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val real = graft.GraftConf.realDecode(df.sparkSession)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val blob = r.getAs[Array[Byte]](blobIdx)
        val id = r.getAs[Number](idIdx).longValue()
        val img =
          if (real)
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(blob)))
            catch { case _: java.io.IOException => None }
          else None
        img match {
          case Some(im) =>
            val (w, h) = (im.getWidth, im.getHeight)
            val thumb = new Array[Byte](thumbSize * thumbSize * 3)
            var ty = 0
            while (ty < thumbSize) {
              var tx = 0
              while (tx < thumbSize) {
                val px = im.getRGB(tx * w / thumbSize, ty * h / thumbSize)
                val o = (ty * thumbSize + tx) * 3
                thumb(o) = ((px >> 16) & 0xff).toByte
                thumb(o + 1) = ((px >> 8) & 0xff).toByte
                thumb(o + 2) = (px & 0xff).toByte
                tx += 1
              }
              ty += 1
            }
            Row(id, blob.length.toLong, w, h, true, thumb)
          case None => // stub fallback (same shape, deterministic)
            val thumb = if (blob.length >= 4) blob.take(4)
              else blob.padTo(4, 0.toByte)
            Row(id, blob.length.toLong, 0, 0, false, thumb)
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** Image features from REAL pixels where the blob decodes (RGB
    * channel histogram over all pixels, L2-normalized — `dim` must be
    * divisible by 3), stub byte-histogram otherwise. Same output
    * schema as `extractFeaturesStub`, so the result feeds the
    * `Similarity` ANN operators directly.
    */
  def extractImageFeatures(df: DataFrame, blobCol: String, idCol: String,
                           dim: Int = 48, batchSize: Int = 64): DataFrame = {
    require(dim % 3 == 0, s"dim must be divisible by 3, got $dim")
    val out = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val real = graft.GraftConf.realDecode(df.sparkSession)
    val bins = dim / 3
    val rdd = df.rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real model would run ONE inference on this batch
        batch.map { r =>
          val blob = r.getAs[Array[Byte]](blobIdx)
          val hist = new Array[Float](dim)
          val img =
            if (real)
              try Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(blob)))
              catch { case _: java.io.IOException => None }
            else None
          img match {
            case Some(im) =>
              var y = 0
              while (y < im.getHeight) {
                var x = 0
                while (x < im.getWidth) {
                  val px = im.getRGB(x, y)
                  hist(((px >> 16) & 0xff) * bins / 256) += 1f
                  hist(bins + (((px >> 8) & 0xff) * bins / 256)) += 1f
                  hist(2 * bins + ((px & 0xff) * bins / 256)) += 1f
                  x += 1
                }
                y += 1
              }
            case None =>
              blob.foreach(b => hist((b & 0xff) % dim) += 1f)
          }
          val norm = math.sqrt(hist.map(x => x.toDouble * x).sum)
          val unit =
            if (norm == 0) hist else hist.map(x => (x / norm).toFloat)
          Row(r.getAs[Number](idIdx).longValue(), unit.toSeq)
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** Batched feature extraction: blobs → `Array[Float]` embeddings,
    * processed in batches of `batchSize` rows per partition — the
    * mapInPandas/Arrow batch shape, where a real extractor would run
    * one model invocation per BATCH (GPU-friendly) with per-partition
    * init. The features themselves are STUBBED deterministically (an
    * L2-normalized byte histogram) so the downstream plumbing —
    * schema, batching, and feeding `Similarity` ANN operators — is
    * exercised for real.
    */
  def extractFeaturesStub(df: DataFrame, blobCol: String, idCol: String,
                          dim: Int = 16, batchSize: Int = 64): DataFrame = {
    val out = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // real extractor: model/session init once per partition here
      rows.grouped(batchSize).flatMap { batch =>
        // real extractor: ONE inference call on the whole batch here
        batch.map { r =>
          val blob = r.getAs[Array[Byte]](blobIdx)
          val hist = new Array[Float](dim)
          blob.foreach(b => hist((b & 0xff) % dim) += 1f)
          val norm = math.sqrt(hist.map(x => x.toDouble * x).sum)
          val unit =
            if (norm == 0) hist else hist.map(x => (x / norm).toFloat)
          Row(r.getAs[Number](idIdx).longValue(), unit.toSeq)
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** Frame sampling for video-like blob sequences: keep every nth
    * frame per group — expression-only, no decode needed.
    */
  def sampleFrames(df: DataFrame, groupCol: String, orderCol: String,
                   n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
    df.withColumn("_frame_idx", F.row_number().over(w) - 1)
      .filter(F.pmod(col("_frame_idx"), lit(n)) === 0)
      .drop("_frame_idx")
  }
}
