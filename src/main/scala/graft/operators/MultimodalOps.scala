package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column support (BASELINE.json
  * mandate): media travel as opaque `BINARY` payloads with a typed
  * metadata struct; decode / feature-extract / resize / frame-sample
  * run as batched `mapPartitions` over `Dataset[MediaRow]` — the
  * Scala analog of `mapInPandas` (SURVEY §2.11 model-as-function row).
  *
  * The decode KERNELS are deterministic STUBS (this container has no
  * image/audio codecs): a "decoded pixel" is just the payload byte.
  * Everything around them is real and load-bearing — the schema, the
  * binary column handling, the per-partition batching (records are
  * processed in fixed-size batches the way a vectorized codec or an
  * inference runtime wants them), and the partitioning story: media
  * rows hash-partition on media_id, so decode parallelism is
  * data-parallel with no skewed driver involvement, and at 100 TB the
  * payload column stays columnar-compressed parquet that never
  * reaches the driver.
  */
object MultimodalOps {

  /** Typed media row: opaque payload + metadata. */
  case class MediaMeta(width: Int, height: Int, sampleRate: Int, nFrames: Int)
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           byte_mean: Double, byte_min: Int, byte_max: Int,
                           checksum: Long)
  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Int, frame_sum: Long)

  /** Batch size a vectorized decoder would want; exposed for tests. */
  val DecodeBatchSize = 64

  /** STUB decode kernel — deterministic fake standing in for an image
    * codec: each byte is one "pixel" (unsigned). Swap this body for a
    * real codec; the signature (batch in → features out) is the
    * contract. */
  private def decodeKernel(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      val px = m.payload.map(b => (b & 0xff))
      val n = px.length
      var sum = 0L; var mn = 255; var mx = 0; var ck = 0L
      px.foreach { p =>
        sum += p; if (p < mn) mn = p; if (p > mx) mx = p
        ck = (ck * 31 + p) % 72057594037927931L
      }
      MediaFeatures(m.media_id, m.kind, n,
        if (n == 0) 0.0 else sum.toDouble / n,
        if (n == 0) 0 else mn, if (n == 0) 0 else mx, ck)
    }

  /** Decode + feature-extract, batched per partition. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(g => decodeKernel(g.toSeq))
    }
  }

  /** Frame sampling for "video": split the payload into nFrames
    * equal chunks, keep every `stride`-th frame — the Spark-side
    * shape of frame extraction (1 row → N rows, a Generator by
    * mapPartitions). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val nf = math.max(m.meta.nFrames, 1)
      val sz = math.max(m.payload.length / nf, 1)
      (0 until nf by stride).map { f =>
        val chunk = m.payload.slice(f * sz, math.min((f + 1) * sz, m.payload.length))
        Frame(m.media_id, f, chunk.length, chunk.map(b => (b & 0xff).toLong).sum)
      }
    }
  }

  /** "Resize": stride-subsample the payload bytes (the reference's
    * SAMPLE_EVERY=10 pixel subsample, ee_pipeline.py:18,34-47). */
  def resize(media: Dataset[MediaRow], stride: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val sub = m.payload.zipWithIndex.collect { case (b, i) if i % stride == 0 => b }
      m.copy(payload = sub,
        meta = m.meta.copy(width = math.max(m.meta.width / stride, 1)))
    }
  }

  /** Synthesize a deterministic media table from the documents table
    * (UTF-8 bytes as payload; kind round-robins by id) — the test/
    * bench input generator, not a stub: real binary column, real
    * metadata. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (length(col("text")) % 64 + 1).cast("int").as("width"),
        lit(8).cast("int").as("height"),
        lit(16000).cast("int").as("sampleRate"),
        lit(4).cast("int").as("nFrames")).as("meta"))
}
