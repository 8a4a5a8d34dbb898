package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.{MediaMeta, MediaRow}

class MultimodalSpec extends SparkSpec {

  private def media = {
    import spark.implicits._
    Seq(
      MediaRow(1L, "image", "abcdefgh".getBytes("UTF-8"), MediaMeta(8, 1, 0, 1)),
      MediaRow(2L, "video", (0 until 40).map(_.toByte).toArray, MediaMeta(10, 1, 0, 4)),
      MediaRow(3L, "audio", Array.emptyByteArray, MediaMeta(0, 0, 16000, 1)),
    ).toDS()
  }

  test("decodeFeatures computes byte stats incl. empty payload") {
    val f = MultimodalOps.decodeFeatures(media).collect().sortBy(_.media_id)
    assert(f(0).n_bytes == 8 && f(0).byte_min == 'a'.toInt && f(0).byte_max == 'h'.toInt)
    assert(f(0).byte_mean == ('a' to 'h').map(_.toInt).sum / 8.0)
    assert(f(2).n_bytes == 0 && f(2).byte_mean == 0.0)
  }

  test("decodeFeatures is deterministic and partition-independent") {
    val a = MultimodalOps.decodeFeatures(media.repartition(1)).collect().sortBy(_.media_id).toSeq
    val b = MultimodalOps.decodeFeatures(media.repartition(3)).collect().sortBy(_.media_id).toSeq
    assert(a == b)
  }

  test("sampleFrames splits payload into nFrames chunks with stride") {
    val fr = MultimodalOps.sampleFrames(media.filter(col("media_id") === 2L), stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(fr.map(_.frame_idx).toSeq == Seq(0, 2)) // 4 frames, stride 2
    assert(fr.forall(_.frame_bytes == 10)) // 40 bytes / 4 frames
    assert(fr(0).frame_sum == (0 until 10).sum.toLong)
  }

  test("resize stride-subsamples payload and updates metadata") {
    val r = MultimodalOps.resize(media.filter(col("media_id") === 2L), stride = 4)
      .collect().head
    assert(r.payload.length == 10) // every 4th of 40
    assert(r.meta.width == 2) // 10 / 4 floored, min 1
    assert(r.payload.toSeq == (0 until 40 by 4).map(_.toByte).toSeq)
  }

  test("mediaFromDocuments yields binary payload with typed metadata") {
    import spark.implicits._
    val docs = Seq((7L, "hello", "en", "src1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = MultimodalOps.mediaFromDocuments(docs).as[MediaRow].collect().head
    assert(m.kind == "audio") // 7 % 3 == 1
    assert(new String(m.payload, "UTF-8") == "hello")
    assert(m.meta.width == 6 && m.meta.nFrames == 4)
  }
}
