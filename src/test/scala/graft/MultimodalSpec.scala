package graft

import org.apache.spark.sql.Row
import graft.ops.Multimodal

/** Multimodal plumbing: binary columns survive the round trip, the
  * (stubbed) decoder sees per-partition batches, frame sampling slices
  * deterministically.
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def imageBytes(w: Int, h: Int, payload: Byte): Array[Byte] = {
    val header = java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array()
    header ++ Array.fill(16)(payload)
  }

  private def mediaDf = {
    val rows = Seq(
      Row(1L, "image", imageBytes(640, 480, 7), Row("image/png", "s1")),
      Row(2L, "image", imageBytes(32, 32, 9), Row("image/png", "s2")),
      Row(3L, "video", Array.fill(40)(3: Byte), Row("video/mp4", "s1")),
      Row(4L, "audio", Array.fill(12)(5: Byte), null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
  }

  test("decodeFeatures extracts dimensions from image headers, sizes all kinds") {
    val feats = Multimodal.decodeFeatures(mediaDf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(feats(1L).getInt(3) === 640 && feats(1L).getInt(4) === 480)
    assert(feats(2L).getInt(3) === 32)
    assert(feats(3L).isNullAt(3)) // video: stub extracts no dims
    assert(feats(4L).getInt(2) === 12) // n_bytes present for every kind
    // checksum is deterministic
    val again = Multimodal.decodeFeatures(mediaDf).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(feats.map { case (k, v) => k -> v.getLong(5) } === again)
  }

  test("sampleFrames slices every k-th fixed-size frame of video blobs only") {
    val frames = Multimodal.sampleFrames(mediaDf, frameBytes = 10, every = 2)
      .as[(Long, Int, Array[Byte])].collect()
    assert(frames.forall(_._1 === 3L))
    assert(frames.map(_._2).sorted.toSeq === Seq(0, 2)) // frames 0 and 2 of 4
    assert(frames.forall(_._3.length === 10))
  }
}
