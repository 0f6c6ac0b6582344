package graft

import org.apache.spark.sql.Row
import graft.ops.Multimodal

/** Multimodal plumbing: binary columns survive the round trip, the image
  * decoder reads REAL PNG/JPEG headers (javax.imageio), the audio decoder
  * reads REAL WAV headers (javax.sound.sampled), video stays a
  * fingerprint-only stub, frame sampling slices deterministically.
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  /** Real PNG bytes of a w×h image, via the JDK's own encoder — the
    * decoder under test must recover the true dimensions from them. */
  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real WAV bytes (16-bit mono PCM) via the JDK's own writer — the
    * header decoder under test must recover rate and duration from them. */
  private def wavBytes(sampleRate: Float, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](frames * 2)),
      fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def mediaDf = {
    val rows = Seq(
      Row(1L, "image", pngBytes(640, 480, 0x336699), Row("image/png", "s1")),
      Row(2L, "image", pngBytes(32, 32, 0xff0000), Row("image/png", "s2")),
      Row(3L, "video", Array.fill(40)(3: Byte), Row("video/mp4", "s1")),
      Row(4L, "audio", wavBytes(8000f, 4000), Row("audio/wav", "s4")),
      Row(5L, "image", Array.fill(16)(1: Byte), Row("image/png", "s3")))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
  }

  test("decodeFeatures reads true dimensions from real PNG bytes") {
    val feats = Multimodal.decodeFeatures(mediaDf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(feats(1L).getInt(3) === 640 && feats(1L).getInt(4) === 480)
    assert(feats(2L).getInt(3) === 32 && feats(2L).getInt(4) === 32)
    assert(feats(3L).isNullAt(3)) // video: stub extracts no dims
    assert(feats(4L).getInt(2) > 0) // n_bytes present for every kind
    assert(feats(5L).isNullAt(3)) // corrupt "image": no reader claims it
    // audio: real WAV header decode — 4000 frames @ 8 kHz = 500 ms
    assert(feats(4L).getInt(5) === 8000 && feats(4L).getLong(6) === 500L)
    assert(feats(1L).isNullAt(5)) // image rows carry no audio fields
    // checksum is deterministic across runs
    val again = Multimodal.decodeFeatures(mediaDf).collect()
      .map(r => r.getLong(0) -> r.getLong(7)).toMap
    assert(feats.map { case (k, v) => k -> v.getLong(7) } === again)
  }

  test("audio decode reads WAV headers and rejects non-audio bytes") {
    assert(Multimodal.audioInfo(wavBytes(44100f, 22050)) ===
      (Some(44100), Some(500L)))
    assert(Multimodal.audioInfo(Array.fill(12)(5: Byte)) === (None, None))
    assert(Multimodal.audioInfo(Array.emptyByteArray) === (None, None))
  }

  test("image decode also understands JPEG bytes") {
    val img = new java.awt.image.BufferedImage(
      48, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    assert(Multimodal.imageDims(out.toByteArray) === (Some(48), Some(24)))
  }

  test("sampleFrames slices every k-th fixed-size frame of video blobs only") {
    val frames = Multimodal.sampleFrames(mediaDf, frameBytes = 10, every = 2)
      .as[(Long, Int, Array[Byte])].collect()
    assert(frames.forall(_._1 === 3L))
    assert(frames.map(_._2).sorted.toSeq === Seq(0, 2)) // frames 0 and 2 of 4
    assert(frames.forall(_._3.length === 10))
  }
}
