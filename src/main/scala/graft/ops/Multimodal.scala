package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride through the engine
  * as opaque `binary` columns plus a typed metadata struct, processed in
  * per-partition batches.
  *
  * The Spark-side architecture here is the real deliverable — schema,
  * partitioning, batch iteration shape. The IMAGE branch is a real
  * decoder (`javax.imageio`, ships in the JDK): it reads true
  * width/height from PNG/JPEG/GIF/BMP bytes. The AUDIO branch is a real
  * header decoder too (`javax.sound.sampled`, also JDK-built-in): it
  * reads sample rate and frame length from WAV/AIFF/AU headers and
  * derives duration. Only VIDEO decode remains a clearly-marked
  * deterministic STUB: no container/codec parser ships with the JDK, and
  * at 100 TB the decode body is the only part that changes (swap the
  * stub for JNI/FFmpeg calls; the partitioning and memory story stays).
  *
  * Scale notes: decode runs via `mapPartitions` on the scan partitions —
  * no shuffle before decode; `maxPartitionBytes` controls batch memory;
  * decoded features are small structs so the expensive bytes never move
  * over the network (project-then-shuffle, never shuffle-then-project).
  */
object Multimodal {

  /** Metadata carried alongside every blob. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image|audio|video
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("source", StringType, nullable = true))), nullable = true)))

  /** Extracted-feature schema appended by [[decodeFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("checksum", LongType, nullable = false)))

  /** Real image header decode via `javax.imageio` (JDK built-in, works on
    * every executor with no extra dependency). Reads ONLY the header —
    * `ImageReader.getWidth/getHeight(0)` never materializes the pixel
    * raster, so a 50 MB JPEG costs a few KB of parsing, which is the
    * behavior you want when this runs over 100 TB of media blobs.
    * Returns None for bytes no registered reader understands.
    */
  private[graft] def imageDims(content: Array[Byte])
      : (Option[Int], Option[Int]) = {
    // MemoryCacheImageInputStream directly over the in-memory bytes:
    // ImageIO.createImageInputStream would default to a FILE-cache wrapper
    // (a temp file created+deleted per blob — per-row disk churn at scale)
    // and can return null when no SPI is registered.
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (readers.hasNext) {
        val r = readers.next()
        try {
          r.setInput(iis)
          (Some(r.getWidth(0)), Some(r.getHeight(0)))
        } catch {
          // NonFatal, not just IOException: JDK readers throw
          // IllegalArgumentException / IndexOutOfBoundsException /
          // NegativeArraySizeException on adversarial bytes, and one bad
          // blob must degrade to (None, None), not kill the task.
          case scala.util.control.NonFatal(_) => (None, None)
        } finally r.dispose()
      } else (None, None)
    } finally iis.close()
  }

  /** Real audio header decode via `javax.sound.sampled` (JDK built-in,
    * zero new dependencies). `AudioSystem.getAudioFileFormat` parses ONLY
    * the WAV/AIFF/AU header — never the sample data — so like
    * [[imageDims]] it costs a few KB of parsing per blob regardless of
    * blob size. Duration is derived as frameLength / frameRate. Returns
    * (None, None) for bytes no registered provider understands, or when
    * the header omits frame length/rate.
    */
  private[graft] def audioInfo(content: Array[Byte])
      : (Option[Int], Option[Long]) =
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(content))
      val rate = aff.getFormat.getSampleRate
      val frames = aff.getFrameLength
      val sr = if (rate > 0) Some(math.round(rate)) else None
      val dur =
        if (frames >= 0 && rate > 0) Some(math.round(frames * 1000.0 / rate))
        else None
      (sr, dur)
    } catch {
      // UnsupportedAudioFileException for non-audio bytes, plus the same
      // adversarial-input RuntimeExceptions as the image path.
      case scala.util.control.NonFatal(_) => (None, None)
    }

  /** Per-blob decode: images through the real [[imageDims]] reader, audio
    * through the real [[audioInfo]] header parser; video fingerprint-only
    * — a deterministic STUB for the codec call (FFmpeg-class libraries
    * aren't in this environment; replace this branch in a real
    * deployment, signature and call-site batch shape stay as-is).
    */
  private[ops] def decodeStub(kind: String, content: Array[Byte])
      : (Option[Int], Option[Int], Option[Int], Option[Long], Long) = {
    val dims = if (kind == "image") imageDims(content) else (None, None)
    val audio = if (kind == "audio") audioInfo(content) else (None, None)
    var cs = 0L
    var i = 0
    while (i < content.length) { cs = cs * 131 + (content(i) & 0xff); i += 1 }
    (dims._1, dims._2, audio._1, audio._2, cs)
  }

  /** Per-partition batched feature extraction over binary media columns.
    * Input must carry [[mediaSchema]] columns; output is [[featureSchema]].
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val out = media.sparkSession.createDataFrame(
      media.select("media_id", "kind", "content").rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val kind = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          val (w, h, sr, dur, cs) = decodeStub(kind, bytes)
          Row(id, kind, bytes.length, w.map(Int.box).orNull,
            h.map(Int.box).orNull, sr.map(Int.box).orNull,
            dur.map(Long.box).orNull, cs)
        }
      }, featureSchema)
    out
  }

  /** Deterministic frame sampling for video blobs: every k-th fixed-size
    * frame slice, exploded to one row per sampled frame — the Spark-side
    * shape of a real frame extractor (which would seek keyframes instead).
    * Pure column expressions; no shuffle.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, every: Int): DataFrame =
    media
      .filter(col("kind") === "video")
      .select(col("media_id"),
        explode(transform(
          sequence(lit(0),
            greatest((length(col("content")) / frameBytes - 1).cast("int"),
              lit(0)), lit(every)),
          i => struct(i.as("frame_no"),
            substring(col("content"), i * frameBytes + 1, lit(frameBytes))
              .as("frame"))))
          .as("f"))
      .select(col("media_id"), col("f.frame_no").as("frame_no"),
        col("f.frame").as("frame"))
}
