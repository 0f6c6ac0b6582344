package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Streaming ingest cleaning for a document stream (schema: doc_id, ts,
  * lang, text) — the streaming twin of the batch
  * [[graft.ops.TextOps.cleanCorpus]] pipeline.
  *
  * Only the stages whose state a stream can bound run here:
  *
  *  1. the quality gate (q49's keep criteria) — stateless per-row
  *     expressions, identical columns to the batch pass;
  *  2. exact content dedup on the portable fingerprint, watermark-bounded
  *     (`dropDuplicatesWithinWatermark`): re-delivered or re-crawled
  *     documents inside the watermark are dropped, and the dedup set is
  *     evicted as event time advances — state never grows past one
  *     watermark of distinct fingerprints, at any rate;
  *  3. the content-keyed split label, stateless.
  *
  * Near-dup LSH and decontamination are deliberately ABSENT: both need
  * corpus-wide state (all bucket members / the full probe gram table
  * joined against everything seen), which an unbounded stream cannot
  * hold. Production runs ingest through this stream for cheap
  * at-the-door hygiene and the full [[graft.ops.TextOps.cleanCorpus]]
  * in the batch compaction pass — the standard lambda split, encoded
  * here by the two operators sharing their stage implementations
  * (same gate expressions, same fingerprint, same split hash), so the
  * stream and the batch pass can never disagree about a document they
  * both keep.
  */
object DocumentStreams {

  def cleanStream(docs: DataFrame, watermark: String = "10 minutes",
                  minTokens: Int = 15, minQuality: Double = 0.6): DataFrame =
    docs
      .filter(TextOps.tokenCount(col("text")) >= minTokens &&
        TextOps.langGuess(col("text")) === col("lang") &&
        TextOps.qualityScore(col("text")) >= minQuality)
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .withColumn("split", TextOps.splitAssign(col("text")))
}
