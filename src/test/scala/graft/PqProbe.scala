package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Scratch measurement main (test scope, not shipped): PQ recall on the
  * fixture embeddings, to pin q92's gate floor empirically. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local(cpus = 8, appName = "pq-probe")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val qs = emb.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(emb, qs, k = 5).select("qid", "nid")
      exact.cache(); val nEx = exact.count()
      for (refine <- Seq(4, 10)) {
        val t0 = System.nanoTime()
        val idx = Similarity.fitPq(emb, m = 8, ksub = 16)
        val approx = Similarity.pqTopK(idx, emb, qs, k = 5, refine = refine)
          .select("qid", "nid")
        val hits = approx.join(exact, Seq("qid", "nid"), "left_semi").count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"PQPROBE dir=$dir refine=$refine recall=${hits.toDouble / nEx}%.3f n=$nEx secs=$secs%.2f")
      }
      val t0 = System.nanoTime()
      val ivfpq = Similarity.fitIvfPq(emb, nlist = 16)
      val approx = Similarity.probeIvfPq(ivfpq, emb, qs, k = 5,
        nprobe = 4, refine = 10).select("qid", "nid")
      val hits = approx.join(exact, Seq("qid", "nid"), "left_semi").count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"IVFPQPROBE dir=$dir recall=${hits.toDouble / nEx}%.3f n=$nEx secs=$secs%.2f")
      exact.unpersist()
    }
    s.stop()
  }
}
