package graft

import org.apache.spark.sql.functions._

/** Deterministic power-law-vocabulary corpus generator backing the
  * BASELINE.md "BM25 postings selectivity" and vocabulary-family
  * measurements: 200k docs × 60 tokens, term rank log-uniform over a
  * 100k-term vocabulary (≈ zipf rank-frequency), every token derived
  * from `xxhash64(doc_id:pos)` — no RNG state, byte-identical on every
  * run and cluster size. The fixtures' 31-term corpus cannot exercise
  * vocabulary-selectivity behavior; this one can, and regenerating it
  * is one command: `runMain graft.GenPowerlaw [outPath] [nDocs]`.
  */
object GenPowerlaw {
  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse("localdata/powerlaw")
    val nDocs = args.lift(1).map(_.toLong).getOrElse(200000L)
    val spark = GraftSession.local(appName = "graft-gen-powerlaw")
    val vocab = 100000.0
    def u(c: org.apache.spark.sql.Column) =
      pmod(xxhash64(c), lit(1000000007L)).cast("double") / 1000000007.0
    spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(59)),
          j => concat(lit("t"), floor(exp(log(lit(vocab)) *
            u(concat(col("id").cast("string"), lit(":"),
              j.cast("string"))))).cast("long").cast("string")))).as("text"))
      .write.mode("overwrite").parquet(out)
    println(s"wrote $nDocs power-law docs to $out")
    spark.stop()
  }
}
