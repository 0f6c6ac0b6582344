package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** The composed HEADLINE run (round-13 verdict #8): the whole
  * training-data pipeline a curation job actually ships — quality gate →
  * near-dup dedup → decontaminate → split → temperature mix → shard →
  * pack → partitioned parquet export — timed as ONE wall-clock number
  * with the composition's shuffle census, so a round has a single
  * regression tripwire for the pipeline as a whole instead of per-query
  * rows (each stage stays individually oracle-gated: q49/q39/q61/q55
  * via q63, q83, q65, q66, q81).
  *
  * Stage contracts composed here:
  *  - [[TextOps.cleanCorpus]]: gate → dedup over the GATED corpus →
  *    contamination df-cap over the DEDUPED corpus → split (the q63
  *    inter-stage order, oracle-pinned);
  *  - q83's mix shape: ONE source-count aggregate feeds both the
  *    temperature weights and the rebalance targets;
  *  - q81's export shape: shard → pack reuses the shard exchange (the
  *    OpsSpec two-shuffle floor), and the final write repartitions on
  *    the shard key so every executor writes whole shards.
  *
  * Timing covers EVERYTHING from pipeline construction through the
  * parquet commit — including the driver-side plan collects
  * (sourceCounts, the rebalance plan table) that are genuinely part of
  * what the pipeline costs. Row accounting reads the written files
  * afterwards, outside the clock.
  *
  * Usage: `runMain graft.Headline [sfDir] [exportDir]` — defaults
  * localdata/sf1 and a temp dir. Prints one JSON line and writes it to
  * headline_out.json (SPARK_GRAFT_HEADLINE_OUT to override).
  */
object Headline {

  private def fingerprint(df: org.apache.spark.sql.DataFrame): Map[String, Int] = {
    val plan = df.queryExecution.executedPlan.toString
    def n(p: String) = p.r.findAllIn(plan).size
    Map(
      "exchange" -> (n("\\bExchange hashpartitioning") +
        n("\\bExchange rangepartitioning") + n("\\bExchange SinglePartition")),
      "smj" -> n("\\bSortMergeJoin"),
      "bhj" -> n("\\bBroadcastHashJoin"),
      "cartesian" -> (n("\\bCartesianProduct") + n("\\bBroadcastNestedLoopJoin")))
  }

  private def loadNow(): Double = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean.getSystemLoadAverage

  private def bandOf(preload: Double): String = {
    val cpus = Runtime.getRuntime.availableProcessors
    val cleanCut = math.min(2.0, cpus * 0.25)
    if (preload <= cleanCut) "clean"
    else if (preload <= math.max(cpus * 0.25, 2 * cleanCut)) "loaded"
    else "polluted"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("localdata/sf1")
    val exportDir = args.lift(1).getOrElse(
      Files.createTempDirectory("graft-headline").toString)
    val spark = GraftSession.local(appName = "graft-headline")

    val nShards = 32
    val ctxTokens = 1024

    def runOnce(): (Double, Map[String, Int]) = {
      val docs = table(spark, sfDir, "documents")
      val t0 = System.nanoTime()
      // 1–4: gate → near-dup dedup → decontaminate (vs the src0 eval
      // set) → split, the q63 composition
      val cleaned = TextOps.cleanCorpus(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        contamMaxGramDocFreq = 10)
      // 5: temperature mix at the canonical alpha = 0.5 — counts
      // collected ONCE, feeding weights and targets both (q83)
      val counts = TextOps.sourceCounts(cleaned, "source")
      val w = TextOps.temperatureWeights(counts, alpha = 0.5)
      val mixed = TextOps.rebalanceMixture(cleaned, "source", "doc_id",
        "text", w, oversample = 4.0, sourceCounts = counts).drop("rnk")
      // 6–7: content-keyed shard layout + context-window packing (the
      // pack window rides the shard exchange — q81's two-shuffle floor
      // for this tail)
      val packed = TextOps.packSequences(
        TextOps.shuffleShard(mixed, "doc_id", "text", nShards),
        "text", "shard", "pos", ctxTokens)
      // 8: export — whole shards per task, byte-identical re-runs
      val fp = fingerprint(packed)
      packed.repartition(nShards, col("shard"))
        .sortWithinPartitions(col("shard"), col("pos"))
        .write.partitionBy("shard").mode("overwrite").parquet(exportDir)
      ((System.nanoTime() - t0) / 1e9, fp)
    }

    // one warm-load pass (JVM/codegen warmup — the Bench discipline),
    // then N timed attempts, archiving the MINIMUM wall with each
    // attempt's pre-run load (r19 verdict #6: a single timed pass
    // swung 2× intra-day two rounds running on container noise alone,
    // so the tripwire could no longer see a real 2× stage regression;
    // min-of-attempts is the same discipline Bench already applies)
    val attempts = sys.env.getOrElse("SPARK_GRAFT_HEADLINE_ATTEMPTS", "3")
      .toInt.max(1)
    val _ = runOnce()
    clearCaches(spark)
    val runs = (1 to attempts).map { i =>
      val pl = loadNow()
      val (w, f) = runOnce()
      clearCaches(spark)
      System.gc(); Thread.sleep(300)
      println(f"[headline] attempt $i/$attempts wall=$w%.2fs " +
        f"preload=$pl%.1f (${bandOf(pl)})")
      (w, f, pl)
    }
    val (wall, fp, preload) = runs.minBy(_._1)
    val loadBand = bandOf(preload)

    // row accounting AFTER the clock, from the committed files
    val exported = spark.read.parquet(exportDir)
    val rowsExported = exported.count()
    val nSeqs = exported.groupBy(col("shard"))
      .agg(max(col("seq_last")).as("m"))
      .agg(sum(col("m") + 1L)).head().getLong(0)
    val rowsIn = table(spark, sfDir, "documents").count()

    val fpJson = s"""{"exchange":${fp("exchange")},"smj":${fp("smj")},""" +
      s""""bhj":${fp("bhj")},"cartesian":${fp("cartesian")}}"""
    val wallsJson = runs.map(r => f"${r._1}%.2f").mkString("[", ",", "]")
    val preloadsJson = runs.map(r => f"${r._3}%.1f").mkString("[", ",", "]")
    val line =
      f"""{"metric":"headline_pipeline","wall_sec":$wall%.2f,"attempts":$attempts,"walls":$wallsJson,"preloads":$preloadsJson,"sf_dir":${Verify.jsonStr(sfDir)},"rows_in":$rowsIn,"rows_exported":$rowsExported,"n_seqs":$nSeqs,"n_shards":$nShards,"ctx_tokens":$ctxTokens,"census":$fpJson,"load_band":"$loadBand","preload":$preload%.2f}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_HEADLINE_OUT",
      "headline_out.json")
    Files.writeString(Paths.get(outPath), line + "\n")
    println(line)
    clearCaches(spark)
    spark.stop()
  }
}
