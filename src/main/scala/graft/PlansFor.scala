package graft

import java.nio.file.{Files, Paths}

/** Full formatted-explain dump for a LIST of queries — the r20
  * optimization round's per-query plan evidence
  * (plans/r20/<query>_{before,after}.txt). Unlike [[Plans]] (tree
  * section only, one file), this writes the COMPLETE
  * `.explain("formatted")` output — tree + node details with
  * PushedFilters/ReadSchema — one file per query, suffixed by the
  * caller.
  *
  * Usage: `runMain graft.PlansFor <outDir> <suffix> <q1,q2,...> [sfDir]`
  */
object PlansFor {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(cpus = 8, appName = "graft-plans-for")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val txt = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
    }
    println(s"wrote ${names.length} plans to $outDir (suffix $suffix)")
    spark.stop()
  }
}
