package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  private[graft] def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private[graft] def jsonObj(m: Iterable[(String, String)]): String =
    m.map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }
      .mkString("{", ",", "}")

  /** Run every query and write its result parquet; returns the failure
    * map (insertion-ordered). Round-11 advice (high): a swallowed
    * per-query failure made the broken queries VANISH from the driver's
    * compare — 68 green rows read as a clean round when 9 queries had
    * crashed. A failed query still writes a result parquet (one
    * `_graft_error` row, a schema no oracle can match, so the compare
    * records an explicit mismatch instead of dropping the query) and
    * lands in the returned map → errors.json → non-zero exit.
    */
  private[graft] def runQueries(
      spark: SparkSession,
      queries: Iterable[(String, (SparkSession, String) => DataFrame)],
      sfDir: String, outDir: String): Map[String, String] = {
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
        failures(name) = msg
        System.err.println(s"[verify] $name FAILED: $msg")
        try {
          import spark.implicits._
          Seq(msg).toDF("_graft_error").coalesce(1)
            .write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
    }
    Files.writeString(Paths.get(s"$outDir/errors.json"), jsonObj(failures))
    // ListMap: the scaladoc promises run order, and main's FAILED banner
    // should list queries in the order they broke (failures.toMap would
    // silently reorder past 4 entries)
    scala.collection.immutable.ListMap.from(failures)
  }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg (dev loop only; the driver passes 2): a
    // comma-separated query-name filter, substring match
    val (sfDir, outDir, nameFilter) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(',').toSeq))
    }
    // Single shared session factory (AQE, UTC, timestamp handling for the
    // events table, broadcast threshold) — round-1 verdict fix #4/#7.
    val spark = GraftSession.local(appName = "graft-verify")
    new java.io.File(outDir).mkdirs()
    val selected = nameFilter match {
      case None => SparkEntry.queries
      case Some(fs) =>
        SparkEntry.queries.filter { case (n, _) => fs.exists(n.contains) }
    }
    val failures = runQueries(spark, selected, sfDir, outDir)
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      jsonObj(SparkEntry.oracleSql))
    clearCaches(spark)
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[verify] ${failures.size} queries FAILED: " +
        failures.keys.mkString(", "))
      sys.exit(2)
    }
  }
}
