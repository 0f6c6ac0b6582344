package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.Engine
import graft.catalog.DataDictionary

/** CLI front door — lifecycle parity with the reference's
  * `main.py --env <LOCAL|HDFS> --mode <hadoop|spark> --dd_path <schema.json>
  * "<sql>"` (reference `main.py:7-25`): load the data dictionary, register
  * its relations, run the SQL, print the first 10 rows and the row count
  * (the reference prints exactly those two, `ra2spark/ra2spark.py:117-118`).
  *
  * Differences, deliberate: `--env`/`--mode` are accepted and ignored
  * (there is only one execution engine here and it scales past both of the
  * reference's); `--format` picks the dd storage layout
  * (parquet/csv/json/tagged-json/tbl) instead of being hardwired to the
  * reference's CSV; and the SQL surface is full Spark SQL, not the
  * reference's SELECT-DISTINCT-only fragment. `--lang ra` routes the
  * query through the RA-string door instead (the reference exposes
  * `run_radb_query_in_spark` programmatically, `ra2spark.py:107-118`;
  * here both text front doors reach the CLI).
  *
  * Usage:
  * {{{
  * runMain graft.Main --dd_path pizza_dd.json --data_dir ./pizza \
  *   --format csv "select distinct Person.name from Person"
  * }}}
  */
object Main {

  private val usage =
    """usage: graft.Main --dd_path <dd.json> [--data_dir <dir>]
      |  [--format parquet|csv|json|tagged-json|tbl] [--lang sql|ra]
      |  [--env X] [--mode X] "<query>"
      |--data_dir defaults to the dd file's directory.
      |--lang ra runs the query as radb relational-algebra text.""".stripMargin

  /** Parsed CLI contract; `sql` is the single positional argument. */
  private[graft] final case class Args(ddPath: String, dataDir: String,
                                       format: String, sql: String,
                                       lang: String = "sql")

  private[graft] def parse(args: Array[String]): Args = {
    var ddPath: Option[String] = None
    var dataDir: Option[String] = None
    var format = "csv" // the reference's on-disk layout
    var lang = "sql"
    var sql: Option[String] = None
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--dd_path"  => ddPath = Some(args(i + 1)); i += 2
        case "--data_dir" => dataDir = Some(args(i + 1)); i += 2
        case "--format"   => format = args(i + 1); i += 2
        case "--lang" =>
          lang = args(i + 1)
          require(lang == "sql" || lang == "ra",
            s"--lang must be sql or ra, got $lang\n$usage")
          i += 2
        // reference-CLI compatibility: execution target selectors are
        // meaningless here (always Spark) but must not be rejected
        case "--env" | "--mode" => i += 2
        case s if sql.isEmpty => sql = Some(s); i += 1
        case other => sys.error(s"unexpected argument: $other\n$usage")
      }
    }
    val dd = ddPath.getOrElse(sys.error(s"--dd_path is required\n$usage"))
    val q = sql.getOrElse(sys.error(s"no query given\n$usage"))
    val dir = dataDir.getOrElse {
      val p = java.nio.file.Paths.get(dd).toAbsolutePath.getParent
      if (p == null) "." else p.toString
    }
    Args(dd, dir, format, q, lang)
  }

  /** Testable core: everything but session construction and printing. */
  private[graft] def run(spark: SparkSession, a: Args): DataFrame = {
    val engine =
      new Engine(spark, DataDictionary.fromFile(a.ddPath), a.dataDir, a.format)
    if (a.lang == "ra") engine.ra(a.sql) else engine.sql(a.sql)
  }

  def main(argv: Array[String]): Unit = {
    val a = parse(argv)
    val spark = GraftSession.local(appName = "graft-cli")
    try {
      val df = run(spark, a)
      df.show(10, truncate = false)
      println(s"count: ${df.count()}")
    } finally spark.stop()
  }
}
