package graft

/** Every declared contract query must run and produce rows on sf0.001, and
  * the queries/oracleSql maps must stay consistent — the driver's
  * correctness gate silently weakens to rows-only when an oracle entry is
  * missing, so drift is caught here first.
  */
class QueriesSmokeSpec extends SparkSpec {

  // Queries whose oracle can't be expressed in DuckDB SQL get a rows-only
  // check from the driver; everything else must have an oracle entry.
  // Queries whose correct answer on the fixtures IS the empty set (the
  // oracle agrees) — everything else must produce rows.
  private val emptyOk = Set("q30_embed_neardup")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs ${if (emptyOk(name)) "cleanly" else "non-empty"} on sf0.001") {
      val df = fn(spark, sfDir)
      val cols = df.columns.toSeq
      assert(cols.distinct.size === cols.size, s"duplicate output columns: $cols")
      if (emptyOk(name)) df.count() else assert(df.count() > 0)
    }
  }

  test("every query has an oracle entry or is explicitly rows-only") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // keep this list tight: each name here is a weaker correctness check
    val allowed = SparkEntry.rowsOnlyQueries
    assert(rowsOnly.subsetOf(allowed),
      s"queries missing an oracle and not declared rows-only: ${rowsOnly -- allowed}")
  }

  test("no orphan oracle entries") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries with no query: $orphans")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
