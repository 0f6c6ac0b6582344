package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog.DataDictionary

/** Facade mirroring the reference's two entry points (SURVEY §3):
  *  - `sql(...)`  ≈ `run_sql_query_in_spark` (`ra2spark/ra2spark.py:121`) —
  *    but parse/analyze/optimize/plan is all Catalyst;
  *  - `scan(rel)` ≈ `run_radb_query_in_spark`'s raw-RA door
  *    (`ra2spark/ra2spark.py:107-118`) — RA combinators over DataFrame.
  *
  * The reference's SQL surface is `SELECT DISTINCT` only
  * (`sql2ra/functionality.py:37-132`); `sqlDistinct` reproduces that
  * implicit-set-semantics layer for parity tests, while `sql` is full
  * Spark SQL.
  */
final class Engine(val spark: SparkSession, dd: DataDictionary,
                   dataDir: String, format: String = "parquet") {

  dd.register(spark, dataDir, format)

  /** Full Spark SQL over the registered dd views. */
  def sql(query: String): DataFrame = spark.sql(query)

  /** Reference-parity door: results are SETS regardless of whether the
    * query says DISTINCT (the reference frontend only emits π-with-dedup).
    */
  def sqlDistinct(query: String): DataFrame = spark.sql(query).distinct()

  /** RA-combinator door. */
  def scan(rel: String): Relation =
    Relation(spark.table(rel).alias(rel))

  /** RA-STRING door: the reference's radb text syntax
    * (`run_radb_query_in_spark` on a string,
    * `ra2spark/ra2spark.py:107-118`), parsed by [[RaParser]] and lowered
    * onto the same [[Relation]] combinators [[scan]] feeds.
    */
  def ra(query: String): DataFrame = RaParser.parse(query, scan).toDF
}
