import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** graft — a Spark-native analytics engine with the query surface of the
  * reference SQL→RA engine (see SURVEY.md) plus the breadth a large-scale
  * training-data pipeline needs (dedup, similarity search, text analysis,
  * streaming). Everything is expressed as Catalyst logical plans via the
  * DataFrame API so predicate pushdown / column pruning / join selection /
  * AQE come for free and survive a 1000-executor scale-up.
  */
package object graft {

  /** Read one of the driver's parquet fixture tables from a scale-factor
    * directory. Plain `spark.read.parquet` → vectorized scan with filter
    * and column pushdown.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The `events` table stores TIMESTAMP(NANOS), which Spark surfaces as
    * epoch-nanos LongType (spark.sql.legacy.parquet.nanosAsLong). Expose a
    * proper timestamp column `ts` (microsecond precision, UTC) plus the
    * exact nanos for code that wants them.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // `div` = integer division: epoch-nanos exceed 2^53, so the `/`
      // (double) operator would lose microsecond precision near boundaries.
      raw.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(
          org.apache.spark.sql.functions.expr("ts_ns div 1000")))
    else raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
  }

  /** Release everything graft memoizes against `spark`: the materialized
    * near-dup pair set (persisted RDD blocks) and the SQL-door Engine.
    * Call at teardown (Bench/Verify do) or between corpora on a
    * long-lived session; queries re-derive lazily on next use.
    */
  def clearCaches(spark: SparkSession): Unit = {
    queries.PipelineQueries.clearCache(spark)
    queries.AnalyticQueries.clearEngine(spark)
  }

  /** Money-style doubles summed as exact integer cents: per-row IEEE double
    * arithmetic is bit-identical across engines, but the ORDER of a
    * distributed double sum is not — so round each row to cents first and
    * sum exact longs. Keeps aggregate results hash-comparable with the
    * DuckDB oracle at any parallelism.
    */
  def cents(c: Column): Column = round(c * 100).cast("long")
}
