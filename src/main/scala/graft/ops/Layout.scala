package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout tools: how rows are ARRANGED on storage decides how much
  * of 100 TB a selective scan actually reads. Sorting clusters one
  * dimension perfectly and leaves every other dimension scattered;
  * Z-ORDERING interleaves the bits of several dimensions into one sort
  * key, so file/row-group min-max statistics stay narrow on ALL of them
  * — a filter on any Z-dimension skips most files (the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`).
  */
object Layout {

  /** The Z-value (Morton code) of `cols`, each min-max scaled to `bits`
    * bits from the supplied (min, max) ranges and bit-interleaved. Pure
    * column arithmetic — codegen-friendly, no UDF. Constant columns
    * (min == max) contribute 0 and are harmless.
    */
  private[ops] def zvalue(cols: Seq[Column], ranges: Seq[(Double, Double)],
                          bits: Int): Column = {
    val k = cols.size
    val maxLevel = (1L << bits) - 1
    val scaled = cols.zip(ranges).map { case (c, (mn, mx)) =>
      if (mx <= mn) lit(0L)
      else least(greatest(
        floor((c.cast("double") - mn) / (mx - mn) * maxLevel).cast("long"),
        lit(0L)), lit(maxLevel))
    }
    (0 until bits).flatMap { b =>
      scaled.zipWithIndex.map { case (s, i) =>
        shiftright(s, b).bitwiseAND(lit(1L)) * lit(1L << (b * k + i))
      }
    }.reduce(_ + _)
  }

  /** Rewrite `df` into a Z-ordered layout over `colNames`: one tiny
    * min/max aggregation fixes the scaling ranges, then a single
    * range-shuffle on the Z-value plus an in-partition sort produce
    * `numFiles` output splits whose min-max envelopes are narrow in
    * EVERY Z-dimension. Write the result straight to parquet/ORC and the
    * format's file/row-group stats do the pruning. Cost: one shuffle —
    * the same price as any repartition — amortized over every selective
    * scan that follows.
    */
  def zorderBy(df: DataFrame, colNames: Seq[String], numFiles: Int,
               bits: Int = 16): DataFrame =
    zorderBy(df, colNames, numFiles, columnRanges(df, colNames), bits)

  /** Precomputed-ranges variant: a caller laying out MANY tables (or the
    * same table repeatedly) reuses catalog/previously-computed column
    * stats instead of paying the [[columnRanges]] min/max scan per call.
    * Ranges only fix the Z-value SCALING — stale-but-roughly-right stats
    * still cluster well (out-of-range values clamp to the edge cells),
    * so reuse across appends is safe.
    */
  def zorderBy(df: DataFrame, colNames: Seq[String], numFiles: Int,
               ranges: Seq[(Double, Double)], bits: Int): DataFrame = {
    require(colNames.size >= 2, "z-ordering needs at least 2 columns")
    require(colNames.size == ranges.size,
      s"${colNames.size} cols but ${ranges.size} ranges")
    require(colNames.size * bits <= 62,
      s"${colNames.size} cols x $bits bits exceeds a long z-value")
    require(numFiles > 0, "numFiles must be positive")
    val z = zvalue(colNames.map(col), ranges, bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }

  /** One tiny min/max aggregation (a single driver row) fixing the
    * Z-value scaling ranges for `colNames`; feed the result to the
    * precomputed-ranges [[zorderBy]] overload to layout-rewrite several
    * tables without re-scanning for stats each time.
    */
  def columnRanges(df: DataFrame, colNames: Seq[String])
      : Seq[(Double, Double)] = {
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    colNames.indices.map(i => (row.getDouble(2 * i), row.getDouble(2 * i + 1)))
  }

  /** Per-shard export manifest — the file-statistics relation a data
    * lake keeps next to every export (zone maps + integrity): for each
    * shard, row count, the `idCol` zone map (min/max — the stats a
    * reader uses to SKIP shards, exactly the parquet row-group
    * trick at shard grain), total content chars, and an
    * ORDER-INVARIANT content checksum: `bit_xor` of the portable
    * per-row fingerprint. XOR — not sum — because it cannot overflow
    * at any corpus size and any row order / partitioning produces the
    * same value, so manifests computed by different engines or at
    * different parallelism agree bit-for-bit (the fingerprint is the
    * portable mod-1e9+7 hash, DuckDB-replayable; a cryptographic
    * digest would be stronger against adversaries but is not
    * replayable as a column expression — this manifest detects
    * corruption and drift, not malice, like parquet column stats).
    * One shard-keyed aggregate; manifest cardinality = shard count.
    */
  def exportManifest(df: DataFrame, shardCol: String, idCol: String,
                     textCol: String): DataFrame =
    df.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_rows"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"),
        expr(s"bit_xor(${fpExprSql(textCol)})").as("checksum"),
        sum(length(coalesce(col(textCol), lit("")))).cast("long")
          .as("n_chars"))

  private def fpExprSql(textCol: String): String =
    s"portable_fingerprint(concat('manifest:', coalesce($textCol, '')))"

  /** Zone-map pruned scan — the CONSUMPTION side of
    * [[exportManifest]]: given a range predicate on `idCol`, consult
    * the manifest's per-shard min/max and scan ONLY shards whose zone
    * `[min_id, max_id]` intersects `[lo, hi]`, then apply the residual
    * row filter. The shard list is a broadcast semi-join (manifest
    * cardinality, never corpus); on a file-per-shard layout the same
    * list prunes PATHS before any IO — this relational form is the
    * engine-checkable equivalent, and the one a 100 TB reader uses
    * through partition values. Soundness, not tightness: a shard with
    * stale-wide zones costs a scan but never wrongness — pruned output
    * ≡ the plain filter (the q146 oracle gates exactly that identity),
    * while the SAVINGS show up as absent shards, not absent rows.
    *
    * The pruning join is ANTI against the shards the manifest
    * POSITIVELY rules out (`max_id < lo` or `min_id > hi`), never SEMI
    * against the ones it rules in — the difference is exactly what
    * happens to a shard the manifest does not cover (new data landed
    * after the manifest pass, a lost manifest row): under anti-dead it
    * is scanned and residual-filtered (a missed saving, still ≡ the
    * plain filter); under semi-live it would be silently DROPPED (a
    * stale manifest producing wrong answers, the one failure mode a
    * pruning layer must never have). NULL zones likewise fail the dead
    * test and stay scanned. LayoutSpec pins the uncovered-shard case.
    */
  def pruneByManifest(df: DataFrame, manifest: DataFrame,
                      shardCol: String, idCol: String,
                      lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, s"pruneByManifest: empty range [$lo, $hi]")
    val dead = manifest
      .filter(col("max_id") < lo || col("min_id") > hi)
      .select(col(shardCol))
    df.join(broadcast(dead), Seq(shardCol), "left_anti")
      .filter(col(idCol) >= lo && col(idCol) <= hi)
  }

  /** Verify a (possibly tampered / partially lost) copy against a
    * stored manifest: recompute [[exportManifest]] on the copy and
    * full-join per shard, emitting one row per shard with each
    * invariant's verdict — rows / zone map / checksum / chars — plus
    * presence booleans (a shard in the manifest but absent from the
    * copy is LOST, the reverse is FOREIGN data; both must surface,
    * which is why the join is FULL, never inner). Cost: one aggregate
    * over the copy + a shard-cardinality join — verification never
    * rescans more than the manifest pass did.
    */
  def verifyManifest(df: DataFrame, manifest: DataFrame,
                     shardCol: String, idCol: String,
                     textCol: String): DataFrame = {
    val re = exportManifest(df, shardCol, idCol, textCol)
      .select(col(shardCol), col("n_rows").as("a_rows"),
        col("min_id").as("a_min"), col("max_id").as("a_max"),
        col("checksum").as("a_sum"), col("n_chars").as("a_chars"))
    val exp = manifest.select(col(shardCol), col("n_rows").as("e_rows"),
      col("min_id").as("e_min"), col("max_id").as("e_max"),
      col("checksum").as("e_sum"), col("n_chars").as("e_chars"))
    re.join(exp, Seq(shardCol), "full")
      .select(col(shardCol),
        col("a_rows").isNotNull.as("in_copy"),
        col("e_rows").isNotNull.as("in_manifest"),
        coalesce(col("a_rows") === col("e_rows"), lit(false))
          .as("rows_ok"),
        coalesce(col("a_min") === col("e_min") &&
          col("a_max") === col("e_max"), lit(false)).as("zone_ok"),
        coalesce(col("a_sum") === col("e_sum"), lit(false))
          .as("checksum_ok"),
        coalesce(col("a_chars") === col("e_chars"), lit(false))
          .as("chars_ok"))
  }

  /** Compaction plan for the small-files problem — THE operational
    * disease of a 100 TB lakehouse (a day of streaming egress leaves
    * millions of KB-sized files; every downstream scan then pays an
    * open/seek per file and the NameNode/manifest pays the metadata):
    * assign each file to a compaction group of ≈ `targetBytes`, one
    * group = one rewrite task. Deterministic first-fit in ID order
    * WITHIN each partition column value (compaction never merges
    * across partitions): `group = exclusive-prefix-sum(bytes) div
    * targetBytes` — the classic streaming bin-pack: a file joins the
    * group of the targetBytes-stripe its first byte lands in on the
    * partition's cumulative byte axis. Guarantees that matter for the
    * rewrite fleet: group count ≤ ⌈partition bytes / targetBytes⌉ (the
    * axis has that many stripes), so the MEAN rewrite is ≥ targetBytes
    * and the task list is bounded; a group is underfilled only by the
    * previous file's overhang into its stripe (< that one file), never
    * by systematic fragmentation. No float, no collect: one window over
    * (partition, id) — file METADATA grain (millions of rows for
    * billions of data rows), where a global sort is free next to one
    * data scan. Output keeps (file, bytes, group) plus the group's
    * rewrite size so the executor sizing is read off the plan.
    * int64 bound: prefix sums live at total-bytes scale — 2⁶³ bytes
    * = 8 EB, four orders past the fleet.
    */
  def compactionPlan(files: DataFrame, partCol: String, fileCol: String,
                     bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes >= 1,
      s"compactionPlan: targetBytes must be >= 1, got $targetBytes")
    import org.apache.spark.sql.expressions.Window
    val prefix = Window.partitionBy(col(partCol)).orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val group = Window.partitionBy(col(partCol), col("grp"))
    files
      .select(col(partCol), col(fileCol),
        col(bytesCol).cast("long").as("f_bytes"))
      .withColumn("cum_prev",
        coalesce(sum(col("f_bytes")).over(prefix), lit(0L)))
      .withColumn("grp", expr(s"cum_prev div $targetBytes"))
      .drop("cum_prev")
      .withColumn("grp_bytes", sum(col("f_bytes")).over(group))
      .withColumn("grp_files", count(lit(1)).over(group))
  }
}
