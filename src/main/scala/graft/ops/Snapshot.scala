package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot maintenance for corpora stored as plain parquet — the
  * MERGE-style change application (CDC compaction / SCD type 1:
  * latest-version-wins upsert + tombstone delete) that table formats
  * ship as `MERGE INTO`, expressed Spark-first over format-less files:
  * a corpus version is a directory, a change batch is a relation of
  * full rows tagged `(version, deleted)`, and compaction is ONE
  * id-keyed window over the union — no per-row point lookups, no
  * transaction log required to RESOLVE (the log's job is concurrency,
  * not the merge semantics).
  *
  * The reference engine has no mutation surface at all; this module is
  * the ingestion-maintenance sibling of the stored-artifact lifecycles
  * (CorpusIndex / SpanIndex / FreqIndex extend): those keep INDEXES
  * current under new data, this keeps the CORPUS itself current under
  * updates and deletes.
  */
object Snapshot {

  /** Apply a change batch to a base snapshot: per id the row with the
    * HIGHEST `versionCol` wins (a delete tombstone wins ties at the same
    * version — a change batch that both updates and deletes an id at
    * one version means delete), and winners flagged `deleteCol` are
    * dropped entirely (tombstones compact away; they must ride IN
    * `changes` — physical deletion is exactly what this pass is for).
    * Inserts are just change rows whose id the base lacks.
    *
    * Both inputs must share a schema including `idCol`, an integer-like
    * `versionCol`, and a boolean `deleteCol`; base rows carry their own
    * versions, so compaction composes — applying batch B2 to
    * `applyChanges(base, B1)` equals applying `B1 ∪ B2` to base
    * (OpsSpec-pinned) — PROVIDED versions are monotone across batches
    * (every B2 version for an id ≥ every B1 version for it, the normal
    * CDC sequencing). The caveat is real, not theoretical: a compacted
    * tombstone is GONE, so a later-arriving row with a STALE version
    * would win against the compacted snapshot but lose in the merged
    * replay — out-of-order change feeds must be re-sequenced before
    * compaction, exactly as every CDC consumer requires.
    *
    * Scale shape: one id-keyed window over base ∪ changes — a single
    * exchange, state one row per id; at 100 TB this is the standard
    * periodic-compaction job (the read side between compactions can
    * apply the same window over base ∪ pending-changes views).
    */
  def applyChanges(base: DataFrame, changes: DataFrame, idCol: String,
                   versionCol: String = "version",
                   deleteCol: String = "deleted"): DataFrame = {
    require(base.columns.sorted.sameElements(changes.columns.sorted),
      s"applyChanges: base and changes schemas differ — base has " +
        s"[${base.columns.sorted.mkString(", ")}], changes has " +
        s"[${changes.columns.sorted.mkString(", ")}]")
    require(!base.columns.contains("__rn"),
      "applyChanges adds column __rn which already exists in the input")
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(versionCol).desc, col(deleteCol).desc)
    base.unionByName(changes)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col(deleteCol))
      .drop("__rn")
  }

  /** SCD type 2 intervalization — [[applyChanges]]'s history-keeping
    * sibling: instead of compacting to the latest state, turn the FULL
    * change history into validity intervals, the dimension-table shape
    * every warehouse keeps for "what did this row say at time t"
    * queries. Each surviving non-delete event opens an interval
    * `[valid_from = its version, valid_to = next event's version)`;
    * the last event of an id leaves `valid_to` NULL with
    * `is_current = true`; delete tombstones never appear as rows —
    * they only CLOSE their predecessor's interval. Same-version ties
    * resolve exactly as [[applyChanges]] (delete wins), and an id can
    * be revived after a delete — it simply opens a new interval, so an
    * id's timeline may have gaps (the delete..reinsert span), which is
    * the honest history.
    *
    * Scale shape: ONE exchange on `idCol`. The tie-dedup is a `lag`
    * comparison inside a window sorted `(version ASC, deleted DESC)`,
    * and the interval `lead` runs over a window with the SAME
    * partitioning and a compatible prefix ordering, so Catalyst plans
    * both Window operators over a single shuffle + sort (no
    * per-(id, version) second exchange — PlanSpec-visible). State is
    * one row per change event, never corpus-sized history in memory.
    */
  /** Right-to-be-forgotten propagation — apply a deletion list (the
    * GDPR/CCPA forget set) to a keyed relation and return the AUDIT
    * row the compliance log requires: rows before, rows deleted, rows
    * after, and distinct forgotten keys actually present (a forget
    * list routinely names keys a table never had — the audit must
    * distinguish "nothing to delete" from "delete failed"). The scrub
    * itself is [[scrubForgotten]] (one anti-join, forget side
    * broadcast when small); this audit is ONE aggregate over a
    * left-join membership flag — the before/deleted/after counts come
    * from a single pass, never three scans.
    */
  def forgetAudit(df: DataFrame, keyCol: String, forget: DataFrame,
                  forgetKeyCol: String, tableName: String): DataFrame = {
    val f = forget.select(col(forgetKeyCol).as("__fk")).distinct()
    df.join(broadcast(f), col(keyCol) === col("__fk"), "left")
      .agg(count(lit(1)).as("n_before"),
        count(col("__fk")).as("n_deleted"),
        countDistinct(col("__fk")).as("n_keys_hit"))
      .select(lit(tableName).as("table_name"), col("n_before"),
        col("n_deleted"), (col("n_before") - col("n_deleted"))
          .as("n_after"), col("n_keys_hit"))
  }

  /** The scrub half of [[forgetAudit]]: drop every row whose key is on
    * the forget list. One anti-join; run the audit FIRST (the deleted
    * rows are gone afterwards, by design). */
  def scrubForgotten(df: DataFrame, keyCol: String, forget: DataFrame,
                     forgetKeyCol: String): DataFrame =
    df.join(broadcast(forget.select(col(forgetKeyCol).as("__fk"))
        .distinct()),
      col(keyCol) === col("__fk"), "left_anti")

  /** Schema-evolution union — read N corpus versions whose schemas
    * DRIFTED (columns added or retired between exports) as one
    * relation: missing columns null-pad (`unionByName` with
    * allowMissingColumns — name-keyed, never positional), output
    * column order is first-appearance order across the versions, and a
    * shared name whose TYPE differs across versions fails LOUDLY
    * before any union is built — the silent-coercion footgun (int
    * widened to string, timestamp to string) is exactly how a decade
    * of schema drift corrupts a lakehouse, so the engine refuses
    * rather than guesses. Cost: zero — this is plan surgery, the scans
    * union without any shuffle.
    */
  def unionEvolved(versions: Seq[DataFrame]): DataFrame = {
    require(versions.nonEmpty, "unionEvolved: no inputs")
    val types = scala.collection.mutable.LinkedHashMap[String,
      org.apache.spark.sql.types.DataType]()
    versions.zipWithIndex.foreach { case (v, i) =>
      v.schema.fields.foreach { f =>
        types.get(f.name) match {
          case Some(t) if t != f.dataType =>
            throw new IllegalArgumentException(
              s"unionEvolved: column '${f.name}' is $t in an earlier " +
                s"version but ${f.dataType} in version $i — evolve " +
                "types explicitly before unioning")
          case None => types(f.name) = f.dataType
          case _ =>
        }
      }
    }
    versions.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  def scdIntervals(history: DataFrame, idCol: String,
                   versionCol: String = "version",
                   deleteCol: String = "deleted"): DataFrame = {
    require(!history.columns.exists(Set("__keep", "valid_from",
        "valid_to", "is_current")),
      "scdIntervals adds __keep/valid_from/valid_to/is_current which " +
        "already exist in the input")
    val wDedup = Window.partitionBy(col(idCol))
      .orderBy(col(versionCol).asc, col(deleteCol).desc)
    val wLead = Window.partitionBy(col(idCol)).orderBy(col(versionCol))
    val attrs = history.columns
      .filter(c => c != versionCol && c != deleteCol)
    history
      .withColumn("__keep",
        lag(col(versionCol), 1).over(wDedup).isNull ||
          lag(col(versionCol), 1).over(wDedup) =!= col(versionCol))
      .filter(col("__keep"))
      .withColumn("valid_to", lead(col(versionCol), 1).over(wLead))
      .filter(!col(deleteCol))
      .select(attrs.map(col) ++ Seq(
        col(versionCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current")): _*)
  }

  /** Time-travel read: the corpus AS OF `at` — the reproducibility
    * move behind "re-run the experiment on exactly the data the model
    * saw": restrict the change history to versions ≤ `at`, keep each
    * id's winner under the [[applyChanges]] rule (highest version,
    * delete wins ties), drop tombstoned winners. Pure function of
    * (history, at) — the same `at` always reads the same corpus. One
    * id-keyed window over the version-filtered history; the filter
    * prunes before the exchange, so reading an old snapshot costs the
    * history UP TO IT, never the full log.
    */
  def asOf(history: DataFrame, idCol: String, at: Long,
           versionCol: String = "version",
           deleteCol: String = "deleted"): DataFrame = {
    require(!history.columns.contains("__rn"),
      "asOf adds column __rn which already exists in the input")
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(versionCol).desc, col(deleteCol).desc)
    history.filter(col(versionCol) <= at)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col(deleteCol))
      .drop("__rn")
  }

  /** Snapshot diff — the audit BETWEEN corpus versions the mutation ops
    * above produce: per id, `added` / `removed` / `changed` /
    * `unchanged`, and for changed rows the sorted comma-joined list of
    * columns that differ (null-safe `<=>` comparison, so NULL→value and
    * value→NULL both register as changes, never as matches). This is
    * what a release review actually reads — "what did re-crawling touch"
    * — and the input to incremental downstream refresh (recompute only
    * `added ∪ changed`, drop `removed`). One id-keyed full-outer join,
    * per-column comparison as flat codegen'd expressions; output is
    * id grain with no wide payloads unless the caller keeps them.
    *
    * Both inputs must share a schema; compared columns = all but the id.
    * Precondition (r15 advice): both sides must be at UNIQUE id grain —
    * this is a diff between snapshot VERSIONS, and a snapshot with
    * duplicate ids isn't one; a duplicated id would fan out through the
    * full-outer join (m×n rows per id, each labeled independently).
    * Collapse with [[asOf]]/[[applyChanges]] first. Reserved working
    * columns are guarded the same way asOf guards `__rn`.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   idCol: String): DataFrame = {
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"snapshotDiff: schemas differ — old has " +
        s"[${oldDf.columns.sorted.mkString(", ")}], new has " +
        s"[${newDf.columns.sorted.mkString(", ")}]")
    val clash = oldDf.columns.filter(c => c == "__in_old" || c == "__in_new" ||
      c.startsWith("__o_") || c.startsWith("__n_"))
    require(clash.isEmpty,
      s"snapshotDiff reserves __in_old/__in_new/__o_*/__n_* working " +
        s"columns, which the input already carries: [${clash.mkString(", ")}]")
    val cmp = oldDf.columns.filterNot(_ == idCol).sorted.toSeq
    val o = oldDf.select(col(idCol) +:
      (lit(true).as("__in_old") +: cmp.map(c => col(c).as(s"__o_$c"))): _*)
    val n = newDf.select(col(idCol) +:
      (lit(true).as("__in_new") +: cmp.map(c => col(c).as(s"__n_$c"))): _*)
    val diffs = cmp.map(c =>
      when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c)))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(diffs.map(_.isNotNull).reduce(_ || _), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        when(col("__in_old").isNotNull && col("__in_new").isNotNull,
          concat_ws(",", diffs: _*)).otherwise(lit(""))
          .as("changed_cols"))
  }

  /** Golden-record survivorship — the MDM / entity-consolidation move
    * [[applyChanges]] deliberately does NOT make: applyChanges keeps
    * the latest ROW wholesale (a newer row with a NULL field erases an
    * older row's good value), while a golden record survives
    * PER COLUMN — each attribute takes its value from the latest
    * version where it is NON-NULL (per-column last observation
    * carried forward across the duplicate cluster). Implemented as
    * one aggregate per id with a lexicographic
    * `max(struct(has_value, version, value))` per column — the
    * (1, v) > (0, v') comparison decides before the value field is
    * ever compared, so NULL values never poison the struct ordering —
    * plus `n_versions` and the surviving max version. ONE id-keyed
    * partial-combined shuffle, no windows, no self-joins: the same
    * plan at any scale. Columns all NULL across the cluster survive
    * as NULL. Version ties are the caller's contract (same as
    * applyChanges: versions are unique per id).
    */
  def goldenRecord(history: DataFrame, idCol: String, versionCol: String,
                   cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "goldenRecord: no survivor columns")
    require(!cols.contains(idCol) && !cols.contains(versionCol),
      "goldenRecord: survivor columns must exclude the id/version keys")
    val picks = cols.map { c =>
      max(struct(col(c).isNotNull.cast("int").as("has"),
        col(versionCol).as("v"), col(c).as("x")))
        .getField("x").as(c)
    }
    history.groupBy(col(idCol))
      .agg(picks.head, (picks.tail :+
        count(lit(1)).as("n_versions") :+
        max(col(versionCol)).as("latest_version")): _*)
  }
}
