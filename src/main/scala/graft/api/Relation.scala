package graft.api

import org.apache.spark.sql.{Column, DataFrame}

/** The reference engine's six relational-algebra operators as thin, typed
  * wrappers over DataFrame (reference inventory: SURVEY.md §2.1, physical
  * impls `ra2mr/ra2mr.py:108-306`, `ra2spark/ra2spark.py:48-104`). The
  * wrappers preserve the reference's SEMANTICS — notably projection
  * deduplicates (set semantics, `ra2spark/ra2spark.py:89-93`) — while the
  * physical execution is whatever Catalyst plans (broadcast vs sort-merge
  * joins, partial aggregation for distinct, pushed filters).
  */
final case class Relation(df: DataFrame) {

  /** σ — filter. Reference: `ra2spark/ra2spark.py:49-52`. Unlike the
    * reference (equality + AND only, `sql2ra/functionality.py:76`), any
    * Spark predicate is accepted.
    */
  def select(cond: Column): Relation = Relation(df.filter(cond))

  /** π + implicit DISTINCT — the reference's projection deduplicates
    * (set semantics; MR reducer set at `ra2mr/ra2mr.py:302-306`).
    */
  def project(attrs: String*): Relation =
    Relation(df.select(attrs.map(df(_)): _*).distinct())

  /** π without dedup, for callers that want SQL bag semantics. */
  def projectAll(attrs: String*): Relation =
    Relation(df.select(attrs.map(df(_)): _*))

  /** ρ — re-tag the relation (reference `ra2spark/ra2spark.py:95-101`).
    * `alias` produces a Catalyst SubqueryAlias, so `col("rel.attr")`
    * qualification works exactly like the reference's dotted keys.
    */
  def rename(rel: String): Relation = Relation(df.alias(rel))

  /** ρ with positional attribute renames (IR form
    * `Rename(relname, attrnames, input)`, `ra2mr/ra2mr.py:254-277`).
    */
  def rename(rel: String, attrs: Seq[String]): Relation =
    Relation(df.toDF(attrs: _*).alias(rel))

  /** × — Cartesian product. IR-only in the reference (both executors raise,
    * `ra2mr/ra2mr.py:127-129`); trivially executable here.
    */
  def cross(other: Relation): Relation = Relation(df.crossJoin(other.df))

  /** ⨝ — inner join on an arbitrary condition (reference: conjunctive
    * equi-join only, `ra2mr/ra2mr.py:144-213`). Catalyst extracts equi keys
    * and picks broadcast/sort-merge/shuffled-hash by size.
    */
  def join(other: Relation, cond: Column): Relation =
    Relation(df.join(other.df, cond, "inner"))

  /** Generalized join for the breadth surface (semi/anti/outer/cross). */
  def join(other: Relation, cond: Column, joinType: String): Relation =
    Relation(df.join(other.df, cond, joinType))

  def toDF: DataFrame = df
}
