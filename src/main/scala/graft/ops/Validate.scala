package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the Deequ-shaped constraint
  * report a pipeline runs against every ingest batch before letting it
  * near training (the reference engine has no profiling surface; this
  * is catalog extension in the q128 quality-rule spirit, but at TABLE
  * grain rather than row grain).
  *
  * Design for scale: every row-local constraint (completeness,
  * uniqueness, range, accepted values, size) compiles to aggregate
  * expressions evaluated in ONE partial-combined pass over the input —
  * a single scan, no shuffle beyond the one-row final aggregate,
  * however many checks ride it (the Deequ trick; a naive
  * one-query-per-check audit scans the corpus C times). Only
  * referential-integrity checks cost more: one distinct-build plus one
  * anti-join each, keyed on the child column — the honest price of a
  * cross-relation constraint. The report itself is check-count-sized.
  *
  * Exactness: no floats anywhere. Every metric is an int64 count
  * (`observed` / `total`), every threshold verdict is a
  * cross-multiplied integer comparison (`observed · thrDen ≥
  * thrNum · total`), so the report is bit-identically replayable by
  * any engine with 64-bit counts — the oracle gate replays each check
  * as plain COUNT arithmetic.
  */
object Validate {

  sealed trait Check { def name: String }

  /** Fraction of non-null values ≥ thrNum/thrDen.
    * observed = non-null count, total = row count. */
  final case class Completeness(name: String, column: String,
      thrNum: Long = 1L, thrDen: Long = 1L) extends Check {
    require(thrNum >= 0 && thrDen > 0 && thrNum <= thrDen,
      s"Completeness $name: threshold $thrNum/$thrDen not in [0, 1]")
  }

  /** Exact key uniqueness: distinct value-combination count == row
    * count. observed = distinct count (null-containing combinations
    * count as values, matching a DISTINCT subquery), total = rows. */
  final case class Uniqueness(name: String, columns: Seq[String])
      extends Check {
    require(columns.nonEmpty, s"Uniqueness $name: no columns")
  }

  /** Every non-null value inside [lo, hi].
    * observed = violation count (must be 0), total = rows. */
  final case class InRange(name: String, column: String,
      lo: Double, hi: Double) extends Check

  /** Every non-null value a member of `values`.
    * observed = violation count (must be 0), total = rows. */
  final case class AcceptedValues(name: String, column: String,
      values: Seq[String]) extends Check {
    require(values.nonEmpty, s"AcceptedValues $name: empty value set")
  }

  /** Row count within [lo, hi]. observed = total = row count. */
  final case class SizeBetween(name: String, lo: Long, hi: Long)
      extends Check

  /** Every non-null child value present in `parent.parentColumn`
    * (referential integrity). observed = orphan count (must be 0),
    * total = non-null child values. */
  final case class RefIntegrity(name: String, column: String,
      parent: DataFrame, parentColumn: String) extends Check

  private val kindOf: Check => String = {
    case _: Completeness   => "completeness"
    case _: Uniqueness     => "uniqueness"
    case _: InRange        => "in_range"
    case _: AcceptedValues => "accepted_values"
    case _: SizeBetween    => "size_between"
    case _: RefIntegrity   => "ref_integrity"
  }

  /** Run `checks` against `df`; returns the tall report
    * (check_name, kind, observed, total, passed), one row per check,
    * in no guaranteed order. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Validate.report: no checks")
    require(checks.map(_.name).distinct.size == checks.size,
      "Validate.report: duplicate check names: " +
        checks.map(_.name).diff(checks.map(_.name).distinct).mkString(", "))

    val rowLocal = checks.filter(!_.isInstanceOf[RefIntegrity])
    val refs = checks.collect { case r: RefIntegrity => r }

    val local: Option[DataFrame] = if (rowLocal.isEmpty) None else {
      // one aggregate expression bundle per check + the shared total
      val aggs: Seq[Column] = count(lit(1)).as("__total") +: rowLocal.map {
        case Completeness(n, c, _, _) =>
          count(col(c)).as(s"__obs_$n")
        case Uniqueness(n, cs) =>
          countDistinct(struct(cs.map(col): _*)).as(s"__obs_$n")
        case InRange(n, c, lo, hi) =>
          count(when(col(c) < lo || col(c) > hi, 1)).as(s"__obs_$n")
        case AcceptedValues(n, c, vs) =>
          count(when(!col(c).isin(vs.map(lit): _*), 1)).as(s"__obs_$n")
        case SizeBetween(n, _, _) =>
          count(lit(1)).as(s"__obs_$n")
        case r: RefIntegrity =>
          throw new IllegalStateException(s"unreachable: ${r.name}")
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val structs = rowLocal.map { ch =>
        val obs = col(s"__obs_${ch.name}")
        val tot = col("__total")
        val passed: Column = ch match {
          case Completeness(_, _, tn, td) => obs * td >= lit(tn) * tot
          case _: Uniqueness              => obs === tot
          case _: InRange                 => obs === 0L
          case _: AcceptedValues          => obs === 0L
          case SizeBetween(_, lo, hi)     => obs >= lo && obs <= hi
          case r: RefIntegrity =>
            throw new IllegalStateException(s"unreachable: ${r.name}")
        }
        struct(lit(ch.name).as("check_name"), lit(kindOf(ch)).as("kind"),
          obs.as("observed"), tot.as("total"), passed.as("passed"))
      }
      Some(one.select(explode(array(structs: _*)).as("r")).select("r.*"))
    }

    val refReports = refs.map { case RefIntegrity(n, c, parent, pc) =>
      val child = df.select(col(c).as("__k")).filter(col("__k").isNotNull)
      val orphans = child
        .join(parent.select(col(pc).as("__k")).distinct(), Seq("__k"),
          "left_anti")
        .agg(count(lit(1)).as("observed"))
      val tot = child.agg(count(lit(1)).as("total"))
      orphans.crossJoin(tot).select(
        lit(n).as("check_name"), lit("ref_integrity").as("kind"),
        col("observed"), col("total"), (col("observed") === 0L).as("passed"))
    }

    (local.toSeq ++ refReports).reduce(_.unionByName(_))
  }

  /** k-anonymity audit — the re-identification screen a governance
    * pass runs before a dataset leaves the house: group by the
    * QUASI-IDENTIFIER columns (the attributes an attacker can link —
    * zip/age-band/gender in the classic study) and flag every
    * combination carried by fewer than k rows; those rows are
    * re-identifiable by linkage and must be suppressed or generalized
    * before release. One group-keyed aggregate; the audit relation is
    * combination-cardinality. NULL quasi-values group together (SQL
    * grouping semantics — engine-neutral) and are just as linkable,
    * so they are audited like any value. [[suppressSmallGroups]] is
    * the enforcement half: drop every at-risk row (an anti-join
    * against the at-risk combinations — broadcast, they are few by
    * definition).
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityAudit: no quasi columns")
    require(k >= 2, s"kAnonymityAudit: k = $k is no protection")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
  }

  /** Drop every row whose quasi-identifier combination is carried by
    * fewer than k rows — run [[kAnonymityAudit]] FIRST for the audit
    * trail; after this pass it returns zero at-risk groups. The
    * anti-join is NULL-SAFE (`<=>` per quasi column): NULL quasi
    * values form an auditable group like any other, and a plain
    * equi-anti-join would silently keep them (NULL never equals NULL
    * in a join) — the exact leak this pass exists to stop
    * (spec-pinned). */
  def suppressSmallGroups(df: DataFrame, quasiCols: Seq[String],
                          k: Long): DataFrame = {
    val risky = kAnonymityAudit(df, quasiCols, k)
      .filter(col("at_risk"))
      .select(quasiCols.map(c => col(c).as(s"__r_$c")): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"__r_$c"))
      .reduce(_ && _)
    df.join(broadcast(risky), cond, "left_anti")
  }

  /** l-diversity audit — the screen k-anonymity famously misses
    * (Machanavajjhala et al., *l-Diversity: Privacy Beyond
    * k-Anonymity*, ICDE 2006): a quasi-identifier group can be large
    * (k-anonymous) yet carry ONE sensitive value, so linkage still
    * discloses it — the classic homogeneity attack. Groups by the
    * quasi columns and counts DISTINCT sensitive values; a group with
    * fewer than `l` is at risk. NULL handling mirrors
    * [[kAnonymityAudit]]: NULL quasi values group together and are
    * audited; a NULL sensitive value COUNTS as a value (distinct-count
    * semantics would drop it, but "lang unknown" is a disclosure like
    * any other — spec-pinned via the has-null max-flag, engine-neutral
    * on both sides of the oracle). One group-keyed aggregate; the
    * distinct rides the same shuffle as a two-level partial aggregate.
    */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversityAudit: no quasi columns")
    require(!quasiCols.contains(sensitiveCol),
      s"lDiversityAudit: sensitive column '$sensitiveCol' is also a " +
        "quasi column — its diversity within the group is 1 by definition")
    require(l >= 2, s"lDiversityAudit: l = $l is no protection")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        (countDistinct(col(sensitiveCol)) +
          max(when(col(sensitiveCol).isNull, 1L).otherwise(0L)))
          .as("n_sensitive"))
      .withColumn("at_risk", col("n_sensitive") < l)
  }

  /** t-closeness audit — the third member of the release-screen trio
    * (Li, Li & Venkatasubramanian, *t-Closeness: Privacy Beyond
    * k-Anonymity and l-Diversity*, ICDE 2007), catching the attack
    * l-diversity misses: a group can carry `l` distinct sensitive
    * values yet a SKEWED distribution (99% one disease) — linkage then
    * discloses with near-certainty while the group reads "diverse".
    * The screen: distance between each quasi-group's sensitive-value
    * distribution and the GLOBAL one must stay ≤ t. For categorical
    * sensitive attributes with equal ground distance the paper's EMD
    * IS total variation distance, ½·Σᵥ |p_g(v) − p(v)| — computed here
    * EXACTLY in basis points by cross-multiplication, no floating
    * division until the single final truncating div:
    *
    *   tvd_bp = (10⁴ · Σᵥ |n_gv·N − n_v·n_g|) div (2·n_g·N)
    *
    * where the sum over values ABSENT from the group folds into one
    * closed term (N − Σ_{v∈g} n_v)·n_g — so everything runs at CELL
    * grain (group × present-value), never group × domain. NULL
    * sensitive values count as a value (the [[lDiversityAudit]]
    * posture — "unknown" is a disclosure too) and NULL quasi values
    * group together and are audited. Exactness (the q293 widening):
    * the |n_gv·N − n_v·n_g| cross-products and the scaled ratio run in
    * DECIMAL(38,0) — the old int64 envelope (`n_g·N < 4.6·10¹⁴`, a
    * 10⁸-row release) was orders below this engine's corpus posture
    * and past it the audit THREW under the session's ANSI default;
    * decimal is exact while `n_g·N < 5·10³³` — any conceivable
    * release — and DuckDB's HUGEINT agrees throughout. Scale shape:
    * one cell-grain aggregate, a group-keyed window for n_g, a
    * value-grain join (domain-sized), one 1-row total broadcast —
    * the corpus enters one exchange. Output: `(quasiCols…, n,
    * tvd_bp, at_risk)`.
    */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, tBp: Long): DataFrame = {
    require(quasiCols.nonEmpty, "tClosenessAudit: no quasi columns")
    require(!quasiCols.contains(sensitiveCol),
      s"tClosenessAudit: sensitive column '$sensitiveCol' is also a " +
        "quasi column — its in-group distribution is degenerate")
    require(tBp >= 1 && tBp <= 10000,
      s"tClosenessAudit: tBp must be in [1, 10000], got $tBp")
    // the histState reserved-name convention: a quasi column named
    // like an output or internal column would be clobbered silently
    val reserved = Set("n", "tvd_bp", "at_risk", "__v", "__v2",
      "__ngv", "__nv", "__N", "__Nm", "__sp", "__cov")
    val clash = quasiCols.filter(reserved.contains)
    require(clash.isEmpty,
      s"tClosenessAudit: quasi columns collide with reserved names: " +
        s"${clash.mkString(", ")}")
    val base = df.select((quasiCols.map(col) :+
      col(sensitiveCol).as("__v")): _*)
    val cells = base.groupBy((quasiCols.map(col) :+ col("__v")): _*)
      .agg(count(lit(1)).as("__ngv"))
    val vals = cells.groupBy(col("__v")).agg(sum(col("__ngv")).as("__nv"))
    val total = vals.agg(sum(col("__nv")).as("__N"))
    val wG = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*)
    cells.withColumn("n", sum(col("__ngv")).over(wG))
      // null-SAFE value join: the NULL sensitive value is a value row
      // in `vals`, and a plain USING join would silently drop its
      // cells from the present sum (the suppressSmallGroups lesson)
      .join(vals.withColumnRenamed("__v", "__v2"),
        col("__v") <=> col("__v2"))
      .crossJoin(broadcast(total))
      .groupBy(quasiCols.map(col): _*)
      .agg(max(col("n")).as("n"),
        // cross-products in DECIMAL(38,0) (the q293 widening): each
        // |n_gv·N − n_v·n_g| term is ~N² — past 2^63 (an ANSI
        // job-killing throw) at a ~3·10^9-row release, far below this
        // engine's corpus posture; DuckDB's HUGEINT agrees throughout
        sum(abs(graft.dec(col("__ngv")) * graft.dec(col("__N")) -
          graft.dec(col("__nv")) * graft.dec(col("n")))).as("__sp"),
        sum(col("__nv")).as("__cov"),
        max(col("__N")).as("__Nm"))
      .select((quasiCols.map(col) :+ col("n") :+
        expr("(10000L * (__sp + (__Nm - __cov) * " +
          "cast(n as decimal(20,0)))) div " +
          "(2L * cast(n as decimal(20,0)) * " +
          "cast(__Nm as decimal(20,0)))").as("tvd_bp")): _*)
      .withColumn("at_risk", col("tvd_bp") > tBp)
  }

  /** Equi-width histogram — the distribution half of profiling, next
    * to [[report]]'s pass/fail half. One scan + one bin-keyed
    * aggregate (bins-cardinality, never row-cardinality); empty bins
    * are absent (densify at render time — a 10k-bin histogram of a
    * narrow column must not emit 10k zeros per partition).
    *
    * Determinism across engines: the bin index is
    * `floor((x − lo) · nBins / (hi − lo))` evaluated left-to-right in
    * IEEE doubles, clamped to [0, nBins−1] — identical operand order
    * gives bit-identical doubles, hence identical bins, in any IEEE
    * engine (the oracle replays the formula verbatim). Values below
    * `lo` land in bin −1, above `hi` in bin `nBins`; `x = hi` joins
    * the top bin (the numpy right-inclusive-last-edge convention).
    * NULLs are skipped — completeness is [[report]]'s job. Bin edges
    * ride the output (NULL on the two overflow bins).
    */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                nBins: Int): DataFrame = {
    require(nBins > 0, s"histogram: nBins $nBins <= 0")
    require(hi > lo, s"histogram: empty range [$lo, $hi)")
    val x = col(valueCol).cast("double")
    val step = (hi - lo) / nBins
    val inBin = least(greatest(
      floor((x - lo) * nBins / (hi - lo)).cast("long"), lit(0L)),
      lit(nBins - 1L))
    val inRange = col("bin") >= 0L && col("bin") < nBins.toLong
    df.filter(x.isNotNull)
      .select(when(x < lo, lit(-1L)).when(x > hi, lit(nBins.toLong))
        .otherwise(inBin).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .select(col("bin"),
        when(inRange, lit(lo) + col("bin") * lit(step)).as("bin_lo"),
        when(inRange, lit(lo) + (col("bin") + 1L) * lit(step))
          .as("bin_hi"),
        col("n"))
  }

  /** Functional-dependency audit with exceptions — "does lhs determine
    * rhs, and if not, how badly": per lhs value, the row count, the
    * distinct-rhs count, the MAJORITY rhs (count desc, rhs value asc —
    * a pure function of the data, no tie luck) and the violation count
    * (rows disagreeing with the majority — the minimum repairs to make
    * the FD hold, the standard CFD-repair measure). `holds` flags the
    * clean groups. Cost: one (lhs, rhs)-grain aggregate, then windows
    * over the cell relation — the corpus enters one shuffle; the cell
    * relation is domain-sized. NULL rhs counts as a value (an FD that
    * "holds" by nulling its rhs is a lie worth seeing).
    */
  def fdAudit(df: DataFrame, lhsCol: String, rhsCol: String): DataFrame = {
    val cells = df.groupBy(col(lhsCol), col(rhsCol))
      .agg(count(lit(1)).as("__cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(lhsCol))
      .orderBy(col("__cnt").desc,
        col(rhsCol).cast("string").asc_nulls_last)
    cells.withColumn("__rk", row_number().over(w))
      .groupBy(col(lhsCol))
      .agg(sum(col("__cnt")).as("n"),
        count(lit(1)).as("n_distinct_rhs"),
        max(when(col("__rk") === 1, col(rhsCol).cast("string")))
          .as("majority_rhs"),
        max(when(col("__rk") === 1, col("__cnt"))).as("majority_n"))
      .select(col(lhsCol), col("n"), col("n_distinct_rhs"),
        col("majority_rhs"),
        (col("n") - col("majority_n")).as("n_violations"),
        (col("n_distinct_rhs") === 1L).as("holds"))
  }

  /** One-pass column profile — the first thing anyone asks of an
    * unfamiliar table: per column, rows / nulls / EXACT distincts /
    * lexicographic min–max of the string CAST (a deliberate profile
    * convention: one comparable domain for every type, identical in any
    * engine — "99" > "100" lexicographically, and that's fine for a
    * profile whose job is drift detection, not arithmetic). All metrics
    * ride ONE aggregate scan; the multiple exact COUNT(DISTINCT)s cost
    * an Expand of ×|cols| over the scan (the honest price of exactness
    * — swap in approx_count_distinct per column when profiling 100 TB
    * interactively, the shape is unchanged). Output is column-grain:
    * one row per profiled column.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns: no columns")
    cols.foreach(c => require(df.columns.contains(c),
      s"profileColumns: no column '$c' in [${df.columns.mkString(", ")}]"))
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: cols.flatMap(c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c).cast("string")).as(s"__mn_$c"),
        max(col(c).cast("string")).as(s"__mx_$c")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"), col("n_rows"),
        (col("n_rows") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_s"),
        col(s"__mx_$c").as("max_s"))): _*)).as("p"))
      .select("p.*")
  }

  /** Pre-join blast-radius audit — run BEFORE an equi-join whose output
    * size you cannot bound: per key, both sides' cardinalities and their
    * product (the key's exact contribution to the join's output rows).
    * The audit never materializes the join it prices: each side
    * aggregates to key grain first (partial-combined, one shuffle each),
    * and the audit join runs at KEY cardinality — pricing a 10^12-row
    * blowup costs two aggregates, not 10^12 rows. `Σ est_rows` over the
    * result is the join's exact inner-equi output size (bag semantics,
    * single-key NULL-skipping equality on both engines); the head of an
    * `est_rows DESC` sort is the hot-key list a skew mitigation
    * (salting, AQE skew split, key blacklist) consumes. Keys appearing
    * on only one side contribute nothing to an inner join and are
    * omitted — by the same inner audit join.
    */
  def joinExplosionAudit(left: DataFrame, right: DataFrame,
                         leftKey: String, rightKey: String): DataFrame = {
    val lc = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("n_left"))
    val rc = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("n_right"))
    lc.join(rc, Seq("key"))
      .select(col("key"), col("n_left"), col("n_right"),
        // int64 envelope (r20 audit note): est_rows throws past 2^63 —
        // n_left·n_right > 9.2·10^18 means ~3·10^9 rows of ONE key on
        // EACH side; the loud failure is the right posture for an
        // explosion detector (a NULL or saturated estimate would hide
        // exactly the worst case it exists to surface), and the
        // per-key factor columns always survive for triage
        (col("n_left") * col("n_right")).as("est_rows"))
  }

  /** Referential-integrity audit — the FK check every star schema
    * needs before a join is trusted: child rows whose key has no
    * parent (orphans — an inner join silently DROPS them, which is
    * how fact rows vanish from revenue reports) and parents with no
    * children (childless — expected for slow dimensions, a red flag
    * for mandatory ones). One row out:
    * `(n_child, n_orphan_child, n_parent, n_childless_parent)`.
    * Cost: the parent key set is DISTINCT (dimension-sized) before
    * the child-side left join — the child table is scanned once and
    * never distinct-ed; the parent-side childless check runs at
    * key-set grain both sides. NULL child keys count as orphans
    * (they match no parent under `=` — the q221 null-safe family
    * documents the alternative).
    */
  def refIntegrity(child: DataFrame, parent: DataFrame,
                   childKey: String, parentKey: String): DataFrame = {
    val pd = parent.select(col(parentKey).as("k")).distinct()
    val childSide = child.select(col(childKey).as("k"))
      .join(pd.withColumn("__p", lit(1)), Seq("k"), "left")
      .agg(count(lit(1)).as("n_child"),
        count(when(col("__p").isNull, 1)).as("n_orphan_child"))
    val cd = child.select(col(childKey).as("k")).distinct()
    val parentSide = pd
      .join(cd.withColumn("__c", lit(1)), Seq("k"), "left")
      .agg(count(lit(1)).as("n_parent"),
        count(when(col("__c").isNull, 1)).as("n_childless_parent"))
    childSide.crossJoin(parentSide)
  }

  /** Per-row robust outlier flags by the MODIFIED z-score
    * (Iglewicz & Hoaglin, *How to Detect and Handle Outliers*, 1993):
    * `M = 0.6745·(x − median) / MAD`, flag `|M| > 3.5` — the screen
    * that survives the outliers it hunts, where a mean/stddev z-score
    * is dragged by them (one 10⁹ burst day inflates σ until nothing
    * flags). All-integer: median and MAD are LOWER medians (rank
    * ⌊(n+1)/2⌋ by value — the q257 tie-deterministic convention), and
    * since 0.6745 = 6745/10⁴, `mz_bp = M·10⁴ = 6745·(x − med) div
    * mad` EXACTLY in int64 (truncating div, negative numerators
    * truncate toward zero on both engines — the q226 pin), with the
    * 3.5 cut as the integer predicate `|6745·(x−med)| > 35000·mad`.
    * Degenerate `MAD = 0` (more than half the group at the median):
    * mz_bp is NULL and any deviation at all flags — the honest
    * reading of "spread is zero". int64 envelope: 6745·|x−med| < 2⁶³
    * holds to |x−med| ≈ 1.4·10¹⁵. Output: input columns + `med`,
    * `mad`, `mz_bp`, `is_outlier`; NULL values pass through unflagged
    * with NULL stats, and so do NULL-KEY rows (a NULL grouping key
    * joins its group stats null-unsafely, so med/mad are absent —
    * `is_outlier` is pinned false there, never a NULL boolean).
    * Scale shape: two rank windows per key group (the
    * exact-order-statistic cost, stated honestly — the binned sibling
    * for corpus-grain values is [[graft.ops.Incremental.binnedMedMad]];
    * this runs at GROUP-SERIES grain, e.g. days × types, where the
    * sort is nothing).
    */
  def robustOutliers(df: DataFrame, keys: Seq[String],
                     valueCol: String): DataFrame = {
    require(keys.nonEmpty, "robustOutliers: no grouping keys")
    val v = col(valueCol).cast("long")
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("__v"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    val nn = df.filter(v.isNotNull)
      .withColumn("__v", v)
    val med = nn
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("__rn") === expr("(__n + 1L) div 2L"))
      .select((keys.map(col) :+ col("__v").as("med")): _*)
    val wDev = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("__ad"))
    val mad = nn.join(med, keys)
      .withColumn("__ad", abs(col("__v") - col("med")))
      .withColumn("__rn", row_number().over(wDev))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("__rn") === expr("(__n + 1L) div 2L"))
      .select((keys.map(col) :+ col("__ad").as("mad")): _*)
    // the value column enters the SQL text only as the internal
    // `__dev` projection (Column API resolution — names needing
    // backticks work, the histState convention)
    df.join(med, keys, "left").join(mad, keys, "left")
      .withColumn("__dev", v - col("med"))
      .withColumn("mz_bp",
        when(v.isNotNull && col("mad") > 0L,
          expr("6745L * __dev div mad")))
      .withColumn("is_outlier",
        when(v.isNull, lit(false))
          // a NULL grouping key joins med/mad null-unsafely, so its
          // stats come back absent — flag FALSE, never NULL (r17
          // advice: the otherwise-branch `__dev =!= 0L` evaluated to
          // NULL there, a boolean that is neither true nor false);
          // NULL-key rows carry NULL med/mad/mz_bp like NULL values do
          .when(col("med").isNull || col("mad").isNull, lit(false))
          .when(col("mad") > 0L,
            abs(lit(6745L) * col("__dev")) > lit(35000L) * col("mad"))
          .otherwise(col("__dev") =!= 0L))
      .drop("__dev")
  }
}
