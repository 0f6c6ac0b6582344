package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.cents

/** Structured Streaming pipelines over the events stream (schema:
  * event_id, ts, user_id, event_type, value, props).
  *
  * The reference engine is purely batch (SURVEY §2.3 "streaming: none");
  * this is breadth-layer capability, built the idiomatic way: the SAME
  * transformations as the batch queries (q20/q21/q34 are the batch twins),
  * applied to an unbounded DataFrame with watermarks bounding state.
  *
  * Scale notes (1000-executor contract):
  *  - every aggregation below is keyed, so state is hash-partitioned
  *    across executors by (window, key) — no global state;
  *  - watermarks bound state size: a 2-hour watermark on 1-hour windows
  *    keeps ≤3 windows of state per key regardless of input rate;
  *  - `dropDuplicatesWithinWatermark` keeps the dedup set bounded the
  *    same way (vs `dropDuplicates`, whose state grows forever).
  */
object EventStreams {

  /** A `ts` column read from a naive-timestamp parquet (timestamp[us],
    * isAdjustedToUTC=false) surfaces as TIMESTAMP_NTZ, which
    * `unix_micros` and the `java.sql.Timestamp` encoder both reject
    * (round-11: this broke every events pipeline when the fixture
    * generator switched from TIMESTAMP(NANOS) to naive micros). Convert
    * to a tz-aware UTC instant via [[graft.ntzAsUtcInstant]] — which is
    * correct under ANY session timezone, not only the UTC one graft
    * sessions pin — so every pipeline below accepts either form.
    */
  private def tzAware(df: DataFrame, tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.types.TimestampNTZType
    if (df.schema.fieldNames.contains(tsCol) &&
        df.schema(tsCol).dataType == TimestampNTZType)
      // naive wall times are UTC instants by the fixture/generator
      // convention — see graft.ntzAsUtcInstant for the offset algebra
      df.withColumn(tsCol, graft.ntzAsUtcInstant(df.sparkSession, col(tsCol)))
    else df
  }

  /** Merge one batch of event times (sorted ascending, micros) into the
    * open session `(start, last, n)`, appending any sessions CLOSED by the
    * batch for `user` to `closed`; returns the new open-session state.
    *
    * Late-but-within-watermark events can arrive in a LATER batch with
    * ts ≤ the stored session end, so the merge must never move the session
    * end backward (`last = max`) — otherwise the event-time timeout is set
    * from a stale earlier end and a following in-gap event mis-splits the
    * session (e.g. state last=200, late 150, then 260 with gap 100 would
    * split although 260−200 is within gap).
    *
    * The batch is first GAP-CLUSTERED into (min, max, n) runs: events
    * inside a run chain transitively, and runs are separated by more than
    * a gap BY CONSTRUCTION, so each run merges or closes against the open
    * session as a unit. Judging raw events one at a time against a `start`
    * that can shrink later in the same batch mis-splits chained late
    * events — state (10:00, ·), gap 30 m, batch [09:25, 09:40]: 09:25 must
    * ride with 09:40 into the open session, not close as a spurious
    * singleton — and splinters old-late runs (08:00, 08:10 must close as
    * ONE 2-event session, not two singletons). A run still entirely more
    * than a gap before the open session's start belongs to an earlier,
    * already-closed session and is emitted whole. An emitted old-late
    * session is FINAL: if a still-later batch delivers events within a gap
    * of it, they form a separate session — emit-on-close streaming cannot
    * reopen emitted output (the divergence from the batch q34 twin is
    * bounded by the watermark in [[sessionizeEventTime]], which drops
    * anything late enough to chain onto an already-emitted run).
    */
  private def mergeSessionBatch(
      user: Long, sorted: Seq[Long], gapUs: Long, st: (Long, Long, Long),
      closed: scala.collection.mutable.ListBuffer[(Long, Long, Long)])
      : (Long, Long, Long) = {
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    sorted.foreach { ts =>
      if (runs.nonEmpty && ts - runs.last._2 <= gapUs) {
        val (mn, _, cn) = runs.last
        runs(runs.length - 1) = (mn, ts, cn + 1)
      } else runs += ((ts, ts, 1L))
    }
    var (start, last, n) = st
    runs.foreach { case (cmin, cmax, cn) =>
      if (start < 0) { start = cmin; last = cmax; n = cn }
      else if (cmin - last > gapUs) { // entirely after: open session closed
        closed += ((user, start, n))
        start = cmin; last = cmax; n = cn
      } else if (start - cmax > gapUs) { // entirely before: earlier session
        closed += ((user, cmin, cn))
      } else { // chains with the open session (runs can't chain each other)
        start = math.min(start, cmin); last = math.max(last, cmax); n += cn
      }
    }
    (start, last, n)
  }

  /** Hourly tumbling-window counts/sums per event type — streaming twin of
    * the batch q20 (same exact-integer-cents trick, so late re-emissions
    * still sum deterministically).
    */
  def hourlyByType(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    tzAware(events)
      .withWatermark("ts", watermark)
      // Group by the window STRUCT and project `.start` AFTER the
      // aggregation: grouping by window(ts).getField("start") directly
      // strips the event-time watermark metadata (the Alias over
      // GetStructField propagates none), so Append mode is rejected and
      // state never evicts — watermarks would silently stop bounding
      // state. StreamingSpec pins Append-mode emission.
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(cents(col("value"))).as("sum_value_c"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("cnt"), col("sum_value_c"))

  /** Per-(event type, epoch day) algebraic rollup state — the streaming
    * twin of [[graft.ops.Incremental.aggState]] (q175): the SAME four
    * mergeable aggregates (n / sum / min / max of exact cents) grouped
    * by a daily event-time window, so the stream IS incremental
    * maintenance — each micro-batch folds into state exactly as
    * `Incremental.merge` folds a delta batch into a stored rollup, and
    * StreamingSpec pins stream ≡ batch-state equality. Day is the
    * window's start projected to the integer epoch day AFTER the
    * aggregation (the [[hourlyByType]] watermark-metadata rule).
    */
  def rollupByTypeDay(events: DataFrame,
                      watermark: String = "2 hours"): DataFrame =
    tzAware(events)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_v"),
        min(cents(col("value"))).as("min_v"),
        max(cents(col("value"))).as("max_v"))
      .select(col("event_type"),
        expr("unix_micros(w.start) div 86400000000").as("day"),
        col("n"), col("sum_v"), col("min_v"), col("max_v"))

  /** Per-(event type, epoch day, value bin) histogram state — the
    * streaming twin of [[graft.ops.Incremental.histState]] (the q210
    * binned-median/MAD family): bin counts are the ONLY state and
    * counts ADD, so the stream IS incremental histogram maintenance —
    * each micro-batch folds into the stored histogram exactly as
    * `Incremental.mergeHist` folds a delta batch, and a read-side
    * [[graft.ops.Incremental.binnedMedMad]] over the table gives the
    * day's robust outlier screen with zero corpus passes
    * (StreamingSpec pins stream ≡ batch-state ≡ merged-state). Bin is
    * the SAME exact int64 floor-division as the batch state
    * ([[graft.ops.Incremental.binOf]] — shared expression, so the
    * stream ≡ batch triangle holds for negative cents too) on the
    * shared clock conventions; day projects from the window start
    * AFTER aggregation (the [[hourlyByType]] watermark-metadata rule).
    */
  def histByTypeDay(events: DataFrame, binWidthC: Long = 1000L,
                    watermark: String = "2 hours"): DataFrame =
    tzAware(events)
      .withWatermark("ts", watermark)
      .withColumn("__c", cents(col("value")))
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"),
        graft.ops.Incremental.binOf("__c", binWidthC).as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        expr("unix_micros(w.start) div 86400000000").as("day"),
        col("bin"), col("n"))

  /** Sliding-window distinct actives — the streaming twin of q171's
    * rolling 7-day WAU: every event lands in 7 overlapping daily-slide
    * windows, per-window distinct users via stateful dedup on
    * (user, window), then the window count — the chained
    * stateful-operator shape (dedup → agg) Spark supports in APPEND
    * mode, so only watermark-finalized windows emit, exactly the
    * at-most-once-per-user-per-window contract the batch coverage
    * explosion computes. `day` is the last day the window covers
    * (start + 6) — only q171's day-LABELING convention, not its
    * report-day SET (r15 advice made this precise): q171 joins its
    * coverage explosion to the days that actually carry events, so it
    * emits exactly one row per occurring day, while the sliding
    * window here emits every window that holds ≥ 1 event — including
    * windows labeled by empty trailing days after a burst. A consumer
    * wanting q171's exact row set semi-joins this output to its
    * occurring-day relation; the StreamingSpec twin proves equality
    * on the shared windows by deliberately omitting that join on the
    * batch side.
    */
  def rollingActives(events: DataFrame,
                     watermark: String = "2 hours"): DataFrame =
    tzAware(events)
      .withWatermark("ts", watermark)
      .select(col("user_id"), window(col("ts"), "7 days", "1 day").as("w"))
      .dropDuplicates("user_id", "w")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("wau"))
      .select((expr("unix_micros(w.start) div 86400000000") + 6L)
        .as("day"), col("wau"))

  /** Stream-static enrichment: each streaming event inner-joined to a
    * STATIC dimension table on `joinKeys` — the standard "annotate the
    * event stream with reference data" pattern. Structured Streaming
    * plans the static side fresh per micro-batch (so a small dim
    * broadcasts, exactly like batch), needs NO watermark and keeps NO
    * state: only stream-stream joins buffer rows. At 100 TB of stream
    * history the cost is per-batch, not per-history.
    */
  def enrichWith(events: DataFrame, dim: DataFrame,
                 joinKeys: Seq[String]): DataFrame =
    events.join(dim, joinKeys)

  /** Stream-STREAM interval join: each left event matched to right
    * events with the same `key` whose timestamp falls in the `within`
    * window BEFORE it — the attribution shape ("which views preceded
    * this click"). Both sides carry watermarks and the join condition
    * bounds event-time distance, so Spark derives exactly how long each
    * side's rows must be buffered: state is O(events inside the
    * watermark+interval horizon), NOT unbounded history — the property
    * that makes a stream-stream join runnable forever. Column names are
    * prefixed `l_`/`r_` (minus the join key, kept once) because both
    * sides usually share a schema.
    *
    * `joinType = "left_outer"` is the attribution variant real pipelines
    * ask for first: every left event emits exactly once — joined if a
    * right match exists, null-extended OTHERWISE. Semantics are
    * necessarily delayed for the unmatched case: a left row can only be
    * declared match-less once the watermark proves no qualifying right
    * row can still arrive, so null-extended rows surface after the
    * watermark passes the row's interval (Spark runs no-data
    * micro-batches to flush them). Matched rows still emit immediately,
    * and state stays watermark-bounded on both sides — outer-ness does
    * not change what is buffered, only what is emitted at eviction.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   tsCol: String = "ts", within: String = "10 minutes",
                   watermark: String = "1 hour",
                   joinType: String = "inner"): DataFrame = {
    val l = left.columns.foldLeft(tzAware(left, tsCol)) { (d, c) =>
      if (c == key) d else d.withColumnRenamed(c, "l_" + c)
    }.withWatermark(s"l_$tsCol", watermark)
    val r = right.columns.foldLeft(tzAware(right, tsCol)) { (d, c) =>
      d.withColumnRenamed(c, "r_" + c) // key too — disambiguates the join
    }.withWatermark(s"r_$tsCol", watermark)
    l.join(r, col(key) === col(s"r_$key") &&
        expr(s"r_$tsCol >= l_$tsCol - INTERVAL $within AND r_$tsCol <= l_$tsCol"),
        joinType)
      .drop(s"r_$key")
  }

  /** Watermark-bounded exact dedup on event_id — the streaming twin of
    * exact keyed dedup (at-least-once sources re-deliver; state holds ids
    * only within the watermark horizon).
    */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    tzAware(events).withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming sessionization — the streaming twin of batch q34, via
    * `flatMapGroupsWithState` (the full custom-state operator: it can
    * emit ZERO or MANY rows per group per batch, unlike mapGroups').
    * State per user is one open session (start, last-seen, count); a
    * session closes and is EMITTED when a gap exceeds `gapMinutes`.
    * Output rows: (user_id, session_start_us, n_events).
    *
    * Scale: state is O(active users), hash-partitioned by user; closed
    * sessions leave state immediately. (Production would add an
    * event-time timeout to flush sessions of users who go silent; the
    * semantics here emit on the next event or at `complete` end.)
    */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapMinutes: Int = 30): Dataset[(Long, Long, Long)] = {
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000L
    tzAware(events)
      .select(col("user_id").as[Long],
        (unix_micros(col("ts"))).as[Long])
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)],
         state: GroupState[(Long, Long, Long)]) =>
          val sorted = rows.map(_._2).toSeq.sorted
          val closed = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
          val st = mergeSessionBatch(user, sorted, gapUs,
            state.getOption.getOrElse((-1L, -1L, 0L)), closed)
          if (st._1 >= 0) state.update(st)
          closed.iterator
      }
  }

  /** [[sessionize]] with an EVENT-TIME timeout — the production variant
    * its scaladoc promises: a user who goes silent still has their open
    * session flushed once the watermark passes (last event + gap), so
    * state never outlives the watermark horizon and no session waits
    * forever for a next event. Requires a watermark on `ts` (set here).
    *
    * Scale: identical to [[sessionize]] (state is one open session per
    * active user, hash-partitioned), plus the timeout bound means idle
    * users leave state after `gapMinutes` of event time — state size
    * tracks ACTIVE users, not all-time users.
    */
  def sessionizeEventTime(spark: SparkSession, events: DataFrame,
                          gapMinutes: Int = 30,
                          watermark: String = "1 hour")
      : Dataset[(Long, Long, Long)] = {
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000L
    // exact micros from the Timestamp (getTime is millis; getNanos carries
    // the sub-milli part)
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000) % 1000L
    tzAware(events)
      .withWatermark("ts", watermark)
      // keep the watermarked `ts` column ITSELF through to the stateful
      // operator: projecting unix_micros(ts) here would strip the
      // watermark metadata (the same Alias pitfall hourlyByType hit) and
      // Spark rejects EventTimeTimeout without a watermark in scope
      .select(col("user_id").as[Long], col("ts").as[java.sql.Timestamp])
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            // watermark passed (last seen + gap): the open session is
            // definitively closed — emit it and drop the state
            val (start, _, n) = state.get
            state.remove()
            Iterator.single((user, start, n))
          } else {
            val sorted = rows.map(r => micros(r._2)).toSeq.sorted
            val closed =
              scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
            val st = mergeSessionBatch(user, sorted, gapUs,
              state.getOption.getOrElse((-1L, -1L, 0L)), closed)
            if (st._1 >= 0) {
              state.update(st)
              // timeout fires when the watermark passes session end + gap;
              // must stay strictly above the current watermark or Spark
              // rejects it (a group fed only very-late data)
              state.setTimeoutTimestamp(math.max(
                (st._2 + gapUs) / 1000L, state.getCurrentWatermarkMs() + 1L))
            }
            closed.iterator
          }
      }
  }

  /** Streaming materialized bag view over a CDC change stream — the
    * streaming half of the retraction family
    * ([[graft.ops.Incremental.deltaJoinRetract]] /
    * [[graft.ops.Incremental.applyBagDelta]] are the batch half):
    * change rows arrive as (value columns…, `opCol` ∈ {+1 insert,
    * −1 delete}) and the running view is NOTHING BUT Spark's native
    * streaming aggregate over the signed weights — the Spark-first
    * answer to the delete path: a sum of ±1 is retractable by
    * construction, so no custom state operator exists to write.
    * Run in Update (or Complete) output mode; read-side filter
    * `n > 0` (a fully-retracted value sits at 0 until state reaps
    * it), and `n < 0` IS the phantom screen — the
    * [[graft.ops.Incremental.bagDeltaAudit]] read at stream time,
    * visible in the running state instead of clamped (StreamingSpec
    * pins both). For a maintained JOIN view, compute the signed join
    * delta per micro-batch with `deltaJoinRetract` inside
    * `foreachBatch` and feed the delta rows here — the batch and
    * stream halves share the same algebra by construction.
    * State is O(distinct view values), hash-partitioned on them.
    */
  def cdcBagViewStream(changes: DataFrame, keyCols: Seq[String],
                       opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "cdcBagViewStream: no value columns")
    require(!keyCols.contains("n") && opCol != "n",
      "cdcBagViewStream: columns collide with the n state name")
    changes.groupBy(keyCols.map(col): _*)
      .agg(sum(col(opCol).cast("long")).as("n"))
  }

  /** Running per-user event counter with typed state
    * (mapGroupsWithState) — the custom-state escape hatch for logic
    * windows can't express. State per user is O(1); pass
    * `idleTimeout = Some("1 hour")` in production so idle users are
    * reaped and state doesn't grow with the all-time user count (the test
    * harness runs without a timeout — `processAllAvailable` and
    * processing-time timeouts don't mix).
    */
  def runningUserCounts(spark: SparkSession, events: DataFrame,
                        idleTimeout: Option[String] = None)
      : Dataset[(Long, Long)] = {
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.select(col("user_id").as[Long], col("event_id").as[Long])
      .groupByKey(_._1)
      .mapGroupsWithState(timeoutConf) {
        (user: Long, rows: Iterator[(Long, Long)],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val n = state.getOption.getOrElse(0L)
            state.remove()
            (user, n)
          } else {
            val n = state.getOption.getOrElse(0L) + rows.size
            state.update(n)
            idleTimeout.foreach(state.setTimeoutDuration)
            (user, n)
          }
      }
  }

}
