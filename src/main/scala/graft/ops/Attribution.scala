package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution over an event stream — the
  * marketing-analytics standard for "which touches get credit for this
  * conversion" (first-touch / last-touch / linear are the three models
  * every attribution platform ships; see e.g. Shao & Li, *Data-driven
  * multi-touch attribution models*, KDD 2011 §2 for the taxonomy). The
  * same shape answers pipeline questions too: which crawl/source touches
  * preceded a document's admission, which retrieval hits preceded a
  * click.
  *
  * All three models are emitted on ONE touch-grain relation in integer
  * basis points, so a consumer sums `*_bp` by channel and divides by
  * 10⁴ — and any engine replays the arithmetic bit-exactly:
  *  - `first_bp` = 10⁴ on the EARLIEST touch in the window, else 0;
  *  - `last_bp`  = 10⁴ on the LATEST touch, else 0;
  *  - `linear_bp` = `10⁴ div n` per touch, with the remainder
  *    `10⁴ − n·(10⁴ div n)` assigned to the LATEST touch (deterministic
  *    largest-position remainder — the [[Sampling]] Hamilton posture
  *    flattened to one winner so no engine needs a second ranking pass);
  *    per-conversion credits always sum to exactly 10⁴.
  *
  * Window rule: a touch is attributed to a conversion iff it is STRICTLY
  * earlier (`touch_ts < conv_ts` — a same-microsecond event is not a
  * cause) and within `lookbackUs`. Position order is (ts, touch id), the
  * engine-wide deterministic tie. Conversions with zero in-window touches
  * emit NO rows (the "direct conversion" bucket is the complement —
  * count conversions minus distinct attributed `conv_id`s).
  *
  * Scale shape: one user-keyed join of conversions onto touches with the
  * window predicate (SMJ on the user key; per-user cost is
  * n_conv·n_touch), then two conversion-keyed windows that AQE plans on
  * the join's own exchange. The per-user quadratic is THE hazard — one
  * bot user with 10⁶ touches and 10⁴ "conversions" is 10¹⁰ joined rows —
  * so users whose touch count exceeds `maxUserTouches` are DROPPED WHOLE
  * before the join (the [[Graph.cooccurrence]] cap posture: a truncated
  * touch history would silently mis-credit first/linear models, and an
  * over-cap user is bot traffic, not attribution signal).
  * [[touchCreditAudit]] is the loud twin; run both, alert on the audit.
  */
object Attribution {

  /** Touch-grain attribution: one row per (conversion, in-window touch)
    * with `(user, conv_id, touch_id, touch_type, pos, n_touches,
    * first_bp, last_bp, linear_bp)`. `idCol` must be unique per event
    * (the deterministic tie and the join identity) and is carried at its
    * NATIVE type — no silent numeric cast (r17 advice: a `cast("long")`
    * here turned every non-numeric id into NULL, collapsing the conv_id
    * window partitions into one NULL group with the contract violated
    * invisibly; any orderable id type ties deterministically as-is). */
  def touchCredit(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String, convType: String,
                  touchTypes: Seq[String], lookbackUs: Long,
                  maxUserTouches: Int): DataFrame = {
    require(touchTypes.nonEmpty, "touchCredit: no touch types")
    require(!touchTypes.contains(convType),
      s"touchCredit: conversion type $convType cannot also be a touch")
    require(lookbackUs > 0,
      s"touchCredit: lookbackUs must be > 0, got $lookbackUs")
    require(maxUserTouches >= 1,
      s"touchCredit: maxUserTouches must be >= 1, got $maxUserTouches")
    val ev = events.select(col(userCol).as("u"),
      unix_micros(col(tsCol)).as("us"), col(idCol).as("eid"),
      col(typeCol).as("ty"))
    val wU = org.apache.spark.sql.expressions.Window.partitionBy(col("u"))
    val touches = ev.filter(col("ty").isin(touchTypes: _*))
      .withColumn("__n", count(lit(1)).over(wU))
      .filter(col("__n") <= maxUserTouches).drop("__n")
    val conv = ev.filter(col("ty") === convType)
      .select(col("u"), col("us").as("cus"), col("eid").as("conv_id"))
    val joined = conv.join(
        touches.select(col("u"), col("us").as("tus"),
          col("eid").as("touch_id"), col("ty").as("touch_type")),
        Seq("u"))
      .filter(col("tus") < col("cus") &&
        col("tus") >= col("cus") - lookbackUs)
    val wPos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("tus"), col("touch_id"))
    val wN = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id"))
    joined
      .withColumn("pos", row_number().over(wPos).cast("long"))
      .withColumn("n_touches", count(lit(1)).over(wN))
      .select(col("u").as(userCol), col("conv_id"), col("touch_id"),
        col("touch_type"), col("pos"), col("n_touches"),
        when(col("pos") === 1L, lit(10000L)).otherwise(lit(0L))
          .as("first_bp"),
        when(col("pos") === col("n_touches"), lit(10000L))
          .otherwise(lit(0L)).as("last_bp"),
        (expr("10000L div n_touches") +
          when(col("pos") === col("n_touches"),
            lit(10000L) - col("n_touches") * expr("10000L div n_touches"))
            .otherwise(lit(0L))).as("linear_bp"))
  }

  /** Audit twin of [[touchCredit]]: the users the cap dropped whole,
    * with their touch counts — `(userCol, n_touches)` where
    * `n_touches > maxUserTouches`. Alert when non-empty; raise the cap
    * deliberately or blocklist the bot. */
  def touchCreditAudit(events: DataFrame, userCol: String,
                       typeCol: String, touchTypes: Seq[String],
                       maxUserTouches: Int): DataFrame = {
    require(touchTypes.nonEmpty, "touchCreditAudit: no touch types")
    require(maxUserTouches >= 1,
      s"touchCreditAudit: maxUserTouches must be >= 1, got " +
        s"$maxUserTouches")
    events.filter(col(typeCol).isin(touchTypes: _*))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_touches"))
      .filter(col("n_touches") > maxUserTouches)
  }
}
