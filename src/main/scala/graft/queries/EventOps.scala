package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Behavioral-sequence analytics over the `events` table [extension —
  * the funnel/path operators of a product-analytics warehouse; see
  * graft.ops.Funnel for the one-shuffle scale argument].
  */
object EventOps {

  /** The canonical commerce funnel present in the fixture's event mix
    * (shared with the streaming form, st11). */
  private[queries] val FUNNEL_STEPS = Seq("view", "click", "purchase")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // fn1 — funnel conversion [extension]: per-user furthest stage of
    // view → click → purchase (subsequence in (ts, id) order; greedy
    // earliest-match fold over one sorted per-user array — a single
    // shuffle, where the naive stage-to-stage self-join explodes on
    // power users), collapsed to a 3-row conversion table.
    "fn1_funnel" -> ((s, dir) =>
      graft.ops.Funnel.funnelCounts(Tables.events(s, dir),
        "user_id", "ts", "event_id", "event_type", FUNNEL_STEPS)
        .orderBy("stage")),

    // fn2 — event-flow transition matrix [extension]: consecutive
    // (from → to) event-type counts per user stream — the Sankey /
    // Markov-flow table; one lead window on the user key.
    "fn2_event_transitions" -> ((s, dir) =>
      graft.ops.Funnel.transitions(Tables.events(s, dir),
        "user_id", "ts", "event_id", "event_type")
        .orderBy("from_type", "to_type")),

    // fn3 — cohort retention triangle [extension]: users cohorted by
    // first-event week, cell = distinct cohort members active at each
    // later week offset; Monday-truncated weeks + integer microsecond
    // offsets + distinct counts make the triangle hash-exact
    // (graft.ops.Funnel.cohortRetention).
    "fn3_cohort_retention" -> ((s, dir) =>
      graft.ops.Funnel.cohortRetention(Tables.events(s, dir), "user_id", "ts")
        .orderBy("cohort_week_us", "week_offset")),

    // fn4 — RFM segmentation [extension]: per-user recency/frequency/
    // monetary quintile scores (5 = best) with id-tiebroken ntiles, so
    // the normally nondeterministic quintile edges are exact and
    // engine-portable; decimal-exact monetary sums
    // (graft.ops.Funnel.rfmSegments).
    "fn4_rfm_segmentation" -> ((s, dir) =>
      graft.ops.Funnel.rfmSegments(Tables.events(s, dir), "user_id", "ts", "value")
        .orderBy("user_id")))

  /** The fold's greedy earliest-match is replayed as a min-rank chain:
    * rank events per user by (ts, id); r1 = first 'view', r2 = first
    * 'click' after r1, r3 = first 'purchase' after r2 (the exchange
    * argument in Funnel.funnelStages' Scaladoc makes these the same
    * semantics). */
  val oracles: Map[String, String] = Map(
    "fn1_funnel" -> {
      val Seq(s1, s2, s3) = FUNNEL_STEPS
      s"""WITH e AS (
         |  SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         |  FROM events),
         |v1 AS (SELECT user_id, min(rn) AS r1 FROM e
         |       WHERE event_type = '$s1' GROUP BY 1),
         |v2 AS (SELECT e.user_id, min(rn) AS r2 FROM e
         |       JOIN v1 USING (user_id)
         |       WHERE event_type = '$s2' AND rn > r1 GROUP BY 1),
         |v3 AS (SELECT e.user_id, min(rn) AS r3 FROM e
         |       JOIN v2 USING (user_id)
         |       WHERE event_type = '$s3' AND rn > r2 GROUP BY 1)
         |SELECT stage, step, users FROM (VALUES
         |  (1, '$s1', (SELECT count(*) FROM v1)),
         |  (2, '$s2', (SELECT count(*) FROM v2)),
         |  (3, '$s3', (SELECT count(*) FROM v3))) t(stage, step, users)
         |ORDER BY stage""".stripMargin
    },

    "fn2_event_transitions" ->
      """WITH s AS (
        |  SELECT user_id, event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events)
        |SELECT from_type, to_type, count(*) AS n FROM s
        |WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin,

    "fn4_rfm_segmentation" ->
      """WITH p AS (
        |  SELECT user_id, max(ts) AS last_ts,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS monetary
        |  FROM events GROUP BY 1),
        |cm AS (SELECT max(ts) AS cmax FROM events),
        |sc AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', CAST(last_ts AS DATE), CAST(cmax AS DATE)) AS INT)
        |      AS recency_days,
        |    frequency, monetary,
        |    6 - ntile(5) OVER (ORDER BY last_ts DESC, user_id ASC) AS r,
        |    6 - ntile(5) OVER (ORDER BY frequency DESC, user_id ASC) AS f,
        |    6 - ntile(5) OVER (ORDER BY monetary DESC, user_id ASC) AS m
        |  FROM p, cm)
        |SELECT user_id, recency_days, frequency, monetary, r, f, m,
        |  CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR) AS segment
        |FROM sc ORDER BY user_id""".stripMargin,

    "fn3_cohort_retention" ->
      """WITH f AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort
        |  FROM events GROUP BY 1),
        |a AS (
        |  SELECT DISTINCT e.user_id, f.cohort,
        |    CAST(date_diff('day', CAST(f.cohort AS DATE),
        |      CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT) AS week_offset
        |  FROM events e JOIN f USING (user_id))
        |SELECT epoch_us(cohort) AS cohort_week_us, week_offset,
        |  count(*) AS users
        |FROM a GROUP BY 1, 2 ORDER BY cohort_week_us, week_offset""".stripMargin)
}
