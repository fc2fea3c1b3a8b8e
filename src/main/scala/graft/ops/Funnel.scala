package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral-sequence analytics over an event stream — the funnel /
  * path-flow operators every product-analytics warehouse ships
  * (ClickHouse `windowFunnel`/`sequenceMatch`, Snowflake
  * MATCH_RECOGNIZE) and Spark SQL has no native form of.
  *
  * Both operators share one scale argument: the event table shuffles
  * ONCE on the user key and every per-user computation is linear in
  * that user's events. Nothing is ever joined event-to-event — a
  * funnel-as-self-join (stage-k ⋈ stage-k+1 on user + time range)
  * explodes combinatorially on power users, while the fold below is a
  * single pass. State per user = its sorted event list; a user whose
  * history outgrows executor memory is a data-quality problem (bot) a
  * pipeline caps upstream — cf. SCALE.md.
  */
object Funnel {

  /** Per-user furthest funnel stage: stage k is reached iff the user's
    * events, in (ts, id) order, contain `steps(0) … steps(k-1)` as a
    * subsequence. Greedy earliest-match is optimal for the unbounded
    * funnel (standard exchange argument), so "first event matching the
    * next step advances the fold" computes the true max stage — and is
    * exactly replayable as a min-rank chain in SQL (the oracle's form).
    *
    * One shuffle (the user groupBy); the fold is a codegen'd HOF over
    * the sorted per-user array. Output: (userCol, stage) — stage 0
    * means "has events, none matching steps(0)". */
  def funnelStages(events: DataFrame, userCol: String, tsCol: String,
                   idCol: String, typeCol: String,
                   steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // typed-literal steps array + Column-based fold: step names never
    // pass through SQL text, so quotes/backslashes in them can't break
    // (or silently alter) the expression
    val stepsCol = typedlit(steps)
    events
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(
        struct(col(tsCol).as("t"), col(idCol).as("i"), col(typeCol).as("y"))))
        .as("__ev"))
      .select(col(userCol),
        aggregate(col("__ev"), lit(0), (st, e) =>
          when(st < steps.length &&
            e.getField("y") === element_at(stepsCol, st + lit(1)), st + lit(1))
            .otherwise(st)).as("stage"))
  }

  /** Funnel conversion table: one row per step k — (stage, step,
    * users = how many users reached step k or beyond). The per-user
    * stages collapse to a ≤|steps|-row aggregate, then the cumulative
    * count is a window over those few rows (never over users). */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
                   idCol: String, typeCol: String,
                   steps: Seq[String]): DataFrame =
    stageCounts(funnelStages(events, userCol, tsCol, idCol, typeCol, steps), steps)

  /** [[funnelCounts]]' aggregation tail over any per-user `stage` frame
    * (shared with the streaming funnel st11, whose per-user stages come
    * out of GroupState instead of the batch fold). */
  def stageCounts(perUserStages: DataFrame, steps: Seq[String]): DataFrame = {
    val spark = perUserStages.sparkSession
    import spark.implicits._
    val perStage = perUserStages.groupBy("stage").agg(count(lit(1)).as("n"))
    val labels = steps.zipWithIndex
      .map { case (s, i) => (i + 1, s) }.toDF("stage", "step")
    val cum = Window.orderBy(col("stage").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    labels.join(perStage, Seq("stage"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("users", sum("n").over(cum))
      .select(col("stage"), col("step"), col("users"))
  }

  /** Cohort-retention triangle — the third classic of the
    * product-analytics trio (funnel, flow, retention): users are
    * cohorted by the week of their FIRST event; cell (cohort_week,
    * week_offset) counts distinct cohort members active in that later
    * week. Weeks are Monday-truncated in both engines (Spark and
    * DuckDB `date_trunc('week', …)` agree), offsets are exact integer
    * microsecond division, and cells are distinct counts — so the whole
    * triangle is hash-exact.
    *
    * Shape: one aggregate to (user, t0) — users-sized; one shuffle join
    * of events against it on the user key (the unavoidable cohort
    * attach; broadcastable while the user dimension fits, a plain
    * shuffle join beyond); then a distinct + count whose cardinality is
    * (cohorts × offsets × users-active) — bounded by events, collapsing
    * map-side. Output: cohort_week_us, week_offset, users. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstEv = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("__cohort"))
    events
      .select(col(userCol), date_trunc("week", col(tsCol)).as("__week"))
      .join(firstEv, Seq(userCol))
      // offsets via DATE difference, not a fixed-microsecond week: in a
      // DST session timezone calendar weeks are not 604,800 s long, and
      // a µs division would fold week-1 activity into the cohort cell;
      // week starts are always a multiple of 7 DAYS apart
      .select(col(userCol), col("__cohort"),
        expr("datediff(to_date(__week), to_date(__cohort)) div 7")
          .cast("long").as("week_offset"))
      .distinct()
      .groupBy(unix_micros(col("__cohort")).as("cohort_week_us"), col("week_offset"))
      .agg(count(lit(1)).as("users"))
  }

  /** RFM segmentation — the fourth classic of the product-analytics
    * suite (funnel, flow, retention, segmentation): per-user Recency
    * (days since last event, against the corpus max so the answer is
    * reproducible), Frequency (event count) and Monetary (decimal-exact
    * value sum), each scored into quintiles. Scores are 5 = best
    * (most recent / most frequent / highest spend); every ntile
    * ordering carries the user id as a total-order tiebreak, so the
    * quintile assignment — normally the nondeterministic part of RFM —
    * is exact and engine-portable.
    *
    * Shape: one users-sized aggregate (map-side combining), the corpus
    * max attached as a broadcast scalar; the three ntile windows run
    * over the users-sized frame, not events. A 10⁹-user frame makes
    * un-partitioned ntile a single task — at that scale swap exact
    * quintiles for approx-percentile cutoffs broadcast back (cr5's
    * shape); the per-user aggregate is unchanged.
    *
    * Output: userCol, recency_days, frequency, monetary, r, f, m,
    * segment ("RFM" digit string). */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
                  valueCol: String): DataFrame = {
    val perUser = events.groupBy(col(userCol))
      .agg(max(col(tsCol)).as("__last"),
        count(lit(1)).as("frequency"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(38, 6)))
          .cast("double").as("monetary"))
    val corpusMax = events.agg(max(col(tsCol)).as("__cmax"))
    def score(orderBy: Seq[Column]) =
      lit(6) - ntile(5).over(Window.orderBy(orderBy: _*))
    perUser.crossJoin(broadcast(corpusMax))
      .withColumn("recency_days",
        datediff(to_date(col("__cmax")), to_date(col("__last"))))
      .withColumn("r", score(Seq(col("__last").desc, col(userCol).asc)))
      .withColumn("f", score(Seq(col("frequency").desc, col(userCol).asc)))
      .withColumn("m", score(Seq(col("monetary").desc, col(userCol).asc)))
      .withColumn("segment", concat(col("r"), col("f"), col("m")))
      .select(col(userCol), col("recency_days"), col("frequency"),
        col("monetary"), col("r"), col("f"), col("m"), col("segment"))
  }

  /** Event-to-event transition counts (the Markov flow matrix product
    * analytics draws as a Sankey): for each user's (ts, id)-ordered
    * stream, count consecutive (from_type → to_type) pairs across the
    * whole corpus. One shuffle on the user key (the lead window);
    * the final aggregate is |types|² rows. */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
  }
}
