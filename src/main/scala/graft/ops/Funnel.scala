package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-sequence analytics: funnel conversion and cohort
  * retention — the two classic event-table rollups the reference's
  * notebook analytics stop short of (its gold layer ends at windowed
  * avg/max, `gold_aggregation.py:52-109`).
  *
  * Scale shapes (the whole point at 100 TB):
  *
  *  - [[funnel]]: ONE hash-exchange on the user key reused by k chained
  *    window passes (same partitioning ⇒ Catalyst plans a single
  *    Exchange; each step's conditional `min` is a frame-free window
  *    aggregate). No self-joins of the fact table, no per-step rescans
  *    — the naive formulation joins events⋈events per funnel edge.
  *  - [[cohortRetention]]: the fact table collapses per user into
  *    (first-week, distinct active weeks) in one partial-aggregated
  *    shuffle; per-user state is bounded by the calendar horizon (weeks
  *    in range), never by event volume. The week-offset explode and the
  *    cohort rollup run over the user-cardinality frame, not events.
  */
object Funnel {

  /** Strictly-ordered funnel: for each user, step i is reached at the
    * earliest event of `steps(i)` that happens STRICTLY AFTER the user's
    * step-(i-1) time (step 0 is the user's earliest `steps(0)` event).
    * Returns one row per funnel step: `step` (1-based), `step_name`,
    * `n_users` reaching it, and `conv_rate` = n_users / step-1 users
    * (9 dp double).
    *
    * All k conditional mins share one `Window.partitionBy(user)` — one
    * shuffle regardless of funnel depth. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(userCol))
    // chain: t_i = min(ts where type = steps(i) and ts > t_{i-1}) over user
    val withTimes = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(tsCol) > col(s"__t${i - 1}")
      df.withColumn(s"__t$i", min(when(cond, col(tsCol))).over(w))
    }
    // one row per user (any row carries all __t columns after the window)
    val perUser = withTimes
      .groupBy(col(userCol))
      .agg(steps.indices.map(i => first(col(s"__t$i")).as(s"__t$i")).head,
        steps.indices.tail.map(i => first(col(s"__t$i")).as(s"__t$i")): _*)
    val counts = perUser.select(
      steps.indices.map(i =>
        count(col(s"__t$i")).cast("long").as(s"__n$i")): _*)
    // steps-sized literal frame joined to the 1-row counts: driver cost O(k)
    val spark = events.sparkSession
    import scala.jdk.CollectionConverters._
    val stepRows = spark.createDataFrame(
      steps.zipWithIndex.map { case (nm, i) =>
        org.apache.spark.sql.Row(i + 1, nm)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("step",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("step_name",
          org.apache.spark.sql.types.StringType, nullable = false))))
    stepRows
      .crossJoin(broadcast(counts))
      .select($"step", $"step_name",
        steps.indices.map(i =>
          when($"step" === i + 1, col(s"__n$i")).otherwise(null)
        ).reduce((a, b) => coalesce(a, b)).as("n_users"),
        steps.indices.map(i =>
          when($"step" === i + 1,
            if (i == 0) lit(1.0)
            else col(s"__n$i") / col(s"__n${i - 1}"))
            .otherwise(null)
        ).reduce((a, b) => coalesce(a, b)).as("__rate"))
      .withColumn("conv_rate", round($"__rate", 9))
      .drop("__rate")
      .orderBy($"step")
  }

  /** First-order Markov transition matrix of the event stream: for each
    * ordered pair of event types, how often one follows the other within
    * a user's time-ordered stream, and the row-normalized transition
    * probability (9 dp double) — the behavioral fingerprint funnels are a
    * special path through.
    *
    * Shape: ONE hash-exchange on the user key for the `lead` window (per
    * user, ordered by (ts, idCol) — the id tie-break makes equal-time
    * orderings deterministic); the pair rollup and the row-normalizing
    * window both run on the type²-cardinality transition frame, never on
    * events. */
  def eventTransitions(events: DataFrame, userCol: String, tsCol: String,
                       idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val trans = events
      .select(col(userCol), col(tsCol), col(idCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead($"from_type", 1).over(w))
      .where($"to_type".isNotNull)
      .groupBy($"from_type", $"to_type")
      .agg(count(lit(1)).cast("long").as("n_trans"))
    val wf = Window.partitionBy($"from_type")
    trans
      .withColumn("prob", round($"n_trans" / sum($"n_trans").over(wf), 9))
      .orderBy($"from_type", $"to_type")
  }

  /** First-/last-touch attribution — for every conversion event, which
    * touch type (strictly earlier in the user's stream) gets the
    * credit: the user's FIRST qualifying touch (first-touch model) and
    * their LATEST one before the conversion (last-touch model), the two
    * bookend models every attribution report starts from. Conversions
    * with no prior touch credit `(none)`. Output one row per credited
    * type: conversions credited first-touch / last-touch.
    *
    * Shape: ONE user-keyed Exchange carries both window passes (same
    * partitioning + ordering ⇒ one Window node with two frames over the
    * `rows (-∞, -1)` prefix, `ignoreNulls` skipping non-touch rows);
    * everything after the conversion filter is type-cardinality. Ties
    * at equal timestamps order by the event id ([[eventTransitions]]'
    * convention). */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String, convType: String,
                  touchTypes: Seq[String]): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      s"touchTypes must be non-empty and exclude '$convType'")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol).isInCollection(touchTypes), col(typeCol))
    val conv = events
      .withColumn("__first", first(touch, ignoreNulls = true).over(w))
      .withColumn("__last", last(touch, ignoreNulls = true).over(w))
      .where(col(typeCol) === convType)
      .select(coalesce($"__first", lit("(none)")).as("first_touch"),
        coalesce($"__last", lit("(none)")).as("last_touch"))
    // both models roll up in ONE aggregation over an exploded
    // (kind, touch_type) pair — two independent groupBys full-outer
    // joined would re-scan and re-window the event stream per model
    conv.select(explode(array(
        struct(lit("f").as("kind"), $"first_touch".as("touch_type")),
        struct(lit("l").as("kind"), $"last_touch".as("touch_type"))))
        .as("__e"))
      .groupBy($"__e.touch_type".as("touch_type"))
      .agg(sum(when($"__e.kind" === "f", 1L).otherwise(0L))
          .cast("long").as("n_first"),
        sum(when($"__e.kind" === "l", 1L).otherwise(0L))
          .cast("long").as("n_last"))
  }

  /** Weekly cohort retention: users are cohorted by the ISO week of their
    * FIRST event; for each (cohort week, week offset ≥ 0) the output
    * carries the distinct users active that week, the cohort size, and
    * the retention rate (9 dp double). The per-user collapse keeps
    * `collect_set(week)` state bounded by the calendar horizon — weeks
    * in the data's time range — so a user with 10^9 events costs the
    * same as one with a single event per week. */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val perUser = events
      .groupBy(col(userCol))
      .agg(
        date_trunc("week", min(col(tsCol))).as("cohort_week"),
        collect_set(date_trunc("week", col(tsCol))).as("__weeks"))
    val activity = perUser.select(
      $"cohort_week",
      explode($"__weeks").as("__week"))
      // calendar-wise, not epoch-seconds/604800: under a DST timezone a
      // date_trunc('week') boundary can sit 3600 s off a 7-day multiple,
      // which floor() would fold into the wrong offset bucket
      .withColumn("week_offset",
        floor(datediff(to_date($"__week"), to_date($"cohort_week")) / 7)
          .cast("int"))
      .groupBy($"cohort_week", $"week_offset")
      .agg(count(lit(1)).cast("long").as("n_active"))
    val sizes = perUser.groupBy($"cohort_week")
      .agg(count(lit(1)).cast("long").as("n_cohort"))
    activity.join(sizes, Seq("cohort_week"))
      .select($"cohort_week", $"week_offset", $"n_active", $"n_cohort",
        round($"n_active" / $"n_cohort", 9).as("retention"))
      .orderBy($"cohort_week", $"week_offset")
  }
}
