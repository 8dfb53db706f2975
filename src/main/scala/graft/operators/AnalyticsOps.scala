package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GQuery, Tables}

/** Product-analytics operators over the `events` stream table — the
  * aggregate query shapes a user of the reference's clickstream jobs
  * (CourseUseCase.java:90-186, BrowserStreamDataGenerator.java:38-66)
  * builds next once per-window counts exist: retention cohorts, ordered
  * funnels, statistical anomaly flags, deterministic mode.
  *
  * Scale notes inline per query; the common theme is that every stage is
  * keyed on `user_id` (high cardinality, co-partitioned across stages) or
  * a low-cardinality group key whose per-group state is O(1).
  */
object AnalyticsOps {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "events")

  // Retention cohort: users bucketed by first-seen day; activity counted
  // per (cohort day, days-since-cohort). The standard growth-analytics
  // triangle. At 100 TB: first-seen is one shuffle on user_id; the join
  // back is co-partitioned with it (AQE reuses the exchange), and the
  // final count-distinct shuffles (cohort_d, day_offset) with partial
  // aggregation — no driver-side anything, no skew (day keys are dense).
  private val a8Retention = GQuery(
    "a8_retention_cohort",
    (s, dir) => {
      val e = events(s, dir).select(col("user_id"), to_date(col("ts")).as("d"))
      val first = e.groupBy(col("user_id")).agg(min(col("d")).as("cohort_d"))
      e.join(first, Seq("user_id"))
        .groupBy(col("cohort_d"), datediff(col("d"), col("cohort_d")).cast("long").as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    },
    Some("""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_d FROM events GROUP BY 1),
a AS (SELECT e.user_id, f.cohort_d,
             date_diff('day', f.cohort_d, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN f USING (user_id))
SELECT cohort_d, day_offset, count(DISTINCT user_id) AS n_users
FROM a GROUP BY 1, 2"""),
    "Retention triangle: first-seen-day cohorts x day offset x active users.")

  // Ordered funnel: signup -> view -> click -> purchase, each step's
  // timestamp strictly after the previous step's. Classic sequential
  // conversion counting — the ORDER constraint is what makes it a funnel
  // and not four independent counts. Every stage aggregates and joins on
  // user_id, so all four steps ride the same partitioning; the population
  // shrinks monotonically, and AQE flips the later (tiny) sides to
  // broadcast on its own. No window-function over the whole event stream:
  // min-after-anchor per stage keeps state O(1) per user.
  private val a9Funnel = GQuery(
    "a9_funnel",
    (s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
      def anchor(typ: String): DataFrame =
        e.filter(col("event_type") === typ)
          .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
      def step(prev: DataFrame, typ: String): DataFrame =
        e.filter(col("event_type") === typ)
          .join(prev.select(col("user_id"), col("t").as("pt")), Seq("user_id"))
          .filter(col("ts") > col("pt"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
      val s1 = anchor("signup")
      val s2 = step(s1, "view")
      val s3 = step(s2, "click")
      val s4 = step(s3, "purchase")
      def cnt(df: DataFrame, i: Int, nm: String): DataFrame =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i).as("step"), lit(nm).as("step_name"), col("n_users"))
      cnt(s1, 1, "signup")
        .unionByName(cnt(s2, 2, "view"))
        .unionByName(cnt(s3, 3, "click"))
        .unionByName(cnt(s4, 4, "purchase"))
    },
    Some("""WITH s1 AS (SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1),
s4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s3 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1)
SELECT 1 AS step, 'signup' AS step_name, count(*) AS n_users FROM s1
UNION ALL SELECT 2, 'view', count(*) FROM s2
UNION ALL SELECT 3, 'click', count(*) FROM s3
UNION ALL SELECT 4, 'purchase', count(*) FROM s4"""),
    "Ordered 4-step conversion funnel (each step strictly after the previous).")

  // Statistical anomaly flags: per-event-type z-score over `value`, flag
  // z > 3 (the value distribution is exponential-ish, so the right tail
  // is populated). Two passes: a 5-row stats table (broadcast — never a
  // shuffle of the event stream) and a map-side score+filter. At 100 TB
  // this is the cheapest possible shape: one partial-agg pass, one scan.
  // The +1e-9 inside round() absorbs the cross-engine 1-ulp FMA drift.
  private val a10Zscore = GQuery(
    "a10_zscore_outliers",
    (s, dir) => {
      val e = events(s, dir)
      val stats = e.groupBy(col("event_type"))
        .agg(avg(col("value")).as("mu"), stddev_pop(col("value")).as("sigma"))
      e.join(broadcast(stats), Seq("event_type"))
        .withColumn("z", (col("value") - col("mu")) / col("sigma"))
        .filter(col("z") > 3.0)
        .select(col("event_id"), col("event_type"),
          round(col("z") + lit(1e-9), 3).as("z"))
    },
    Some("""WITH st AS (SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
            FROM events GROUP BY 1)
SELECT e.event_id, e.event_type, round((e.value - st.mu) / st.sigma + 1e-9, 3) AS z
FROM events e JOIN st USING (event_type)
WHERE (e.value - st.mu) / st.sigma > 3.0"""),
    "Per-type z-score outlier flags (z > 3) via broadcast stats join.")

  // Deterministic mode: most frequent l_quantity per return flag, ties
  // broken toward the smaller value. Built-in mode() is tie-nondeterministic
  // across engines, so both sides compute count + row_number with the same
  // explicit ordering. At 100 TB: partial agg collapses the (flag, qty)
  // pairs map-side; the window runs over ~50 rows per flag.
  private val qMode = GQuery(
    "q_mode_quantity",
    (s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("cnt").desc, col("l_quantity"))
      Tables.t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt"))
    },
    Some("""WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS cnt
           FROM lineitem GROUP BY 1, 2),
r AS (SELECT l_returnflag, l_quantity, cnt,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY cnt DESC, l_quantity) AS rn
      FROM c)
SELECT l_returnflag, l_quantity AS mode_qty, cnt FROM r WHERE rn = 1"""),
    "Deterministic per-group mode (explicit tiebreak, unlike built-in mode()).")

  val all: Seq[GQuery] = Seq(a8Retention, a9Funnel, a10Zscore, qMode)
}
