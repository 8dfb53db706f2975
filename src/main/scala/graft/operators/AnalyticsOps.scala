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

  // Peak concurrency per day — the sweep-line pattern: each event opens a
  // "session" [ts, ts + value seconds]; +1/-1 deltas ordered by time, a
  // running sum, and the day's max is the answer. Sessions count toward
  // their START day (a rare cross-midnight tail still closes in the same
  // partition — documented semantics, mirrored exactly in the oracle).
  //
  // Scale shape: a single ORDER BY t running sum would serialize each day
  // into one window task (billions of rows/day at 100 TB). Instead the
  // prefix sum is HIERARCHICAL, the same trick as q_percentiles' rank
  // offsets: partition by (day, absolute-hour bucket) for the local
  // running sums — the bucket is derived from t, so it is monotone in the
  // sort order — then add the broadcast per-bucket delta totals' prefix
  // as an offset. Every stage is bounded by rows/hour, not rows/day, and
  // deeper nesting (minute buckets) extends the same recurrence if an
  // hour is still too hot. The ENTIRE sweep — keys, sort order, day
  // bucketing — runs in the integer epoch-microsecond domain (BIGINT
  // everywhere, day = us div 86'400'000'000): no timestamp arithmetic,
  // no interval addition, no timestamp ORDER BY on either engine, so no
  // DuckDB-version / TIMESTAMP_NS-precision semantics can perturb the
  // comparison. At equal t, ends (-1) sort before starts (+1), so
  // back-to-back sessions never double-count.
  private val a11Peak = GQuery(
    "a11_peak_concurrency",
    (s, dir) => {
      val e = events(s, dir)
        .select(expr("unix_micros(ts)").as("t0"),
          expr("cast(round(value * 1e6) AS bigint)").as("dur_us"))
      val starts = e.select(expr("t0 div 86400000000").as("d"), col("t0").as("t"), lit(1).as("delta"))
      val ends = e.select(expr("t0 div 86400000000").as("d"),
        (col("t0") + col("dur_us")).as("t"), lit(-1).as("delta"))
      // pinned: the interval-delta frame feeds the local running sum AND
      // the per-bucket offsets — unpinned, both event scans of the union
      // ran twice each (round 19; narrow 4-column frame)
      val iv = graft.Checkpoints.pin(starts.unionByName(ends)
        .withColumn("hb", expr("t div 3600000000")))
      val local = iv.withColumn("lrs",
        sum(col("delta")).over(Window.partitionBy(col("d"), col("hb"))
          .orderBy(col("t"), col("delta"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val off = iv.groupBy(col("d"), col("hb")).agg(sum(col("delta")).as("tot"))
        .withColumn("off", coalesce(sum(col("tot")).over(
          Window.partitionBy(col("d")).orderBy(col("hb"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("d"), col("hb"), col("off"))
      local.join(broadcast(off), Seq("d", "hb"))
        .groupBy(col("d"))
        .agg(max(col("lrs") + col("off")).as("peak"))
    },
    Some("""WITH iv AS (
  SELECT epoch_us(ts) // 86400000000 AS d, epoch_us(ts) AS t, 1 AS delta FROM events
  UNION ALL
  SELECT epoch_us(ts) // 86400000000 AS d,
         epoch_us(ts) + CAST(round(value * 1e6) AS BIGINT) AS t, -1 AS delta
  FROM events),
s AS (SELECT d, sum(delta) OVER (PARTITION BY d ORDER BY t, delta
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs FROM iv)
SELECT d, CAST(max(rs) AS BIGINT) AS peak FROM s GROUP BY d"""),
    "Max concurrent sessions per day via hierarchical sweep-line prefix sum.")

  // EWMA smoothing over each user's last 8 values — time-series feature
  // engineering as a window + higher-order-function composition. The
  // frame list is reversed so the newest value takes weight 0.5^0, and
  // the weighted fold runs SEQUENTIALLY over at most 8 elements in both
  // engines (identical order, alpha=0.5 so every weight is an exact
  // binary double) — cross-engine FP equality by construction, with the
  // usual round(+1e-9) pin. Scale: one shuffle on user_id, O(frame) state
  // per row inside the window — a hot user degrades to one task and takes
  // the a2b salt/offset remedy if real data demands it.
  private val a12Ewma = GQuery(
    "a12_ewma_smooth",
    (s, dir) =>
      events(s, dir)
        .withColumn("vals", collect_list(col("value")).over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
            .rowsBetween(-7, Window.currentRow)))
        .withColumn("rev", reverse(col("vals")))
        .selectExpr("user_id", "event_id",
          """round(aggregate(transform(sequence(0, size(rev) - 1), k -> element_at(rev, k + 1) * power(0.5, k)),
                   cast(0 AS double), (a, v) -> a + v)
             / aggregate(transform(sequence(0, size(rev) - 1), k -> power(0.5, k)),
                   cast(0 AS double), (a, v) -> a + v) + 1e-9, 6) AS ewma"""),
    Some("""WITH f AS (
  SELECT user_id, event_id,
         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS vals
  FROM events),
r AS (SELECT user_id, event_id, list_reverse(vals) AS rev FROM f)
SELECT user_id, event_id,
       round(list_aggregate(list_transform(range(len(rev)), k -> rev[k + 1] * power(0.5, k)), 'sum')
             / list_aggregate(list_transform(range(len(rev)), k -> power(0.5, k)), 'sum') + 1e-9, 6) AS ewma
FROM r"""),
    "Exponentially weighted moving average (alpha=0.5) over an 8-event frame.")

  // Next-event transition matrix — first-order Markov chain over each
  // user's event sequence: P(next | current) with per-pair counts. The
  // sequence dependency is ONE lead() window per user (co-partitioned
  // with every other user_id-keyed stage); the matrix itself is a
  // (from, to) aggregate of at most |types|^2 rows, and the probability
  // normalization joins against the per-from totals computed from the
  // SAME aggregate (tiny, broadcast). Probabilities divide two exact
  // integer counts — identical doubles on both engines before the
  // round pin.
  private val a13Transition = GQuery(
    "a13_transition_matrix",
    (s, dir) => {
      val nxt = events(s, dir)
        .withColumn("to_type", lead(col("event_type"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        // pinned: the matrix feeds the row totals AND the final join —
        // unpinned, the per-user lead() window over the full event table
        // ran twice (round 19; the frame is #types^2 rows)
        .transform(graft.Checkpoints.pin(_))
      val tot = nxt.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
      nxt.join(broadcast(tot), Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("n") / col("tot") + lit(1e-9), 6).as("p"))
    },
    Some("""WITH nx AS (
  SELECT event_type AS from_type,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events),
c AS (SELECT from_type, to_type, count(*) AS n FROM nx
      WHERE to_type IS NOT NULL GROUP BY 1, 2),
t AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY 1)
SELECT from_type, to_type, n, round(n / tot + 1e-9, 6) AS p
FROM c JOIN t USING (from_type)"""),
    "First-order Markov transition matrix over per-user event sequences.")

  // Rolling 7-day active users (the DAU/MAU staple) next to exact daily
  // actives. Exact rolling DISTINCT across a window is not a running sum
  // — the standard distributed shape is: dedup (day, user) once, explode
  // each pair into the 7 days it covers, count distinct per day. All day
  // keys live in the INTEGER epoch-day domain (us div 86'400'000'000 —
  // the a11 rule: no date-type semantics in either engine). Scale: one
  // (day, user) dedup shuffle, a 7x map-side expansion with partial
  // aggregation, and a per-day distinct bounded by 7x the deduped pairs;
  // the approximate path at extreme scale is the q_hll_sketch register
  // merge over day buckets — same plan, sketch instead of exact set.
  // Bridge days (inside some trailing window but without events) emit
  // with dau = 0, capped at the corpus' last active day.
  private val a14RollingDau = GQuery(
    "a14_rolling_dau",
    (s, dir) => {
      // pinned: the distinct (day, user) frame feeds BOTH the daily
      // counts and the 7-day explode — unpinned, the full event scan +
      // distinct shuffle ran twice (round 19)
      val du = graft.Checkpoints.pin(events(s, dir)
        .select(expr("unix_micros(ts) div 86400000000").as("d"), col("user_id"))
        .distinct())
      val daily = du.groupBy(col("d")).agg(count(lit(1)).as("dau"))
      val rolled = du
        .select(explode(expr("sequence(d, d + 6)")).as("day"), col("user_id"))
        .groupBy(col("day")).agg(countDistinct(col("user_id")).as("mau7"))
      // the trailing cap (the corpus' last active day) is derived INSIDE
      // the one job: after the per-day join, `d` is non-null exactly on
      // anchor days, so a global-window max over the final ~#days-row
      // frame IS max(d) — one tiny single-partition exchange over rows
      // already shrunk to day granularity. Round-14 change: the previous
      // formulation collected the scalar at PLAN time (du.agg(max).head),
      // which ran a second full dedup+agg job per invocation — the whole
      // query cost ~2x, and the r13 bench elevation (task 5) was this
      // double-job shape amplifying host overhead, not the rolled plan.
      // Empty input degrades for free: no rows, no window, no filter.
      val capW = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      rolled
        .join(daily, col("day") === col("d"), "left")
        .withColumn("maxd", max(col("d")).over(capW))
        .filter(col("day") <= col("maxd"))
        .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"), col("mau7"))
    },
    Some("""WITH du AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS d, user_id FROM events),
daily AS (SELECT d, count(*) AS dau FROM du GROUP BY 1),
ex AS (SELECT unnest(generate_series(d, d + 6)) AS day, user_id FROM du),
r AS (SELECT day, count(DISTINCT user_id) AS mau7 FROM ex GROUP BY 1)
SELECT r.day, COALESCE(daily.dau, 0) AS dau, r.mau7
FROM r LEFT JOIN daily ON daily.d = r.day
WHERE r.day <= (SELECT max(d) FROM du)"""),
    "Exact rolling 7-day active users beside daily actives (integer day domain).")

  // Level-shift (changepoint) detection on daily volume per event type:
  // score each day by (mean of the next 7 daily counts) - (mean of the
  // previous 7), emitted only where both frames are full — the ops-
  // monitoring query that flags deploys/regressions in the event stream.
  // ROWS frames mean "7 observed daily buckets", which equals 7 calendar
  // days on any stream dense enough to monitor; a silent-day gap widens
  // the lookback rather than zero-filling (use a5_gapfill upstream if
  // calendar framing is required). Determinism: frame sums are exact
  // integers (DuckDB window sums CAST from HUGEINT); the single /7
  // division is the only float op. Scale shape: one (event_type, day)
  // partial agg shrinks the stream to ~#types x #days rows, then the
  // window sort is per-type over that tiny frame — the window never sees
  // raw events.
  private val a15LevelShift = GQuery(
    "a15_level_shift",
    (s, dir) => {
      val daily = events(s, dir)
        .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("d"))
        .groupBy(col("event_type"), col("d"))
        .agg(count(lit(1)).as("cnt"))
      val wB = Window.partitionBy("event_type").orderBy("d").rowsBetween(-7, -1)
      val wA = Window.partitionBy("event_type").orderBy("d").rowsBetween(0, 6)
      daily
        .withColumn("bsum", sum(col("cnt")).over(wB))
        .withColumn("bcnt", count(lit(1)).over(wB))
        .withColumn("asum", sum(col("cnt")).over(wA))
        .withColumn("acnt", count(lit(1)).over(wA))
        .filter(col("bcnt") === 7 && col("acnt") === 7)
        .select(col("event_type"), col("d").as("day"), col("bsum"), col("asum"),
          round((col("asum") - col("bsum")) / lit(7.0d) + lit(1e-9), 6).as("shift_score"))
    },
    Some("""WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS d, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, d,
    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS bsum,
    count(*) OVER (PARTITION BY event_type ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS bcnt,
    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY d ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING) AS BIGINT) AS asum,
    count(*) OVER (PARTITION BY event_type ORDER BY d ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING) AS acnt
  FROM daily
)
SELECT event_type, d AS day, bsum, asum,
       round((asum - bsum) / 7e0 + 1e-9, 6) AS shift_score
FROM w WHERE bcnt = 7 AND acnt = 7"""),
    "Rolling 7-day-before vs 7-day-after level-shift score per event type.")

  // Inter-event gap statistics per user — the engagement-cadence report
  // (how often does each user come back; the max gap is the churn
  // signal). Gaps are lag differences in the INTEGER epoch-µs domain
  // (the a11 rule — no sub-second float time math), ordered with the
  // (ts, event_id) tiebreak so duplicate timestamps can't reorder
  // between engines. Scale shape: one user-keyed window sort (the same
  // shuffle every per-user sequence query pays), then a partial-agg
  // fold to one row per user. Sums/max are exact longs; the mean is the
  // single division, rounded once.
  private val a16InterEventGap = GQuery(
    "a16_inter_event_gap",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tsu"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("tsu"))
        .withColumn("gap", col("tsu") - lag(col("tsu"), 1).over(w))
        .filter(col("gap").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap")).as("sum_gap"),
          max(col("gap")).as("max_gap_us"))
        .select(col("user_id"), col("n_gaps"),
          round(col("sum_gap") / col("n_gaps").cast("double") + lit(1e-9), 2).as("avg_gap_us"),
          col("max_gap_us"))
    },
    Some("""WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
  FROM events)
SELECT user_id, count(*) AS n_gaps,
       round(sum(gap) / CAST(count(*) AS DOUBLE) + 1e-9, 2) AS avg_gap_us,
       CAST(max(gap) AS BIGINT) AS max_gap_us
FROM g WHERE gap IS NOT NULL GROUP BY 1"""),
    "Per-user inter-event gap stats (count, mean, max) in exact integer microseconds.")

  // Robust outliers via median absolute deviation — the heavy-tail-safe
  // dual of a10's z-score (one extreme value cannot drag the threshold,
  // unlike mean/stddev). Exactness: `value` is 2-dp by construction, so
  // CAST(round(value * 100)) is an exact integer domain; both medians
  // (value, then absolute deviation) are LOWER medians selected from
  // per-type histograms by the cross-multiplied rank rule 2 * cum >= n —
  // no interpolation, no float compare anywhere until the final display
  // rounding. The outlier test scales the 1.4826 * 3 sigma-equivalence
  // into integers: dev * 10000 > 44478 * mad. 100 TB: two (type, bucket)
  // histogram shuffles (cells bounded by the value domain, ~50k per
  // type), two broadcast joins of per-type scalars back into the scan —
  // the events table is never sorted or windowed per key.
  private val a17MadOutliers = GQuery(
    "a17_mad_outliers",
    (s, dir) => {
      val e = events(s, dir)
        .select(col("event_id"), col("event_type"), col("value"),
          expr("CAST(round(value * 100e0) AS BIGINT)").as("vs"))
      def lowerMedian(df: DataFrame, keyCol: String, valCol: String, out: String): DataFrame = {
        val w = Window.partitionBy(keyCol).orderBy(valCol)
        val tot = Window.partitionBy(keyCol)
        df.groupBy(col(keyCol), col(valCol)).agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum(col("cnt")).over(w))
          .withColumn("n", sum(col("cnt")).over(tot))
          .groupBy(col(keyCol))
          .agg(min(when(col("cum") * 2 >= col("n"), col(valCol))).as(out))
      }
      // Both per-type scalar frames are PINNED (a handful of rows): the
      // lazy `dev` subtree is referenced twice (mad's histogram + the
      // final filter), and unpinned Catalyst re-evaluated the entire med
      // histogram aggregation inside each copy — 18 Exchanges for a
      // 3-pass algorithm (plans/r19/a17_mad_outliers_before.txt). With
      // the scalars pinned, each pass re-reads only the narrow events
      // scan and the broadcast join of a tiny pinned frame (the
      // documented 100 TB shape, now actually the executed plan).
      val med = graft.Checkpoints.pin(
        lowerMedian(e, "event_type", "vs", "med_s"))
      val dev = e.join(broadcast(med), Seq("event_type"))
        .withColumn("dev_s", abs(col("vs") - col("med_s")))
      val mad = graft.Checkpoints.pin(
        lowerMedian(dev, "event_type", "dev_s", "mad_s"))
      dev.join(broadcast(mad), Seq("event_type"))
        .filter(col("dev_s") * 10000L > col("mad_s") * 44478L)
        .select(col("event_id"), col("event_type"),
          round(col("value"), 2).as("value"),
          round(col("med_s") / lit(100.0) + lit(1e-9), 2).as("median"),
          round(col("dev_s") / lit(100.0) + lit(1e-9), 2).as("abs_dev"))
    },
    Some("""WITH e AS (SELECT event_id, event_type, value,
              CAST(round(value * 100) AS BIGINT) AS vs FROM events),
mh AS (SELECT event_type, vs, count(*) AS cnt FROM e GROUP BY 1, 2),
mc AS (SELECT event_type, vs,
         CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY vs) AS BIGINT) AS cum,
         CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
       FROM mh),
med AS (SELECT event_type, min(CASE WHEN cum * 2 >= n THEN vs END) AS med_s
        FROM mc GROUP BY 1),
dev AS (SELECT e.event_id, e.event_type, e.value, e.vs, med.med_s,
          abs(e.vs - med.med_s) AS dev_s
        FROM e JOIN med USING (event_type)),
dh AS (SELECT event_type, dev_s, count(*) AS cnt FROM dev GROUP BY 1, 2),
dc AS (SELECT event_type, dev_s,
         CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY dev_s) AS BIGINT) AS cum,
         CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
       FROM dh),
mad AS (SELECT event_type, min(CASE WHEN cum * 2 >= n THEN dev_s END) AS mad_s
        FROM dc GROUP BY 1)
SELECT d.event_id, d.event_type, round(d.value, 2) AS value,
       round(d.med_s / 100.0 + 1e-9, 2) AS median,
       round(d.dev_s / 100.0 + 1e-9, 2) AS abs_dev
FROM dev d JOIN mad USING (event_type)
WHERE d.dev_s * 10000 > mad.mad_s * 44478"""),
    "MAD-based robust outliers per event type; exact integer medians from histograms.")

  // Seasonality-adjusted traffic anomaly: each hour's event count scored
  // against its OWN (day-of-week, hour-of-day) slot's baseline — the
  // alerting query that doesn't page on every Monday morning peak
  // (unlike a10's global z-score, which flags seasonal highs). The
  // baseline is LEAVE-ONE-OUT (the scored hour is excluded from its own
  // mean/variance — with a point inside an n-sample baseline, |z| is
  // capped at (n-1)/sqrt(n), which makes small-n thresholds vacuous by
  // construction): z = (x − μ₋)/σ₋ with dev = n·x − Σ (identical for
  // LOO after clearing denominators) and var₋ scaled as
  // (n−1)(Σx² − x²) − (Σ − x)². Both enter as EXACT integer expressions
  // — sqrt/division happen once on identical integers, pinned — and
  // the output is the top-20 most anomalous hours by |z| (a ranking,
  // not a threshold, so the report is never vacuously empty; rank on
  // the 6 dp-pinned |z| with integer tiebreaks). Slot keys are pure
  // integer arithmetic on epoch-µs (dow = epoch_day % 7), immune to
  // the engine dayofweek-numbering mismatch a7 had to dodge. Scale:
  // two bounded aggregations (hours, then 168 slots broadcast back) —
  // nothing data-proportional past the first partial agg.
  private val a18Seasonal = GQuery(
    "a18_seasonal_anomaly",
    (s, dir) => {
      val hourly = events(s, dir)
        .selectExpr(
          "unix_micros(ts) div 86400000000 AS epoch_day",
          "(unix_micros(ts) div 3600000000) % 24 AS hour")
        .groupBy(col("epoch_day"), col("hour"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("dow", expr("epoch_day % 7"))
        // pinned: the hourly frame feeds the slot baselines AND the
        // scoring join — unpinned, the event scan + aggregation ran
        // twice (round 19; #days x 24 rows)
        .transform(graft.Checkpoints.pin(_))
      val slots = hourly.groupBy(col("dow"), col("hour"))
        .agg(count(lit(1)).as("n"), sum(col("cnt")).as("sx"),
          sum(col("cnt") * col("cnt")).as("sxx"))
      hourly.join(broadcast(slots), Seq("dow", "hour"))
        .filter(col("n") >= 3)
        .withColumn("dev", expr("(n - 1) * cnt - (sx - cnt)"))
        .withColumn("varn", expr("(n - 1) * (sxx - cnt * cnt) - (sx - cnt) * (sx - cnt)"))
        .filter(col("varn") > 0) // constant-other slots: sigma undefined
        .withColumn("az", round(abs(col("dev")) / sqrt(col("varn")) + lit(1e-9), 6))
        .orderBy(col("az").desc, col("epoch_day"), col("hour"))
        .limit(20)
        .select(col("epoch_day"), col("hour"), col("cnt"),
          round(col("dev") / sqrt(col("varn")) + lit(1e-9), 4).as("z"))
    },
    Some("""WITH h AS (
  SELECT epoch_us(ts) // 86400000000 AS epoch_day,
         (epoch_us(ts) // 3600000000) % 24 AS hour, count(*) AS cnt
  FROM events GROUP BY 1, 2),
hd AS (SELECT epoch_day, hour, cnt, epoch_day % 7 AS dow FROM h),
sl AS (SELECT dow, hour, count(*) AS n, CAST(sum(cnt) AS BIGINT) AS sx,
              CAST(sum(cnt * cnt) AS BIGINT) AS sxx
       FROM hd GROUP BY 1, 2),
j AS (SELECT epoch_day, hour, cnt,
             (n - 1) * cnt - (sx - cnt) AS dev,
             (n - 1) * (sxx - cnt * cnt) - (sx - cnt) * (sx - cnt) AS varn
      FROM hd JOIN sl USING (dow, hour) WHERE n >= 3),
r AS (SELECT epoch_day, hour, cnt, dev, varn,
             round(abs(dev) / sqrt(varn) + 1e-9, 6) AS az
      FROM j WHERE varn > 0)
SELECT epoch_day, hour, cnt, round(dev / sqrt(varn) + 1e-9, 4) AS z
FROM (SELECT * FROM r ORDER BY az DESC, epoch_day, hour LIMIT 20) t"""),
    "Top-20 seasonality-adjusted hourly anomalies (leave-one-out z vs the slot's own baseline).")

  // Lag-1..7 autocorrelation of the daily event-count series — the
  // seasonality probe behind a7/a18 (a strong lag-7 peak = weekly cycle).
  // Integer-exact construction: both engines reduce the pairs to the six
  // BIGINT Pearson sums (n, Σx, Σy, Σxy, Σx², Σy²) and combine them in
  // ONE shared double expression, so the correlation is bit-identical
  // cross-engine (no engine-internal corr() with its own summation
  // order). At 100 TB: the daily rollup is the only corpus-wide shuffle;
  // the lagged self-join runs on the ~O(days) rollup, which stays tiny
  // forever. The lag fan-out is an in-scan explode, not a join.
  private val a19Autocorr = GQuery(
    "a19_autocorr",
    (s, dir) => {
      // NOT pinned (round-19 measurement): the daily series is consumed
      // twice (lag explode + pair join), but the duplicated subtree is
      // one cheap scan + day aggregation — an eager pin's extra
      // materialization job measured SLOWER than the re-aggregation it
      // saves (0.32 s -> 0.54 s at sf0.1), so the duplication stays.
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("x"))
      val lagged = daily
        .select(col("d").as("bd"), col("x").as("y"),
          explode(expr("sequence(1L, 7L)")).as("lag"))
        .select(expr("date_add(bd, cast(lag AS int))").as("d"),
          col("lag"), col("y"))
      daily.join(lagged, Seq("d"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .filter(col("n_pairs") * col("sxx") - col("sx") * col("sx") > 0 &&
          col("n_pairs") * col("syy") - col("sy") * col("sy") > 0)
        .select(col("lag"), col("n_pairs"),
          round((col("n_pairs").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            / sqrt((col("n_pairs").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
              * (col("n_pairs").cast("double") * col("syy").cast("double")
                - col("sy").cast("double") * col("sy").cast("double")))
            + lit(1e-9), 6).as("r"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS d, count(*) AS x
            FROM events GROUP BY 1),
l AS (SELECT d + CAST(u.lag AS INTEGER) AS d, CAST(u.lag AS BIGINT) AS lag, x AS y
      FROM daily, range(1, 8) u(lag)),
p AS (SELECT l.lag, a.x AS x, l.y AS y FROM daily a JOIN l USING (d)),
s AS (SELECT lag, count(*) AS n_pairs,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM p GROUP BY 1)
SELECT lag, n_pairs,
       round((n_pairs::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / sqrt((n_pairs::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                  * (n_pairs::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
             + 1e-9, 6) AS r
FROM s
WHERE n_pairs * sxx - sx * sx > 0 AND n_pairs * syy - sy * sy > 0"""),
    "Lag-1..7 autocorrelation of daily event counts from shared integer Pearson sums.")

  // CUSUM changepoint estimation per event type (round 13) — the classic
  // offline CUSUM chart beside a15's two-frame level shift: center each
  // daily count on the series mean, cumulate, and the day of maximum
  // |cumulative deviation| is the changepoint estimate (where the series'
  // level most decisively switched). Entirely INTEGER math: the centered
  // cumsum S_r = cum_r − r·mean is rescaled by the day count D to
  // S_r·D = cum_r·D − r·T (T = total events) — an exact bigint both
  // engines compute bit-identically, so there is no float anywhere, no
  // rounding discipline needed, and the argmax (tie → earliest day)
  // cannot flip. Scale shape: the (type, day) partial agg shrinks the
  // stream to ~types×days rows before any window; both windows run
  // per-type over that tiny frame.
  private val a20Cusum = GQuery(
    "a20_cusum_changepoint",
    (s, dir) => {
      val daily = events(s, dir)
        .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("d"))
        .groupBy(col("event_type"), col("d"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy("d")
      val tot = Window.partitionBy("event_type")
      daily
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cum",
          sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("t", sum(col("cnt")).over(tot))
        .withColumn("dcnt", count(lit(1)).over(tot))
        .withColumn("s_scaled", col("cum") * col("dcnt") - col("rn") * col("t"))
        .select(col("event_type"), col("d").as("day"), col("cnt"), col("s_scaled"),
          (row_number().over(Window.partitionBy("event_type")
            .orderBy(abs(col("s_scaled")).desc, col("d"))) === 1).as("is_changepoint"))
    },
    Some("""WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS d, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, d, cnt,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
         CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS cum,
         CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS t,
         count(*) OVER (PARTITION BY event_type) AS dcnt
  FROM daily
),
s AS (SELECT event_type, d, cnt, cum * dcnt - rn * t AS s_scaled FROM w)
SELECT event_type, d AS day, cnt, s_scaled,
       (row_number() OVER (PARTITION BY event_type ORDER BY abs(s_scaled) DESC, d) = 1) AS is_changepoint
FROM s"""),
    "Integer-exact CUSUM changepoint per event type: argmax of the rescaled centered cumsum.")

  // Last-touch attribution (round 13) — the marketing-analytics standard:
  // each purchase credits the user's latest STRICTLY-EARLIER non-purchase
  // event (the touchpoint that "closed" it); purchases with no prior
  // touchpoint credit 'none'. The per-user sequence scan is one
  // last(ignoreNulls) window over (ts, event_id)-ordered events with a
  // 1-PRECEDING frame cap — consecutive purchases therefore credit the
  // same touchpoint, and a purchase never credits itself or a later
  // event. Output is the credit report: purchases + attributed revenue
  // per touchpoint type. Determinism: the (ts, event_id) tiebreak pins
  // same-timestamp order; attributed value is a double sum whose
  // association order differs between engines (error ~1e-8 at this
  // magnitude), rounded at 4 decimals with the standing +1e-9 nudge.
  // Scale shape: one user-keyed window sort (the standard per-user
  // sequence shuffle), then a tiny partial agg to #types rows.
  private val a21LastTouch = GQuery(
    "a21_last_touch",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tsu"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
          expr("unix_micros(ts)").as("tsu"))
        .withColumn("touch",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("none")).as("touchpoint"))
        .agg(count(lit(1)).as("n_purchases"),
          round(sum(col("value")) + lit(1e-9), 4).as("attributed_value"))
    },
    Some("""WITH o AS (
  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS tsu,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
  FROM events)
SELECT coalesce(touch, 'none') AS touchpoint,
       count(*) AS n_purchases,
       round(sum(value) + 1e-9, 4) AS attributed_value
FROM o WHERE event_type = 'purchase' GROUP BY 1"""),
    "Last-touch attribution: purchases credit the latest prior non-purchase event type.")

  val all: Seq[GQuery] =
    Seq(a8Retention, a9Funnel, a10Zscore, qMode, a11Peak, a12Ewma,
      a13Transition, a14RollingDau, a15LevelShift, a16InterEventGap,
      a17MadOutliers, a18Seasonal, a19Autocorr, a20Cusum, a21LastTouch)
}
