package graft.queries

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event/time-series gate queries over the `events` table — the batch
  * twins of the Structured Streaming operators in
  * [[graft.streaming.EventStreams]] (same windowing/sessionization
  * semantics; the streaming forms add watermarks + incremental state
  * and are exercised in StreamingSpec).
  */
object EventQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir).table(n)

  def defs: Seq[QueryDef] = Seq(

    // Tumbling 1-hour window aggregation (batch twin of the streaming
    // windowed count; window() → time_bucket in the oracle)
    QueryDef("q_ev_hourly",
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .select(col("window.start").as("hour"), col("event_type"), col("n"), col("total"))
        .orderBy("hour", "event_type"),
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS hour, event_type,
             |  count(*) AS n, round(sum(value), 2) AS total
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin), bench = true),

    // Hopping (sliding) windows: 1-hour windows every 15 minutes —
    // each event lands in exactly 4 overlapping windows. The oracle
    // unrolls the hop explicitly: the k-th 15-minute-aligned window
    // start at or before the event, k = 0..3. Integer epoch-second
    // arithmetic on both sides.
    QueryDef("q_ev_sliding",
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("total"))
        .orderBy("win_start", "event_type"),
      Some("""SELECT make_timestamp((epoch_us(ts) // 900000000 - k) * 900000000) AS win_start,
             |  event_type, count(*) AS n, round(sum(value), 2) AS total
             |FROM events CROSS JOIN range(0, 4) r(k)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Sessionization (30-min inactivity gap): lag → gap flag →
    // running session counter → per-session aggregates. All-integer
    // (microsecond) time arithmetic so both engines agree exactly.
    QueryDef("q_ev_sessions",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, d, "events")
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("prev_us", lag("us", 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_us").isNull || col("us") - col("prev_us") > 1800L * 1000000L, 1L)
              .otherwise(0L))
          .withColumn("sess_id",
            sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "sess_id")
          .agg(count(lit(1)).as("n_events"),
            min("ts").as("sess_start"),
            (max("us") - min("us")).as("sess_len_us"))
          .orderBy("user_id", "sess_id")
      },
      Some("""WITH flagged AS (
             |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
             |    CASE WHEN lag(epoch_us(ts), 1) OVER w IS NULL
             |           OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > 1800 * 1000000
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, ts, us,
             |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
             |  FROM flagged)
             |SELECT user_id, sess_id, count(*) AS n_events,
             |  min(ts) AS sess_start, max(us) - min(us) AS sess_len_us
             |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin), bench = true),

    // Events → TRAINING SEQUENCES
    // ([[graft.ops.RelationalOps.sequenceAssembly]]): each session's
    // first 20 actions become one ordered event-type string — the
    // behavioral-sequence assembly a sequence model trains on. The
    // cap bounds per-group state and row size (one bot session can't
    // produce an unbounded training row); order is total via
    // (us, event_id). The full sequence string is hash-checked.
    QueryDef("q_ev_sequences",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val sess = t(s, d, "events")
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("prev_us", lag("us", 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_us").isNull || col("us") - col("prev_us") > 1800L * 1000000L, 1L)
              .otherwise(0L))
          .withColumn("sess_id",
            sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        graft.ops.RelationalOps.sequenceAssembly(sess,
            Seq(col("user_id"), col("sess_id")),
            Seq(col("us"), col("event_id")), col("event_type"), maxLen = 20)
          .orderBy("user_id", "sess_id")
      },
      Some("""WITH flagged AS (
             |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             |    CASE WHEN lag(epoch_us(ts), 1) OVER w IS NULL
             |           OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > 1800 * 1000000
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, event_id, event_type, us,
             |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
             |  FROM flagged),
             |ranked AS (
             |  SELECT user_id, sess_id, event_type, us, event_id,
             |    row_number() OVER (PARTITION BY user_id, sess_id
             |      ORDER BY us, event_id) AS rn
             |  FROM sess)
             |SELECT user_id, sess_id, count(*) AS n_tokens,
             |  string_agg(event_type, ' ' ORDER BY us, event_id) AS sequence
             |FROM ranked WHERE rn <= 20
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Per-type hourly volume TREND ([[graft.ext.CorpusStats
    // .groupTrend]]): OLS slope/intercept of events-per-hour over
    // hours-since-corpus-start. The rebase keeps every double
    // product under 2^53, so the closed-form fit is exact in both
    // engines from the same int64 sufficient statistics.
    QueryDef("q_ev_trend",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"), (unix_micros(col("ts")) / 3600000000L)
            .cast("long").as("h"))
        val h0 = broadcast(ev.agg(min("h").as("h0")))
        val hourly = ev.crossJoin(h0)
          .groupBy(col("event_type"), (col("h") - col("h0")).as("x"))
          .agg(count(lit(1)).as("y"))
        graft.ext.CorpusStats.groupTrend(hourly,
            col("event_type"), col("x"), col("y"))
          .withColumnRenamed("group", "event_type")
          .orderBy("event_type")
      },
      Some("""WITH ev AS (
             |  SELECT event_type, epoch_us(ts) // 3600000000 AS h FROM events),
             |h0 AS (SELECT min(h) AS h0 FROM ev),
             |hourly AS (
             |  SELECT event_type, h - h0 AS x, count(*) AS y
             |  FROM ev, h0 GROUP BY 1, 2),
             |a AS (
             |  SELECT event_type, count(*) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
             |  FROM hourly GROUP BY 1),
             |b AS (
             |  SELECT event_type, n,
             |    CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS num,
             |    CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS den,
             |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
             |  FROM a)
             |SELECT event_type, n,
             |  round(CASE WHEN den <> 0 THEN num / den END, 6) AS slope,
             |  round(CASE WHEN den <> 0
             |    THEN (syd - (num / den) * sxd) / CAST(n AS DOUBLE) END, 6) AS intercept
             |FROM b ORDER BY event_type""".stripMargin)),

    // First-order Markov transition matrix over user event streams:
    // (from → to) counts from a per-user lead window, with row-
    // normalized transition probabilities — the behavioral prior a
    // session model starts from. Counts are exact; probabilities are
    // exact integer ratios rounded once.
    QueryDef("q_ev_transitions",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val wFrom = Window.partitionBy("from_type")
        t(s, d, "events")
          .withColumn("next", lead("event_type", 1).over(w))
          .filter(col("next").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p", round(col("n").cast("double") /
            sum("n").over(wFrom).cast("double"), 6))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH nxt AS (
             |  SELECT event_type AS from_type,
             |    lead(event_type, 1) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |c AS (SELECT from_type, to_type, count(*) AS n FROM nxt
             |      WHERE to_type IS NOT NULL GROUP BY 1, 2)
             |SELECT from_type, to_type, n,
             |  round(n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
             |FROM c ORDER BY from_type, to_type""".stripMargin)),

    // Backward as-of join: each purchase picks up the user's latest
    // click at-or-before it (right side pre-aggregated to unique
    // (user, ts) so ties are deterministic on both engines)
    QueryDef("q_ev_asof_join",
      (s, d) => {
        val ev = t(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value")
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy("user_id", "ts").agg(max("value").as("click_value"))
        graft.ops.AsofJoin.asofJoin(purchases, clicks,
          key = "user_id", leftTime = "ts", rightTime = "ts",
          valueCols = Seq("click_value"))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("asof_ts").as("click_ts"), col("asof_click_value").as("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH purchases AS (
             |  SELECT event_id, user_id, ts, value FROM events
             |  WHERE event_type = 'purchase'),
             |clicks AS (
             |  SELECT user_id, ts, max(value) AS click_value FROM events
             |  WHERE event_type = 'click' GROUP BY 1, 2)
             |SELECT p.event_id, p.user_id, p.ts,
             |  c.ts AS click_ts, c.click_value
             |FROM purchases p ASOF LEFT JOIN clicks c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY p.event_id""".stripMargin)),

    // Staleness-bounded as-of join (the feature-SLA variant): the
    // latest click counts only if it is at most one hour old at
    // purchase time; older matches null out exactly as if absent.
    // Same one-shuffle as-of plan — the bound is a per-row predicate
    // AFTER the pick, not a range join. DuckDB's native ASOF JOIN
    // plus the same CASE replays it.
    QueryDef("q_ev_asof_tol",
      (s, d) => {
        val ev = t(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value")
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy("user_id", "ts").agg(max("value").as("click_value"))
        graft.ops.AsofJoin.asofJoin(purchases, clicks,
          key = "user_id", leftTime = "ts", rightTime = "ts",
          valueCols = Seq("click_value"),
          within = Some((l, r) =>
            unix_micros(l) - unix_micros(r) <= 3600000000L))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("asof_ts").as("click_ts"), col("asof_click_value").as("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH purchases AS (
             |  SELECT event_id, user_id, ts, value FROM events
             |  WHERE event_type = 'purchase'),
             |clicks AS (
             |  SELECT user_id, ts, max(value) AS click_value FROM events
             |  WHERE event_type = 'click' GROUP BY 1, 2)
             |SELECT p.event_id, p.user_id, p.ts,
             |  CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
             |       THEN c.ts END AS click_ts,
             |  CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
             |       THEN c.click_value END AS click_value
             |FROM purchases p ASOF LEFT JOIN clicks c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY p.event_id""".stripMargin)),

    // Click attribution: each purchase joined to the same user's
    // clicks within the preceding hour — the BATCH run of the very
    // same interval-join builder the streaming path uses
    // (EventStreams.clickAttribution; withWatermark is a no-op on
    // batch frames), so this DuckDB hash check covers the
    // attribution semantics in both modes. StreamingSpec separately
    // asserts the incremental run emits identical rows.
    QueryDef("q_ev_attribution",
      (s, d) => {
        val ev = t(s, d, "events")
        graft.streaming.EventStreams.clickAttribution(
          clicks = ev.filter(col("event_type") === "click"),
          purchases = ev.filter(col("event_type") === "purchase"))
          .orderBy("purchase_id", "click_id")
      },
      Some("""SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.ts AS p_ts,
             |  c.event_id AS click_id, c.ts AS c_ts, p.value AS value
             |FROM events p JOIN events c
             |  ON c.user_id = p.user_id AND c.event_type = 'click'
             | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
             |WHERE p.event_type = 'purchase'
             |ORDER BY purchase_id, click_id""".stripMargin), bench = true),

    // Funnel: signup → first subsequent purchase, conversion rate and
    // mean days-to-convert (conditional temporal join + null-skipping
    // aggregates)
    QueryDef("q_ev_funnel",
      (s, d) => {
        val ev = t(s, d, "events")
        val signups = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts").as("signup_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_uid"), col("ts").as("p_ts"))
        val firstPurchase = signups
          .join(purchases,
            col("user_id") === col("p_uid") && col("p_ts") >= col("signup_ts"), "left")
          .groupBy("user_id", "signup_ts").agg(min("p_ts").as("first_p"))
        firstPurchase.agg(
          count(lit(1)).as("n_signed"),
          count(col("first_p")).as("n_converted"),
          round(avg((unix_micros(col("first_p")) - unix_micros(col("signup_ts")))
            / lit(86400000000.0)), 4).as("avg_days"),
          round(count(col("first_p")) / count(lit(1)), 4).as("conversion_rate"))
      },
      Some("""WITH s AS (
             |  SELECT user_id, min(ts) AS signup_ts FROM events
             |  WHERE event_type = 'signup' GROUP BY 1),
             |fp AS (
             |  SELECT s.user_id, s.signup_ts, min(e.ts) AS first_p
             |  FROM s LEFT JOIN events e
             |    ON e.user_id = s.user_id AND e.event_type = 'purchase'
             |   AND e.ts >= s.signup_ts
             |  GROUP BY 1, 2)
             |SELECT count(*) AS n_signed, count(first_p) AS n_converted,
             |  round(avg((epoch_us(first_p) - epoch_us(signup_ts)) / 86400000000.0), 4)
             |    AS avg_days,
             |  round(count(first_p) * 1.0 / count(*), 4) AS conversion_rate
             |FROM fp""".stripMargin)),

    // Per-type daily top spender (join of window + agg patterns on the
    // event stream's batch view)
    QueryDef("q_ev_top_users",
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("user_id"), col("event_type"))
          .agg(round(sum("value"), 2).as("total"), count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(desc("total"), col("user_id"))
        daily.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("event_type"), col("rn"), col("user_id"), col("total"), col("n"))
          .orderBy("event_type", "rn")
      },
      Some("""WITH daily AS (
             |  SELECT user_id, event_type, round(sum(value), 2) AS total, count(*) AS n
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type,
             |  row_number() OVER (PARTITION BY event_type ORDER BY total DESC, user_id) AS rn,
             |  user_id, total, n
             |FROM daily
             |QUALIFY rn <= 3
             |ORDER BY event_type, rn""".stripMargin)),

    // Gap-filled hourly series: every hour between the corpus bounds
    // appears, zero-filled when no events landed — the dense-series
    // shape downstream time-series models need (Spark expresses it
    // as sequence + explode + left join; no generator table exists).
    QueryDef("q_ev_gapfill",
      (s, d) => {
        val ev = t(s, d, "events")
        val hourly = ev.groupBy(date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("n"))
        val bounds = ev.agg(
          date_trunc("hour", min(col("ts"))).as("lo"),
          date_trunc("hour", max(col("ts"))).as("hi"))
        val spine = bounds.select(explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 1 HOUR"))).as("hour"))
        spine.join(hourly, Seq("hour"), "left")
          .select(col("hour"), coalesce(col("n"), lit(0L)).as("n"))
          .orderBy("hour")
      },
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', ts) AS hour, count(*) AS n
             |  FROM events GROUP BY 1),
             |bounds AS (
             |  SELECT date_trunc('hour', min(ts)) AS lo,
             |         date_trunc('hour', max(ts)) AS hi FROM events),
             |spine AS (
             |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
             |  FROM bounds)
             |SELECT s.hour, COALESCE(h.n, 0) AS n
             |FROM spine s LEFT JOIN hourly h USING (hour)
             |ORDER BY s.hour""".stripMargin)),

    // Cohort retention matrix: users grouped by first-activity week,
    // distinct actives per (cohort, week-offset) cell — the standard
    // product-analytics view. Both engines truncate to ISO Monday
    // weeks and difference in whole days / 7, so every cell is exact
    // integer arithmetic. Scale: one (user, week) distinct shuffle +
    // one cohort agg reusing it; the matrix itself is tiny.
    QueryDef("q_ev_retention",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("week"))
        val cohort = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
        ev.distinct().join(cohort, "user_id")
          .groupBy(col("cohort_week"),
            (datediff(col("week"), col("cohort_week")) / 7).cast("long").as("week_offset"))
          .agg(countDistinct("user_id").as("n_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
             |cohort AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id),
             |active AS (SELECT DISTINCT user_id, week FROM ev)
             |SELECT c.cohort_week,
             |  CAST(date_diff('day', c.cohort_week, a.week) // 7 AS BIGINT) AS week_offset,
             |  count(DISTINCT a.user_id) AS n_users
             |FROM active a JOIN cohort c USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // SCD type-2 history build ([[graft.ext.Scd]]): the event log as
    // a change log (key = user, tracked attr = event_type), no-op
    // updates collapsed, each version closed at its successor's
    // timestamp. Integer-µs times on both sides; ONE shuffle (both
    // windows share the key partitioning).
    QueryDef("q_scd2",
      (s, d) => {
        val log = t(s, d, "events").select(col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"))
        graft.ext.Scd.scd2(log, Seq("user_id"), "us",
            trackedCols = Seq("event_type"), tieBreak = Seq("event_id"))
          .select(col("user_id"), col("event_type").as("status"),
            col("valid_from"), col("valid_to"), col("is_current"), col("version"))
          .orderBy("user_id", "version")
      },
      Some("""WITH c AS (
             |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
             |  FROM events),
             |v AS (SELECT user_id, us, event_id, event_type FROM c
             |      WHERE prev IS NULL OR prev <> event_type)
             |SELECT user_id, event_type AS status,
             |  us AS valid_from,
             |  lead(us) OVER w AS valid_to,
             |  (lead(us) OVER w IS NULL) AS is_current,
             |  CAST(row_number() OVER w AS INT) AS version
             |FROM v WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
             |ORDER BY user_id, version""".stripMargin)),

    // Incremental SCD2 apply ([[graft.ext.Scd.scd2Apply]]): history
    // built from the log BEFORE 2024-01-15, then the later slice
    // merged as a daily-style delta batch. The contract is exact
    // equality with the full rebuild, so the oracle IS q_scd2's —
    // any divergence in version numbering, no-op collapse across the
    // batch boundary, or row closure fails the hash.
    QueryDef("q_scd2_apply",
      (s, d) => {
        val cutoff = 1705276800000000L
        val log = t(s, d, "events").select(col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"))
        val hist = graft.ext.Scd.scd2(log.filter(col("us") < cutoff),
          Seq("user_id"), "us", trackedCols = Seq("event_type"),
          tieBreak = Seq("event_id"))
        graft.ext.Scd.scd2Apply(hist, log.filter(col("us") >= cutoff),
            Seq("user_id"), "us", trackedCols = Seq("event_type"),
            tieBreak = Seq("event_id"))
          .select(col("user_id"), col("event_type").as("status"),
            col("valid_from"), col("valid_to"), col("is_current"), col("version"))
          .orderBy("user_id", "version")
      },
      Some("""WITH c AS (
             |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
             |  FROM events),
             |v AS (SELECT user_id, us, event_id, event_type FROM c
             |      WHERE prev IS NULL OR prev <> event_type)
             |SELECT user_id, event_type AS status,
             |  us AS valid_from,
             |  lead(us) OVER w AS valid_to,
             |  (lead(us) OVER w IS NULL) AS is_current,
             |  CAST(row_number() OVER w AS INT) AS version
             |FROM v WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
             |ORDER BY user_id, version""".stripMargin),
      bench = true),

    // Point-in-time snapshot of the SCD2 history (mid-log instant):
    // the one open version per user at 2024-01-15T00:00:00Z,
    // aggregated to a status census. The filter is per-row — at
    // 100 TB the history table partitioned on valid_from prunes
    // closed-history files before the scan.
    QueryDef("q_scd2_snapshot",
      (s, d) => {
        val log = t(s, d, "events").select(col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"))
        val hist = graft.ext.Scd.scd2(log, Seq("user_id"), "us",
          trackedCols = Seq("event_type"), tieBreak = Seq("event_id"))
        graft.ext.Scd.snapshotAt(hist, lit(1705276800000000L))
          .groupBy(col("event_type").as("status"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy("status")
      },
      Some("""WITH c AS (
             |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
             |  FROM events),
             |v AS (SELECT user_id, us, event_id, event_type FROM c
             |      WHERE prev IS NULL OR prev <> event_type),
             |h AS (SELECT user_id, event_type, us AS valid_from,
             |        lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to
             |      FROM v)
             |SELECT event_type AS status, count(*) AS n_users
             |FROM h
             |WHERE valid_from <= 1705276800000000
             |  AND (valid_to IS NULL OR valid_to > 1705276800000000)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Point-in-time enrichment ([[graft.ext.Scd.pointInTimeLookup]]):
    // every event looked up against the SCD2 status that was active
    // AT ITS OWN TIMESTAMP — the leakage-free feature join, reduced
    // to one as-of pass (union + key-partitioned window) instead of
    // the BETWEEN range join the oracle spells out. The census over
    // (as-of status, event type) hash-checks every match, including
    // same-instant churn where only the zero-width survivor counts.
    QueryDef("q_scd2_lookup",
      (s, d) => {
        val ev = t(s, d, "events")
        val log = ev.select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("event_type"))
        val hist = graft.ext.Scd.scd2(log, Seq("user_id"), "us",
            trackedCols = Seq("event_type"), tieBreak = Seq("event_id"))
          .select(col("user_id"), col("event_type").as("status"),
            col("valid_from"), col("version"))
        val facts = ev.select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_type"), col("value"))
        graft.ext.Scd.pointInTimeLookup(facts, hist, "user_id", "us", Seq("status"))
          .select(col("asof_status").as("status"), col("event_type"), col("value"))
          .groupBy("status", "event_type")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
          .orderBy("status", "event_type")
      },
      Some("""WITH c AS (
             |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
             |  FROM events),
             |v AS (SELECT user_id, us, event_id, event_type FROM c
             |      WHERE prev IS NULL OR prev <> event_type),
             |h AS (SELECT user_id, event_type AS status, us AS valid_from,
             |        lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to
             |      FROM v),
             |f AS (SELECT user_id, epoch_us(ts) AS us, event_type, value FROM events)
             |SELECT h.status, f.event_type, count(*) AS n,
             |       round(sum(f.value), 2) AS total
             |FROM f JOIN h ON f.user_id = h.user_id
             |  AND h.valid_from <= f.us AND (h.valid_to IS NULL OR f.us < h.valid_to)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      bench = true),

    // CDC snapshot diff ([[graft.ext.Scd.snapshotDiff]]): two
    // date-sliced lineitem states (new side carries a simulated
    // quantity correction on returned rows), full-outer joined on the
    // compound key and classified added/removed/changed; the
    // unchanged majority never leaves the join. Gate reports the
    // per-class census so the whole diff is hash-checked.
    QueryDef("q_cdc_diff",
      (s, d) => {
        val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_quantity"), col("l_shipdate"))
        val oldS = li.filter(col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        val newS = li.filter(col("l_shipdate") >= lit("1996-06-01").cast("timestamp"))
          .withColumn("l_quantity", when(col("l_returnflag") === "R",
            col("l_quantity") + 1).otherwise(col("l_quantity")))
        graft.ext.Scd.snapshotDiff(oldS, newS, Seq("l_orderkey", "l_linenumber"),
            trackedCols = Seq("l_returnflag", "l_quantity"))
          .groupBy("change_type")
          .agg(count(lit(1)).as("n"),
            round(sum(coalesce(col("new_vals.l_quantity"),
              col("old_vals.l_quantity"))), 2).as("qty"))
          .orderBy("change_type")
      },
      Some("""WITH old_s AS (
             |  SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
             |  FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01'),
             |new_s AS (
             |  SELECT l_orderkey, l_linenumber, l_returnflag,
             |    CASE WHEN l_returnflag = 'R' THEN l_quantity + 1
             |         ELSE l_quantity END AS l_quantity
             |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-06-01'),
             |diff AS (
             |  SELECT CASE WHEN o.l_orderkey IS NULL THEN 'added'
             |              WHEN n.l_orderkey IS NULL THEN 'removed'
             |              WHEN o.l_returnflag <> n.l_returnflag
             |                OR o.l_quantity <> n.l_quantity THEN 'changed'
             |         END AS change_type,
             |         COALESCE(n.l_quantity, o.l_quantity) AS q
             |  FROM old_s o FULL OUTER JOIN new_s n USING (l_orderkey, l_linenumber))
             |SELECT change_type, count(*) AS n, round(sum(q), 2) AS qty
             |FROM diff WHERE change_type IS NOT NULL
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Hourly anomaly detection: per-type z-scores of hourly event
    // counts, outliers beyond 2 sigma. The variance comes from EXACT
    // integer sums (sum n, sum n^2 per type) rather than a stddev
    // aggregate, so aggregation order can never move the reported
    // z-score — both engines then evaluate the identical double
    // expression tree (IEEE-deterministic). Per-type stats are a tiny
    // broadcast; the hourly frame shuffles once.
    QueryDef("q_ev_anomaly",
      (s, d) => {
        val hourly = t(s, d, "events")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("hour"), col("event_type"), col("n"))
        val stats = hourly.groupBy("event_type").agg(
          count(lit(1)).as("c"), sum("n").as("s1"),
          sum(col("n") * col("n")).as("s2"))
        val mean = col("s1").cast("double") / col("c")
        val variance = col("s2").cast("double") / col("c") - mean * mean
        hourly.join(broadcast(stats), "event_type")
          .withColumn("z", round((col("n") - mean) / sqrt(variance), 6))
          .filter(variance > 0 && abs(col("z")) > 2)
          .select(col("event_type"), col("hour"), col("n"), col("z"))
          .orderBy("event_type", "hour")
      },
      Some("""WITH hourly AS (
             |  SELECT time_bucket(INTERVAL '1 hour', ts) AS hour, event_type,
             |         count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |stats AS (
             |  SELECT event_type, count(*) AS c,
             |         CAST(sum(n) AS BIGINT) AS s1, CAST(sum(n*n) AS BIGINT) AS s2
             |  FROM hourly GROUP BY 1)
             |SELECT event_type, hour, n,
             |  round((n - s1*1.0/c) / sqrt(s2*1.0/c - (s1*1.0/c)*(s1*1.0/c)), 6) AS z
             |FROM hourly JOIN stats USING (event_type)
             |WHERE s2*1.0/c - (s1*1.0/c)*(s1*1.0/c) > 0
             |  AND abs((n - s1*1.0/c) / sqrt(s2*1.0/c - (s1*1.0/c)*(s1*1.0/c))) > 2
             |ORDER BY event_type, hour""".stripMargin)),

    // Per-user churn/inactivity report: days since each user's last
    // event, measured against the corpus horizon (global max ts), and
    // a churned flag at the 7-day threshold — the user-lifecycle
    // rollup behind retention dashboards and re-engagement cohorts.
    // All-integer microsecond arithmetic (`div` / `//` floor division
    // on non-negative longs) so both engines agree exactly. Scale
    // shape: ONE shuffle (groupBy user_id); the horizon is a 1-row
    // aggregate over the already-grouped per-user frame (the groupBy
    // exchange is reused — max(last_us) == max(ts) over events), so
    // the events table is scanned exactly once. The state/report
    // split is shared with the streaming maintenance loop
    // ([[graft.streaming.EventStreams.churnMerge]]), whose per-batch
    // output ChurnSpec pins equal to this rollup.
    QueryDef("q_ev_churn",
      (s, d) => {
        import graft.streaming.EventStreams
        EventStreams.churnReport(EventStreams.churnState(t(s, d, "events")))
          .orderBy("user_id")
      },
      Some("""WITH per_user AS (
             |  SELECT user_id, max(ts) AS last_seen, count(*) AS n_events,
             |         max(epoch_us(ts)) AS last_us
             |  FROM events GROUP BY 1),
             |horizon AS (SELECT max(last_us) AS horizon_us FROM per_user)
             |SELECT user_id, last_seen, n_events,
             |  CAST((horizon_us - last_us) // 86400000000 AS BIGINT) AS days_inactive,
             |  (horizon_us - last_us) // 86400000000 >= 7 AS churned
             |FROM per_user CROSS JOIN horizon
             |ORDER BY user_id""".stripMargin), bench = true),
  )
}
