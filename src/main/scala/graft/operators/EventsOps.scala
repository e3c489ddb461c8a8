package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.Column
import graft.QueryDef
import graft.sources.Tables._

/** Event-stream (batch) operators: interval/theta join, as-of join,
  * sessionization, tumbling window, pivot. The reference is batch-only
  * with no time semantics at all (SURVEY.md §2.2 — streaming absent).
  *
  * `events.ts` is stored as parquet ns; both engines are normalized to
  * microseconds (Spark truncates on read, the oracle casts TIMESTAMP_NS ->
  * TIMESTAMP) so time comparisons agree exactly.
  */
object EventsOps {

  private def dec(c: Column): Column = c.cast(DecimalType(38, 10))

  val defs: Seq[QueryDef] = Seq(

    // Longest same-type streak per user — the engagement analytic
    // (consecutive-action runs) and the window-function shape behind
    // gaps-and-islands: change flags from ONE per-user lag window, run
    // ids from the running sum over the same partitioning (the two
    // windows share one exchange), runs collapsed by a partial-agg
    // groupBy, and the per-user argmax by a rank window with the full
    // (len DESC, runid ASC) tie-break — earliest longest streak wins,
    // deterministically. Per-user state is the user's own stream;
    // nothing global anywhere.
    QueryDef(
      "q_events_streaks",
      """WITH o AS (
        |  SELECT user_id, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
        |              IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_type,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY event_id) AS runid
        |  FROM o),
        |runs AS (SELECT user_id, runid, event_type, count(*)::BIGINT AS len
        |         FROM r GROUP BY 1, 2, 3),
        |best AS (SELECT user_id, event_type AS streak_type, len AS streak_len,
        |  row_number() OVER (PARTITION BY user_id ORDER BY len DESC, runid ASC) AS rn
        |  FROM runs)
        |SELECT user_id, streak_type, streak_len FROM best WHERE rn = 1
        |""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val runs = events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          when(lag(col("event_type"), 1).over(w) <=> col("event_type"), 0L)
            .otherwise(1L).as("chg"))
        .select(col("user_id"), col("event_type"),
          sum("chg").over(wRun).as("runid"))
        .groupBy("user_id", "runid", "event_type")
        .agg(count(lit(1)).as("len"))
      val rnk = row_number().over(Window.partitionBy("user_id")
        .orderBy(col("len").desc, col("runid").asc))
      runs.withColumn("rn", rnk).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("streak_type"),
          col("len").as("streak_len"))
    },

    // Theta/interval self-join: pairs of events of the same user within
    // 5 minutes. The equi component (user_id) keys the shuffle; the range
    // predicate filters inside each key group — no cross product across keys.
    QueryDef(
      "q_join_interval",
      """SELECT a.event_id AS a_id, b.event_id AS b_id,
        |  a.event_type AS a_type, b.event_type AS b_type
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND CAST(b.ts AS TIMESTAMP) > CAST(a.ts AS TIMESTAMP)
        | AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 5 MINUTE
        |""".stripMargin) { (s, d) =>
      val a = events(s, d).select(col("event_id").as("a_id"), col("user_id"),
        col("ts").as("a_ts"), col("event_type").as("a_type"))
      val b = events(s, d).select(col("event_id").as("b_id"),
        col("user_id").as("b_user_id"), col("ts").as("b_ts"), col("event_type").as("b_type"))
      a.join(b,
          col("user_id") === col("b_user_id")
            && col("b_ts") > col("a_ts")
            && col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES"))
        .select("a_id", "b_id", "a_type", "b_type")
    },

    // Range join WITHOUT any natural equi key: the cross-user temporal
    // co-occurrence matrix — pairs of events (any users) where b follows
    // a within 60 s, counted per (a_type, b_type). A bare range predicate
    // is a nested-loop cross product in any engine; the scalable shape
    // MANUFACTURES the equi key: b keys by its 60 s time bucket, a probes
    // its own bucket AND the next (the two buckets that can contain a
    // successor within 60 s), so the join is a plain bucket equi-join and
    // each (a, b) pair arises exactly once (b's bucket is unique). At
    // 100 TB candidates are bounded by events-per-bucket density, the
    // shuffle keys on the bucket, and AQE splits any hot bucket. The
    // oracle states the naive range join — same result, quadratic plan it
    // can afford at sf0.01; RelationalSpec pins bucketed == naive.
    QueryDef(
      "q_join_range_bucket",
      """WITH e AS (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type FROM events)
        |SELECT a.event_type AS a_type, b.event_type AS b_type,
        |  count(*)::BIGINT AS n_pairs
        |FROM e a JOIN e b ON b.us > a.us AND b.us <= a.us + 60000000
        |GROUP BY 1, 2
        |""".stripMargin) { (s, d) =>
      val e = events(s, d).select(col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      val probe = e.select(col("us").as("a_us"), col("event_type").as("a_type"),
        explode(array(expr("us div 60000000"), expr("us div 60000000") + 1))
          .as("bkt"))
      val build = e.select(col("us").as("b_us"), col("event_type").as("b_type"),
        expr("us div 60000000").as("bkt"))
      probe.join(build, Seq("bkt"))
        .filter(col("b_us") > col("a_us") &&
          col("b_us") <= col("a_us") + 60000000L)
        .groupBy("a_type", "b_type").agg(count(lit(1)).as("n_pairs"))
    },

    // As-of join: each purchase matched to the user's most recent click at
    // or before it. See AsOfJoin for the scalable union+window plan; the
    // oracle states the same semantics as a rank-1 range join.
    QueryDef(
      "q_join_asof",
      """SELECT p_id, click_id FROM (
        |  SELECT p.event_id AS p_id, c.event_id AS click_id,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY c.ts DESC, c.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON c.user_id = p.user_id AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        |) t WHERE rn = 1
        |""".stripMargin) { (s, d) =>
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("key"), col("ts"), col("event_id").as("left_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("key"), col("ts"), col("event_id").as("right_id"))
      AsOfJoin.asOf(purchases, clicks)
        .select(col("left_id").as("p_id"), col("asof_id").as("click_id"))
    },

    // Forward as-of: the FIRST click at-or-after each purchase (the
    // attribution mirror image). Same union+window plan, descending sort.
    QueryDef(
      "q_join_asof_fwd",
      """SELECT p_id, click_id FROM (
        |  SELECT p.event_id AS p_id, c.event_id AS click_id,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY c.ts ASC, c.event_id ASC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON c.user_id = p.user_id AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP)
        |) t WHERE rn = 1
        |""".stripMargin) { (s, d) =>
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("key"), col("ts"), col("event_id").as("left_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("key"), col("ts"), col("event_id").as("right_id"))
      AsOfJoin.asOfForward(purchases, clicks)
        .select(col("left_id").as("p_id"), col("asof_id").as("click_id"))
    },

    // Nearest as-of: the click closest in time to each purchase, either
    // direction, ties backward — one exchange, two in-partition sorts.
    QueryDef(
      "q_join_asof_near",
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'click'),
        |b AS (SELECT p_id, click_id AS b_id, c_us AS b_us FROM (
        |  SELECT p.event_id AS p_id, c.event_id AS click_id, epoch_us(c.ts) AS c_us,
        |    row_number() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC) AS rn
        |  FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts) t WHERE rn = 1),
        |f AS (SELECT p_id, click_id AS f_id, c_us AS f_us FROM (
        |  SELECT p.event_id AS p_id, c.event_id AS click_id, epoch_us(c.ts) AS c_us,
        |    row_number() OVER (PARTITION BY p.event_id ORDER BY c.ts ASC, c.event_id ASC) AS rn
        |  FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts >= p.ts) t WHERE rn = 1)
        |SELECT p.event_id AS p_id,
        |  CASE WHEN b_id IS NULL THEN f_id
        |       WHEN f_id IS NULL THEN b_id
        |       WHEN epoch_us(p.ts) - b_us <= f_us - epoch_us(p.ts) THEN b_id
        |       ELSE f_id END AS click_id
        |FROM p JOIN b ON b.p_id = p.event_id JOIN f ON f.p_id = p.event_id
        |""".stripMargin) { (s, d) =>
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("key"), col("ts"), col("event_id").as("left_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("key"), col("ts"), col("event_id").as("right_id"))
      AsOfJoin.asOfNearest(purchases, clicks)
        .select(col("left_id").as("p_id"), col("asof_id").as("click_id"))
    },

    // Sessionization: a new session starts after >30 min of inactivity.
    // lag + running sum = one shuffle on user_id; the same formulation runs
    // verbatim at 100 TB (state never leaves the key's partition).
    QueryDef(
      "q_events_sessionize",
      """SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events, min(ts2) AS session_start
        |FROM (
        |  SELECT user_id, event_id, ts2,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts2 ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM (
        |    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts2,
        |      CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER
        |          (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) IS NULL
        |        OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER
        |          (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)
        |            > INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS is_new
        |    FROM events) a) b
        |GROUP BY user_id, session_id
        |""".stripMargin) { (s, d) =>
      val wOrd = Window.partitionBy("user_id").orderBy(col("ts2").asc, col("event_id").asc)
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .select(col("user_id"), col("event_id"), col("ts").as("ts2"))
        .withColumn("prev_ts", lag(col("ts2"), 1).over(wOrd))
        .withColumn("is_new",
          when(col("prev_ts").isNull
            || unix_micros(col("ts2")) - unix_micros(col("prev_ts")) > 1800000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("is_new")).over(wRun))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), min(col("ts2")).as("session_start"))
    },

    // Tumbling 1-hour window aggregate (batch twin of the streaming demo).
    QueryDef(
      "q_events_tumbling",
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
        |  count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(38,10))), 4) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2
        |""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), graft.Exact.decOut(sum(dec(col("value")))).as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value"))
    },

    // Per-hour P50/P95 value bands per event type — the observability
    // query every latency dashboard runs, and the grouped-time twin of
    // q_agg_quantile_rank: discrete (type-1) rank selection inside each
    // (event_type, hour) cell keeps every quantity integer-exact (the
    // VALUE at a fixed rank is permutation-invariant among ties, so no
    // tie-break is needed), and the window is partitioned by the cell —
    // state never exceeds one hour of one type. Group sizes ride a
    // broadcast pre-aggregate instead of a second window pass.
    QueryDef(
      "q_events_latency_bands",
      """WITH v AS (
        |  SELECT event_type,
        |    epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) // 3600000000 AS hr,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT event_type, hr, cents,
        |    row_number() OVER (PARTITION BY event_type, hr ORDER BY cents) AS rn,
        |    count(*) OVER (PARTITION BY event_type, hr) AS n
        |  FROM v)
        |SELECT event_type, hr, CAST(max(n) AS BIGINT) AS n,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS p50_cents,
        |  max(CASE WHEN rn = (19 * n + 19) // 20 THEN cents END) AS p95_cents
        |FROM r GROUP BY 1, 2
        |""".stripMargin) { (s, d) =>
      val v = events(s, d).select(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hr"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val sizes = v.groupBy("event_type", "hr").agg(count(lit(1)).as("n"))
      v.join(broadcast(sizes), Seq("event_type", "hr"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type", "hr").orderBy(col("cents"))))
        .groupBy("event_type", "hr")
        .agg(max(col("n")).as("n"),
          max(when(col("rn") === expr("(n + 1) div 2"), col("cents")))
            .as("p50_cents"),
          max(when(col("rn") === expr("(19 * n + 19) div 20"), col("cents")))
            .as("p95_cents"))
    },

    // Lagged autocorrelation of the hourly event-count series — the
    // periodicity diagnostic (is traffic self-similar hour over hour?)
    // beside EWMA's smoothing and drift's distribution shift. The
    // series is the tumbling hourly count per event_type (integer by
    // construction); for lags 1..3 the Pearson ACF's sufficient
    // statistics fold as exact BIGINTs over the lag self-join pairs
    // (observed-pairs convention: a gap hour simply contributes no
    // term, stated identically in both engines), and the final
    // r = num / (sqrt(den_x) * sqrt(den_y)) uses only IEEE-exact
    // operations on integers below 2^53 — bit-identical doubles, the
    // EWMA precedent. The exact integer pieces ride the output beside
    // r, so a consumer can re-derive or re-scale without trusting
    // float paths.
    //
    // Scale shape: the series aggregate is the tumbling plan (one
    // map-side-combined shuffle on (hour, type)); the lag join is an
    // equi join of the HOURS-sized series with itself — at 100 TB the
    // series is still |hours| x |types| rows, broadcastable, and the
    // events table is read once.
    QueryDef(
      "q_events_autocorr",
      """WITH s AS MATERIALIZED (
        |  SELECT event_type,
        |    epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) // 3600000000 AS hr,
        |    count(*)::BIGINT AS y
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type, l.lag, a.y AS x, b.y AS y
        |  FROM s a
        |  JOIN (SELECT CAST(u.lag AS BIGINT) AS lag FROM UNNEST([1, 2, 3]) u(lag)) l ON true
        |  JOIN s b ON b.event_type = a.event_type AND b.hr = a.hr + l.lag),
        |m AS (
        |  SELECT event_type, lag, count(*)::BIGINT AS n_terms,
        |    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
        |    sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
        |    sum(y * y)::BIGINT AS syy
        |  FROM p GROUP BY 1, 2)
        |SELECT event_type, lag, n_terms,
        |  n_terms * sxy - sx * sy AS num,
        |  n_terms * sxx - sx * sx AS den_x,
        |  n_terms * syy - sy * sy AS den_y,
        |  CASE WHEN n_terms * sxx - sx * sx = 0
        |         OR n_terms * syy - sy * sy = 0 THEN NULL
        |    ELSE CAST(n_terms * sxy - sx * sy AS DOUBLE)
        |      / (sqrt(CAST(n_terms * sxx - sx * sx AS DOUBLE))
        |         * sqrt(CAST(n_terms * syy - sy * sy AS DOUBLE))) END AS acf
        |FROM m
        |""".stripMargin) { (s, d) =>
      val series = events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hr"))
        .agg(count(lit(1)).as("y"))
        .localCheckpoint() // both sides of the lag self-join
      val lags = series.sparkSession.range(1, 4).select(col("id").as("lag"))
      val pairs = series.select(col("event_type"), col("hr"), col("y").as("x"))
        .crossJoin(broadcast(lags))
        .join(series.select(col("event_type").as("et2"), col("hr").as("hr2"),
            col("y")),
          col("et2") === col("event_type") && col("hr2") === col("hr") + col("lag"))
      pairs.groupBy("event_type", "lag")
        .agg(count(lit(1)).as("n_terms"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("event_type"), col("lag"), col("n_terms"),
          (col("n_terms") * col("sxy") - col("sx") * col("sy")).as("num"),
          (col("n_terms") * col("sxx") - col("sx") * col("sx")).as("den_x"),
          (col("n_terms") * col("syy") - col("sy") * col("sy")).as("den_y"),
          // A constant series over a lag makes den 0 → NaN/±Inf, whose
          // textual renderings differ cross-engine; both sides emit
          // NULL for the degenerate case instead.
          when(col("n_terms") * col("sxx") - col("sx") * col("sx") === 0 ||
              col("n_terms") * col("syy") - col("sy") * col("sy") === 0,
            lit(null).cast("double"))
            .otherwise(
              (col("n_terms") * col("sxy") - col("sx") * col("sy"))
                .cast("double")
              / (sqrt((col("n_terms") * col("sxx") - col("sx") * col("sx"))
                  .cast("double"))
                * sqrt((col("n_terms") * col("syy") - col("sy") * col("sy"))
                  .cast("double")))).as("acf"))
    },

    // CUSUM change-point localization on the hourly event-count series —
    // the mean-shift detector beside autocorr's periodicity and drift's
    // snapshot distance: WHEN did a series change level, not just that
    // it did. The fixtures are level (no natural shift), so the query
    // follows the inject-then-detect precedent (q_quality_anomaly): the
    // 'error' series gains a sustained +40/hour over its last third
    // (cut = lo + 2*(hi-lo)/3 from the series' own hour bounds, a 1-row
    // broadcast), the other four types are untouched no-shift controls.
    // The statistic is the scaled CUSUM SS_t = n*prefix_t - t*total —
    // pure BIGINT (no mean division), so argmax location, magnitude and
    // the n^2-scaled fence all replay bit-exact. A sustained shift of
    // height b over the last fraction f peaks at |SS| ~ b*f*(1-f)*n^2
    // (~8.9 n^2 here) while a Poisson-noise bridge peaks near
    // 0.6*sqrt(lambda*n)*n — the 3*n^2 fence separates them at any sf.
    //
    // Scale shape: one map-side-combined shuffle on (type, hour); both
    // windows run over the AGGREGATED series (|hours| x |types| rows —
    // time-bounded, not data-bounded), never over base events. The
    // argmax is the rank-1 row of the same series pass.
    QueryDef(
      "q_events_changepoint",
      """WITH s AS MATERIALIZED (
        |  SELECT event_type,
        |    epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) // 3600000000 AS hr,
        |    count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM s),
        |obs AS (
        |  SELECT event_type, hr,
        |    c + CASE WHEN event_type = 'error'
        |          AND hr >= lo + (2 * (hi - lo)) // 3 THEN 40 ELSE 0 END AS y
        |  FROM s, b),
        |r AS (
        |  SELECT event_type, hr,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hr ASC) AS t,
        |    CAST(sum(y) OVER (PARTITION BY event_type ORDER BY hr ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pre,
        |    count(*) OVER (PARTITION BY event_type) AS n,
        |    CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS tot
        |  FROM obs),
        |top AS (
        |  SELECT event_type, hr AS cp_hr, t AS cp_t, n AS n_hours, tot AS total,
        |    abs(n * pre - t * tot) AS max_abs_ss,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs(n * pre - t * tot) DESC, hr ASC) AS rk
        |  FROM r)
        |SELECT event_type, cp_hr, cp_t, n_hours, total, max_abs_ss,
        |  max_abs_ss > 3 * n_hours * n_hours AS shifted
        |FROM top WHERE rk = 1
        |""".stripMargin) { (s, d) =>
      val series = events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hr"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // bounds + both window passes from one aggregate
      val bounds = series.agg(min("hr").as("lo"), max("hr").as("hi"))
      val obs = series.crossJoin(broadcast(bounds))
        .select(col("event_type"), col("hr"),
          (col("c") + when(col("event_type") === "error"
              && col("hr") >= col("lo") + expr("(2 * (hi - lo)) div 3"), 40L)
            .otherwise(0L)).as("y"))
      val byHr = Window.partitionBy("event_type").orderBy(col("hr").asc)
      val whole = Window.partitionBy("event_type")
      val r = obs.select(col("event_type"), col("hr"),
        row_number().over(byHr).cast("long").as("t"),
        sum("y").over(byHr.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("pre"),
        count(lit(1)).over(whole).as("n"),
        sum("y").over(whole).as("tot"))
      r.select(col("event_type"), col("hr").as("cp_hr"), col("t").as("cp_t"),
          col("n").as("n_hours"), col("tot").as("total"),
          abs(col("n") * col("pre") - col("t") * col("tot")).as("max_abs_ss"),
          row_number().over(Window.partitionBy("event_type")
            .orderBy(abs(col("n") * col("pre") - col("t") * col("tot")).desc,
              col("hr").asc)).as("rk"))
        .filter(col("rk") === 1).drop("rk")
        .withColumn("shifted",
          col("max_abs_ss") > lit(3L) * col("n_hours") * col("n_hours"))
    },

    // Sliding 2h window every 1h: each event lands in two overlapping
    // windows (the oracle states the same thing as an explicit 2-element
    // unnest of window starts).
    QueryDef(
      "q_events_sliding",
      """SELECT ws, event_type, count(*) AS n FROM (
        |  SELECT unnest([date_trunc('hour', CAST(ts AS TIMESTAMP)),
        |                 date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR]) AS ws,
        |    event_type
        |  FROM events) t
        |GROUP BY ws, event_type
        |""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"))
    },

    // Native session_window aggregation (the built-in twin of the manual
    // lag+running-sum sessionize): window.start = first event,
    // window.end = last event + gap. Note the boundary: an event at
    // EXACTLY gap distance starts a new session (half-open window), so
    // the oracle's split predicate is >=, not >.
    QueryDef(
      "q_events_session_window",
      """WITH base AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts2 FROM events),
        |marked AS (
        |  SELECT user_id, event_id, ts2,
        |    CASE WHEN lag(ts2) OVER w IS NULL
        |           OR ts2 - lag(ts2) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
        |  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts2 ASC, event_id ASC)),
        |sess AS (
        |  SELECT user_id, ts2,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts2 ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, min(ts2) AS session_start,
        |  max(ts2) + INTERVAL 30 MINUTE AS session_end, count(*) AS n_events
        |FROM sess GROUP BY user_id, sid
        |""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"), col("n_events"))
    },

    // Time-series gap filling: densify each user's activity to EVERY hour
    // between their first and last event, zero-filling silent hours — the
    // step before any windowed rate/trend computation. Hour ids are
    // integer epoch-micros (exact in both engines); the grid explodes
    // from per-user spans, so a user's rows stay in one task.
    QueryDef(
      "q_events_gap_fill",
      """WITH h AS (
        |  SELECT user_id,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 AS hour_us,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT user_id, min(hour_us) AS lo, max(hour_us) AS hi FROM h GROUP BY 1),
        |grid AS (
        |  SELECT user_id,
        |    unnest([lo + i * 3600000000 for i in range(0, CAST((hi - lo) // 3600000000 AS BIGINT) + 1)]) AS hour_us
        |  FROM sp)
        |SELECT g.user_id, g.hour_us, coalesce(h.n, 0) AS n
        |FROM grid g LEFT JOIN h ON h.user_id = g.user_id AND h.hour_us = g.hour_us
        |""".stripMargin) { (s, d) =>
      val hourly = events(s, d)
        .select(col("user_id"),
          (expr("unix_micros(ts) div 3600000000") * 3600000000L).as("hour_us"))
        .groupBy("user_id", "hour_us").agg(count(lit(1)).as("n"))
      val spans = hourly.groupBy("user_id")
        .agg(min("hour_us").as("lo"), max("hour_us").as("hi"))
      spans
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"), lit(3600000000L))).as("hour_us"))
        .join(hourly, Seq("user_id", "hour_us"), "left")
        .na.fill(0, Seq("n"))
    },

    // Unpivot (melt): the wide per-user counts back to long form — the
    // inverse of q_events_pivot, dropping the absent combinations.
    QueryDef(
      "q_events_unpivot",
      """SELECT user_id, event_type, count(*) AS n FROM events
        |WHERE event_type IN ('click', 'view', 'purchase', 'signup', 'error')
        |GROUP BY 1, 2
        |""".stripMargin) { (s, d) =>
      val types = Seq("click", "view", "purchase", "signup", "error")
      events(s, d)
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0, types)
        .unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "n")
        .filter(col("n") > 0)
    },

    // Pivot: event counts per user x fixed event-type set. Explicit value
    // list keeps the output schema static (required at scale — no extra
    // pass to discover distinct values) and matches the oracle's columns.
    QueryDef(
      "q_events_pivot",
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'view') AS view,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY user_id
        |""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0, Seq("click", "view", "purchase", "signup", "error"))
    },

    // Ordered funnel analysis: how far does each user get through
    // view -> click -> purchase, with steps required IN ORDER (a click
    // before the first view doesn't count)? Each step's earliest
    // position is a conditional min over the user's (ts, event_id)-ranked
    // stream, computed stage by stage — step k's min is constrained past
    // step k-1's. All three stages are partial-agg shuffles keyed on
    // user_id over the ONE checkpointed rank relation (pre-partitioned
    // by user, so the stage joins and aggregates reuse the exchange) —
    // no per-user state beyond three ints, no regex/sequence scan.
    QueryDef(
      "q_events_funnel",
      """WITH pos AS MATERIALIZED (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS pos
        |  FROM events),
        |s1 AS MATERIALIZED (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN pos END) AS p1
        |  FROM pos GROUP BY user_id),
        |s2 AS MATERIALIZED (SELECT p.user_id,
        |    min(CASE WHEN p.event_type = 'click' AND p.pos > s1.p1 THEN p.pos END) AS p2
        |  FROM pos p JOIN s1 ON s1.user_id = p.user_id GROUP BY p.user_id),
        |s3 AS (SELECT p.user_id,
        |    min(CASE WHEN p.event_type = 'purchase' AND p.pos > s2.p2 THEN p.pos END) AS p3
        |  FROM pos p JOIN s2 ON s2.user_id = p.user_id GROUP BY p.user_id)
        |SELECT s1.user_id,
        |  CASE WHEN s3.p3 IS NOT NULL THEN 3 WHEN s2.p2 IS NOT NULL THEN 2
        |       WHEN s1.p1 IS NOT NULL THEN 1 ELSE 0 END AS reached
        |FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
        |""".stripMargin) { (s, d) =>
      graft.api.Graft.funnel(events(s, d), "user_id", "event_type",
          Seq("view", "click", "purchase"),
          Seq(col("ts").asc, col("event_id").asc))
        .select(col("user").as("user_id"), col("reached"))
    },

    // Cohort retention: users bucketed by their first-activity week,
    // counted at each later week they return — the product-analytics
    // triangle. Weeks are integer epoch-µs floor-divisions from a fixed
    // origin (2024-01-01), so bucketing replays bit-exact. Two key-only
    // shuffles: distinct (user, week) activity, then the cohort lookup
    // joins on user_id before the (cohort, offset) count — user activity
    // payload never moves, and cohorts (weeks) stay low-cardinality at
    // any corpus size. offset 0 rows equal cohort sizes by construction
    // (asserted in RelationalSpec).
    QueryDef(
      "q_events_retention",
      """WITH w AS (
        |  SELECT DISTINCT user_id,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) - 1704067200000000) // 604800000000 AS week
        |  FROM events),
        |cohort AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1)
        |SELECT c.cohort_week, w.week - c.cohort_week AS offset_weeks,
        |  count(*)::BIGINT AS n_users
        |FROM w JOIN cohort c USING (user_id)
        |GROUP BY 1, 2
        |""".stripMargin) { (s, d) =>
      val w = events(s, d)
        .select(col("user_id"),
          expr("(unix_micros(ts) - 1704067200000000L) div 604800000000L")
            .as("week"))
        .distinct()
      val cohort = w.groupBy("user_id").agg(min("week").as("cohort_week"))
      w.join(cohort, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("offset_weeks"))
        .agg(count(lit(1)).as("n_users"))
    },

    // Last-touch attribution: every purchase credited to the user's most
    // recent click within a 7-day lookback — the marketing-attribution
    // pipeline stage, composed from the as-of kernel. The as-of match is
    // the unconstrained latest click (one union+window pass, no range
    // blow-up); the lookback then NULLs out-of-window credits, which is
    // equivalent to constraining the join (the latest click being stale
    // implies every older one is too). Latency is exact integer
    // microseconds (unix_micros both sides), and ties at the same ts
    // credit the largest click id in BOTH engines.
    QueryDef(
      "q_events_attribution",
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, ts FROM events
        |      WHERE event_type = 'click'),
        |j AS (
        |  SELECT p.purchase_id, p.user_id, c.click_id,
        |    epoch_us(p.ts) - epoch_us(c.ts) AS us_since,
        |    row_number() OVER (PARTITION BY p.purchase_id
        |      ORDER BY c.ts DESC, c.click_id DESC) AS rn
        |  FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
        |    AND c.ts >= p.ts - INTERVAL 7 DAY)
        |SELECT purchase_id, user_id, click_id, us_since
        |FROM j WHERE rn = 1
        |""".stripMargin) { (s, d) =>
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("key"), col("ts"), col("event_id").as("left_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("key"), col("ts"), col("event_id").as("right_id"))
      AsOfJoin.asOf(purchases, clicks)
        .join(clicks.select(col("right_id").as("asof_id"),
          col("ts").as("click_ts")), Seq("asof_id"), "left")
        .withColumn("in_window",
          col("click_ts") >= col("ts") - expr("INTERVAL 7 DAY"))
        .select(col("left_id").as("purchase_id"), col("key").as("user_id"),
          when(col("in_window"), col("asof_id")).as("click_id"),
          when(col("in_window"),
            unix_micros(col("ts")) - unix_micros(col("click_ts")))
            .as("us_since"))
    },

    // Per-user TWAP (time-weighted average): each value weighted by how
    // long it was "current" (until the next event), divided by the
    // user's active span — the financial/telemetry staple where a
    // plain mean over-weights bursts. ALL-INTEGER accumulation: values
    // are 2-decimal by construction, so cents x integer-microsecond
    // weights sum exactly as BIGINTs (per-user history is bounded, so
    // the per-group sum stays far from overflow at any corpus size —
    // a decimal(38,10) x BIGINT product would silently widen past 38
    // digits and fall back to double summation in DuckDB, which is why
    // the cents route is the portable one); the only doubles are the
    // two final divisions, identical IEEE ops in both engines. Single-
    // event users have no span and emit NULL rather than a fake mean.
    QueryDef(
      "q_events_twap",
      """WITH w AS (
        |  SELECT user_id, CAST(round(value * 100, 0) AS BIGINT) AS cents,
        |    epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |      - epoch_us(ts) AS dur_us
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(coalesce(sum(dur_us), 0) AS BIGINT) AS span_us,
        |  CASE WHEN coalesce(sum(dur_us), 0) > 0 THEN
        |    CAST(sum(cents * dur_us) AS DOUBLE) / 100 / CAST(sum(dur_us) AS BIGINT)
        |  END AS twap
        |FROM w GROUP BY user_id
        |""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, d)
        .select(col("user_id"),
          round(col("value") * 100, 0).cast("long").as("cents"),
          (unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
            .as("dur_us"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          coalesce(sum(col("dur_us")), lit(0L)).as("span_us"),
          when(coalesce(sum(col("dur_us")), lit(0L)) > 0,
            sum(col("cents") * col("dur_us")).cast("double") / 100 /
              sum(col("dur_us")))
            .as("twap"))
    },

    // Per-user EWMA (exponentially weighted moving average, α = 0.5) of
    // event values — the order-dependent recursive analytic no window
    // frame expresses: acc ← α·x + (1−α)·acc, seeded by the first value.
    // Both engines run the IDENTICAL left fold (Spark `aggregate` with a
    // null-seed CASE == DuckDB `list_reduce`, which seeds from the first
    // element) over the IDENTICAL order (sort_array on (ts, event_id,
    // value) structs == list(value ORDER BY ts, event_id)), and α = 0.5
    // is exactly representable — so the output double is bit-identical
    // with no decimal detour. Per-user state is the user's own history
    // (the sessionize class): one shuffle on user_id, arrays bounded by
    // per-key cardinality, nothing global.
    QueryDef(
      "q_events_ewma",
      """SELECT user_id, count(*) AS n_events,
        |  list_reduce(list(value ORDER BY ts, event_id),
        |              (acc, x) -> 0.5 * acc + 0.5 * x) AS ewma_value
        |FROM events GROUP BY user_id
        |""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          expr("""aggregate(
            transform(
              array_sort(collect_list(struct(ts, event_id, value))),
              e -> e.value),
            cast(null as double),
            (acc, x) -> CASE WHEN acc IS NULL THEN x
                             ELSE 0.5 * acc + 0.5 * x END)""")
            .as("ewma_value"))
    }
  )
}
