package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal
import graft.operators.{AsOfJoin, Funnels}
import graft.streaming.{EventStreams, StatefulOps}

/** Beyond-reference extensions (SURVEY §2.12 + BASELINE north star):
  * Structured Streaming windows over `events`, as-of join, batch session
  * windows, multimodal binary-column plumbing. */
object ExtensionQueries {

  val defs: Seq[Q] = Seq(

    // As-of join: each purchase ← latest click at-or-before it per user.
    // Spark: union + one window pass per key (AsOfJoin.leftAsOf);
    // oracle: DuckDB's native ASOF LEFT JOIN.
    Q("q_asof_join", Some(
      """SELECT p.event_id, p.user_id, c.ts AS click_ts, c.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val ev = Tables.T(s, dir).events
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts".as("click_ts"), $"value".as("click_value"))
      AsOfJoin.leftAsOf(purchases, clicks,
          key = "user_id", leftTime = "ts", rightTime = "click_ts",
          valueCols = Seq("click_ts", "click_value"))
        .select($"event_id", $"user_id", $"click_ts", $"click_value")
        .orderBy("event_id")
    },

    // Structured Streaming tumbling windows (complete mode, memory sink,
    // driven to completion against the static file source).
    Q("q_stream_tumbling", Some(
      """SELECT date_trunc('hour', ts) AS w_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val agg = EventStreams.tumblingCounts(
          EventStreams.readEvents(s, dir), "1 hour")
        EventStreams.runToCompletion(s, agg, "graft_stream_tumbling")
          .select($"w_start".cast("timestamp").as("w_start"),
            $"event_type", $"n", $"total")
          .orderBy("w_start", "event_type")
    },

    // Sliding windows (1 h window, 15 min slide): every event counted in
    // 4 overlapping windows; oracle expands via generate_series.
    Q("q_stream_sliding", Some(
      """SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE
        |    AS w_start,
        |  count(*) AS n
        |FROM events, generate_series(0, 3) g(k)
        |GROUP BY 1 ORDER BY w_start""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val agg = EventStreams.slidingCounts(
        EventStreams.readEvents(s, dir), "1 hour", "15 minutes")
      EventStreams.runToCompletion(s, agg, "graft_stream_sliding")
        .select($"w_start".cast("timestamp").as("w_start"), $"n")
        .orderBy("w_start")
    },

    // Streaming approximate distinct users per window: the stream keeps
    // HLL sketch state (bounded, vs exact-distinct's unbounded set —
    // count(DISTINCT) is unsupported in streaming for exactly that
    // reason); the graded columns are the batch-exact count plus each
    // engine's own approx-within-5% verdict (the q_agg_approx_distinct
    // bounded-error oracle contract — sketches differ by design).
    Q("q_stream_approx", Some(
      """WITH g AS (SELECT date_trunc('hour', ts) AS w_start,
        |    count(DISTINCT user_id) AS exact_users,
        |    approx_count_distinct(user_id) AS ap
        |  FROM events GROUP BY 1),
        |v AS (SELECT avg(abs(ap - exact_users) * 1.0 / exact_users)
        |    < 0.03 AS approx_ok FROM g)
        |SELECT w_start, exact_users, approx_ok
        |FROM g CROSS JOIN v ORDER BY w_start""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        // the verdict is the MEAN relative error over all windows
        // (< 3%): per-window HLL error at these small cardinalities is
        // legitimately >5% on occasional windows in either engine, so a
        // per-row bound would grade sketch noise, not correctness
        val agg = EventStreams.readEvents(s, dir)
          .groupBy(window($"ts", "1 hour"))
          .agg(approx_count_distinct($"user_id", 0.02).as("approx_users"))
          .select($"window.start".as("w_start"), $"approx_users")
        val streamed = EventStreams
          .runToCompletion(s, agg, "graft_stream_approx")
          .select($"w_start".cast("timestamp").as("w_start"),
            $"approx_users")
        val exact = Tables.T(s, dir).events
          .groupBy(date_trunc("hour", $"ts").as("w_start"))
          .agg(countDistinct($"user_id").as("exact_users"))
        val joined = streamed.join(exact, "w_start")
          .select($"w_start", $"exact_users",
            (abs($"approx_users" - $"exact_users") * lit(1.0) /
              $"exact_users").as("err"))
        val verdict = joined.agg((avg($"err") < 0.03).as("approx_ok"))
        joined.crossJoin(broadcast(verdict))
          .select($"w_start", $"exact_users", $"approx_ok")
          .orderBy("w_start")
    },

    // Stream-stream inner join (click → purchase conversion within 1 h,
    // per user): both sides watermarked, time-interval condition bounds
    // the join state, append mode. Oracle: the equivalent batch join.
    Q("q_stream_join", Some(
      """SELECT a.event_id AS click_id, b.event_id AS p_id, a.user_id,
        |  a.ts AS click_ts, b.ts AS p_ts, b.value
        |FROM events a JOIN events b ON a.user_id = b.user_id
        | AND a.event_type = 'click' AND b.event_type = 'purchase'
        | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |ORDER BY click_id, p_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val joined = EventStreams.clickPurchaseJoin(
        EventStreams.readEvents(s, dir), "1 HOUR")
      EventStreams.runToParquet(s, joined, "stream_join")
        .orderBy("click_id", "p_id")
    },

    // Stream-stream LEFT SEMI join (streaming EXISTS): clicks with at
    // least one purchase in the hour, emitted once — no fan-out on
    // multiple matches. Emits on first match like the inner join, so
    // the one-shot run is complete (no closed-region cutoff).
    Q("q_stream_semi", Some(
      """SELECT a.event_id AS click_id, a.user_id, a.ts AS click_ts
        |FROM events a WHERE a.event_type = 'click' AND EXISTS (
        |  SELECT 1 FROM events b WHERE b.event_type = 'purchase'
        |   AND b.user_id = a.user_id AND b.ts > a.ts
        |   AND b.ts <= a.ts + INTERVAL 1 HOUR)
        |ORDER BY click_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val joined = EventStreams.clickPurchaseSemiJoin(
        EventStreams.readEvents(s, dir), "1 HOUR")
      EventStreams.runToParquet(s, joined, "stream_semi")
        .orderBy("click_id")
    },

    // Stream-stream LEFT OUTER join: unmatched clicks surface with null
    // purchase columns — emitted only once the watermark proves no match
    // can arrive. The compare is on the CLOSED region (click_ts ≤
    // max(ts) - watermark - interval): beyond it a streaming engine
    // cannot yet have emitted nulls, so batch and stream legitimately
    // differ there. NULLS FIRST pinned on both sides.
    Q("q_stream_join_outer", Some(
      """WITH b AS (SELECT least(
        |    max(CASE WHEN event_type = 'click' THEN ts END),
        |    max(CASE WHEN event_type = 'purchase' THEN ts END))
        |  - INTERVAL 125 MINUTE AS cutoff FROM events)
        |SELECT a.event_id AS click_id, p.event_id AS p_id, a.user_id,
        |  a.ts AS click_ts, p.value
        |FROM events a LEFT JOIN events p ON a.user_id = p.user_id
        | AND p.event_type = 'purchase'
        | AND p.ts > a.ts AND p.ts <= a.ts + INTERVAL 1 HOUR
        |WHERE a.event_type = 'click' AND a.ts <= (SELECT cutoff FROM b)
        |ORDER BY click_id, p_id NULLS FIRST""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val joined = EventStreams.clickPurchaseLeftJoin(
        EventStreams.readEvents(s, dir), "1 HOUR")
      // the global watermark is min over BOTH inputs' (max ts - delay):
      // the closed region ends at the earlier side's horizon
      val cutoff = Tables.load(s, dir, "events")
        .agg((least(
          max(when($"event_type" === "click", $"ts")),
          max(when($"event_type" === "purchase", $"ts")))
          - expr("INTERVAL 125 MINUTE")).as("c"))
        .head.getTimestamp(0)
      EventStreams.runToParquet(s, joined, "stream_join_outer")
        .filter($"click_ts" <= lit(cutoff))
        .select($"click_id", $"p_id", $"user_id", $"click_ts", $"value")
        .orderBy($"click_id", $"p_id".asc_nulls_first)
    },

    // Stream-stream FULL OUTER join: both sides emit null-padded rows
    // once the watermark closes them — unmatched clicks at click_ts +
    // 1 h (no later purchase can land in the window), unmatched
    // purchases at p_ts (a matching click must precede it). The compare
    // region is therefore TWO-SIDED: matched/unmatched clicks inside
    // the click cutoff, purchase-only rows inside the (later) purchase
    // cutoff; beyond them a streaming engine cannot yet have emitted
    // nulls, so batch and stream legitimately differ.
    Q("q_stream_join_full", Some(
      """WITH b AS (SELECT least(
        |    max(CASE WHEN event_type = 'click' THEN ts END),
        |    max(CASE WHEN event_type = 'purchase' THEN ts END)) AS mx
        |  FROM events),
        |c AS (SELECT event_id AS click_id, user_id AS c_user, ts AS click_ts
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts, value
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT click_id, p_id,
        |    coalesce(c_user, p_user) AS user_id, click_ts, p_ts, value
        |  FROM c FULL JOIN p ON c_user = p_user
        |   AND p_ts > click_ts AND p_ts <= click_ts + INTERVAL 1 HOUR)
        |SELECT click_id, p_id, user_id, click_ts, p_ts, value
        |FROM j, b
        |WHERE (click_ts IS NOT NULL
        |       AND click_ts <= mx - INTERVAL 125 MINUTE)
        |   OR (click_ts IS NULL AND p_ts <= mx - INTERVAL 65 MINUTE)
        |ORDER BY click_id NULLS FIRST, p_id NULLS FIRST""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val joined = EventStreams.clickPurchaseFullJoin(
          EventStreams.readEvents(s, dir), "1 HOUR")
        val mx = Tables.load(s, dir, "events")
          .agg(least(
            max(when($"event_type" === "click", $"ts")),
            max(when($"event_type" === "purchase", $"ts"))).as("m"))
          .head.getTimestamp(0)
        val cutC = new java.sql.Timestamp(mx.getTime - 125 * 60 * 1000L)
        val cutP = new java.sql.Timestamp(mx.getTime - 65 * 60 * 1000L)
        EventStreams.runToParquet(s, joined, "stream_join_full")
          .filter(($"click_ts".isNotNull && $"click_ts" <= lit(cutC)) ||
            ($"click_ts".isNull && $"p_ts" <= lit(cutP)))
          .select($"click_id", $"p_id", $"user_id", $"click_ts", $"p_ts",
            $"value")
          .orderBy($"click_id".asc_nulls_first, $"p_id".asc_nulls_first)
    },

    // Stream-static enrichment join — THE production streaming shape:
    // the event stream joins a static dimension (customer) read fresh
    // per micro-batch; no watermark needed (the static side is not
    // stateful), aggregation in complete mode. At scale the static side
    // broadcasts per batch exactly like a batch broadcast join.
    Q("q_stream_enrich", Some(
      """SELECT c.c_mktsegment, count(*) AS n
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.event_type = 'purchase'
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        val dim = Tables.T(s, dir).customer
          .select($"c_custkey", $"c_mktsegment")
        val enriched = EventStreams.readEvents(s, dir)
          .filter($"event_type" === "purchase")
          .join(dim, $"user_id" === $"c_custkey")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n"))
        EventStreams.runToCompletion(s, enriched, "graft_stream_enrich")
          .select($"c_mktsegment", $"n")
          .orderBy("c_mktsegment")
    },

    // Streaming dedup-on-ingest: admit each (user_id, event_type) once,
    // state keyed by those columns and expired by the watermark. The
    // ingest half of the dedup kernels — the batch sweep catches
    // re-arrivals beyond the watermark horizon. Only the dedup keys are
    // projected (which row of a duplicate group arrives first is
    // partition-order-dependent; the admitted KEY SET is deterministic).
    Q("q_stream_dedup", Some(
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val deduped = EventStreams.dedupWithinWatermark(
        EventStreams.readEvents(s, dir), "1 hour",
        Seq("user_id", "event_type"))
      EventStreams.runToParquet(s, deduped, "stream_dedup")
        .select($"user_id", $"event_type")
        .orderBy("user_id", "event_type")
    },

    // Streaming sessionization via flatMapGroupsWithState + event-time
    // timeout (streaming/StatefulOps.sessionize): a session is emitted
    // when a later event closes it or when the watermark passes its
    // last-event + gap timeout; a session still open at end of input is
    // never emitted. The oracle is the session_window gaps-and-islands
    // shape QUALIFYed by exactly that emission rule (closed-by-event =
    // not the user's last session; timed-out = end older than the final
    // watermark, ms-floored like the state timeout clock).
    Q("q_stream_sessions", Some(
      """WITH m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m),
        |sess AS (
        |  SELECT user_id, sid, min(ts) AS s_start,
        |    max(ts) + INTERVAL 10 MINUTE AS s_end,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM g GROUP BY user_id, sid),
        |wm AS (SELECT CAST(epoch_ms(max(ts)) AS BIGINT) - 600000 AS wm_ms
        |       FROM events)
        |SELECT user_id, s_start, s_end, n
        |FROM sess, wm
        |QUALIFY sid < max(sid) OVER (PARTITION BY user_id)
        |     OR CAST(epoch_ms(s_end) AS BIGINT) < wm_ms
        |ORDER BY user_id, s_start""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val ev = EventStreams.readEvents(s, dir)
        .select($"user_id", $"ts").as[StatefulOps.SessionEv]
      val out = StatefulOps.sessionize(s, ev, 10).toDF
      EventStreams.runToParquet(s, out, "stream_sessions")
        .select($"user_id",
          timestamp_micros($"start_us").as("s_start"),
          timestamp_micros($"end_us").as("s_end"), $"n")
        .orderBy("user_id", "s_start")
    },

    // Session windows (10-minute gap) — Spark session_window; oracle:
    // gaps-and-islands (new session when the gap is >= the duration,
    // matching session_window's exclusive end).
    Q("q_session_window", Some(
      """WITH m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, min(ts) AS s_start,
        |  max(ts) + INTERVAL 10 MINUTE AS s_end, count(*) AS n
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, s_start""".stripMargin)) { (s, dir) =>
      import s.implicits._
      Tables.T(s, dir).events
        .groupBy(session_window($"ts", "10 minutes"), $"user_id")
        .agg(count(lit(1)).as("n"))
        .select($"user_id", $"session_window.start".as("s_start"),
          $"session_window.end".as("s_end"), $"n")
        .orderBy("user_id", "s_start")
    },

    // Time-series gap filling with linear interpolation (the
    // linear_interpolate use case, reference: utils/adt/interpolate.c +
    // date_trunc/window time-series support per SURVEY §1.4): 'error'
    // events lose their value; fill from the temporal neighbors.
    Q("q_ts_gapfill", Some(
      """WITH e AS (
        |  SELECT user_id, ts, epoch_us(ts) AS x,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |  FROM events WHERE user_id < 10),
        |n AS (
        |  SELECT user_id, ts, x, v,
        |    last_value(CASE WHEN v IS NOT NULL THEN {'x': x, 'v': v} END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p,
        |    first_value(CASE WHEN v IS NOT NULL THEN {'x': x, 'v': v} END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nx
        |  FROM e)
        |SELECT user_id, ts, v,
        |  round(CASE WHEN v IS NOT NULL THEN v
        |    WHEN p IS NULL OR nx IS NULL THEN NULL
        |    WHEN nx['x'] = p['x'] THEN p['v']
        |    ELSE p['v'] + (nx['v'] - p['v']) * (x - p['x']) / (nx['x'] - p['x'])
        |  END, 6) AS v_filled
        |FROM n ORDER BY user_id, ts""".stripMargin)) { (s, dir) =>
      import s.implicits._
      import graft.functions.PgFunctions
      val wPrev = Window.partitionBy($"user_id").orderBy($"ts")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wNext = Window.partitionBy($"user_id").orderBy($"ts")
        .rowsBetween(1, Window.unboundedFollowing)
      val e = Tables.T(s, dir).events
        .filter($"user_id" < 10)
        .select($"user_id", $"ts", unix_micros($"ts").as("x"),
          when($"event_type" === "error", lit(null)).otherwise($"value").as("v"))
      val point = when($"v".isNotNull, struct($"x", $"v"))
      e.withColumn("p", last(point, ignoreNulls = true).over(wPrev))
        .withColumn("nx", first(point, ignoreNulls = true).over(wNext))
        .select($"user_id", $"ts", $"v",
          round(
            when($"v".isNotNull, $"v")
              .when($"p".isNull || $"nx".isNull, lit(null))
              .otherwise(PgFunctions.linearInterpolate(
                $"x".cast("double"),
                $"p.x".cast("double"), $"p.v",
                $"nx.x".cast("double"), $"nx.v")), 6).as("v_filled"))
        .orderBy("user_id", "ts")
    },

    // Exponential smoothing (single-parameter EWMA, the standard BI /
    // MADlib time-series primitive): the FINAL smoothed level per user,
    // computed via the closed form s_T = Σ_{k≥2} α(1−α)^{T−k}·y_k +
    // (1−α)^{T−1}·y_1 — one window pass for (k, T) + one aggregate, no
    // sequential recurrence (GP evaluates the same form through a
    // window UDF). α = 0.5 makes every (1−α)^n an EXACT power of two,
    // so per-term products round identically in both engines; the
    // per-group sum uses split-sum discipline. Ties on ts are broken by
    // event_id for a total order.
    Q("q_ts_ewma", Some(
      s"""WITH r AS (SELECT user_id, value,
         |    row_number() OVER (PARTITION BY user_id
         |                       ORDER BY ts, event_id) AS k,
         |    count(*) OVER (PARTITION BY user_id) AS t
         |  FROM events),
         |terms AS (SELECT user_id,
         |    CASE WHEN k = 1 THEN pow(0.5, t - 1) * value
         |         ELSE 0.5 * pow(0.5, t - k) * value END AS term
         |  FROM r)
         |SELECT user_id, ${Q.oSum("term", 6)} AS ewma
         |FROM terms GROUP BY user_id ORDER BY user_id""".stripMargin)) {
      (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wAll = Window.partitionBy($"user_id")
      Tables.T(s, dir).events
        .select($"user_id", $"value",
          row_number().over(w).as("k"),
          count(lit(1)).over(wAll).as("t"))
        .select($"user_id",
          when($"k" === 1, pow(lit(0.5), $"t" - 1) * $"value")
            .otherwise(lit(0.5) * pow(lit(0.5), $"t" - $"k") * $"value")
            .as("term"))
        .groupBy("user_id").agg(Q.dsum($"term", 6).as("ewma"))
        .orderBy("user_id")
    },

    // Holt's linear-trend double exponential smoothing (Holt 1957; the
    // level+trend forecasting primitive one step up from q_ts_ewma's
    // single smoothing). The recurrence l' = αy + (1−α)(l+b),
    // b' = β(l'−l) + (1−β)b is inherently sequential WITHIN a series —
    // the honest distributed shape is parallel ACROSS series (one
    // collect_list per series key + one in-row HOF fold; per-group
    // state is the series itself, the per-entity-bounded regime, like
    // every state-space model). Each step micros-quantizes both state
    // components, so DuckDB's list_reduce replay of the identical fold
    // is bit-equal; forecast1 = l+b is a sum of micros multiples,
    // presented at round 6 (its own quantization scale).
    Q("q_ts_holt", Some {
      def q6(x: String) = s"floor(($x) * 1000000 + 0.5) / 1000000"
      val lNew = q6("0.5 * x[1] + 0.5 * (acc[1] + acc[2])")
      // accumulator is a LIST, not a struct: DuckDB's list_reduce
      // updates a struct accumulator field-by-field IN PLACE, so a
      // 'b' expression referencing acc.l reads the freshly-written
      // l' (measured divergence at step 2); list elements evaluate
      // against the pre-step state
      s"""WITH s AS (SELECT user_id,
         |    list(value ORDER BY ts, event_id) AS ys
         |  FROM events GROUP BY user_id),
         |f AS (SELECT user_id, len(ys) AS n,
         |    list_reduce(
         |      list_transform(ys, y -> [y, CAST(0 AS DOUBLE)]),
         |      (acc, x) -> [
         |        $lNew,
         |        ${q6(s"0.5 * (($lNew) - acc[1]) + 0.5 * acc[2]")}
         |      ]) AS st
         |  FROM s)
         |SELECT user_id, CAST(n AS BIGINT) AS n, st[1] AS level,
         |  st[2] AS trend, round(st[1] + st[2], 6) AS forecast1
         |FROM f ORDER BY user_id""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      def q6(x: String) = s"floor(($x) * 1000000 + 0.5) / 1000000D"
      val lNew = q6("0.5D * y + 0.5D * (acc.l + acc.b)")
      Tables.T(s, dir).events
        .groupBy($"user_id")
        .agg(sort_array(collect_list(
          struct($"ts", $"event_id", $"value"))).as("pts"))
        .select($"user_id",
          expr("transform(pts, p -> p.value)").as("ys"))
        .select($"user_id", size($"ys").cast("long").as("n"),
          expr(
            s"""aggregate(
               |  slice(ys, 2, size(ys) - 1),
               |  named_struct('l', ys[0], 'b', CAST(0 AS DOUBLE)),
               |  (acc, y) -> named_struct(
               |    'l', $lNew,
               |    'b', ${q6(s"0.5D * (($lNew) - acc.l) + 0.5D * acc.b")}))
               |""".stripMargin).as("st"))
        .select($"user_id", $"n", $"st.l".as("level"),
          $"st.b".as("trend"),
          round($"st.l" + $"st.b", 6).as("forecast1"))
        .orderBy("user_id")
    },

    // Robust anomaly detection (median/MAD, the outlier rule MADlib and
    // every monitoring stack ship): flag events whose value deviates
    // more than 3 scaled MADs from their event-type median. Two exact
    // percentile aggregates (regime-split plans, see Quantiles.scala)
    // + a broadcast join back — the per-type stats are catalog-scale,
    // the corpus is never re-shuffled beyond the two aggs.
    Q("q_ts_anomaly", Some(
      """WITH med AS (SELECT event_type,
        |    quantile_cont(value, 0.5) AS med FROM events GROUP BY 1),
        |mad AS (SELECT e.event_type,
        |    quantile_cont(abs(e.value - m.med), 0.5) AS mad
        |  FROM events e JOIN med m ON e.event_type = m.event_type
        |  GROUP BY 1)
        |SELECT e.event_id, e.event_type,
        |  floor(abs(e.value - m.med) / (1.4826 * d.mad) * 10000 + 0.5)
        |    / 10000 AS z_mad
        |FROM events e JOIN med m ON e.event_type = m.event_type
        |              JOIN mad d ON e.event_type = d.event_type
        |WHERE abs(e.value - m.med) > 3 * 1.4826 * d.mad
        |ORDER BY event_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val ev = Tables.T(s, dir).events
      val med = ev.groupBy($"event_type")
        .agg(percentile($"value", lit(0.5)).as("med"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy($"event_type")
        .agg(percentile(abs($"value" - $"med"), lit(0.5)).as("mad"))
      ev.join(broadcast(med), "event_type")
        .join(broadcast(mad), "event_type")
        .filter(abs($"value" - $"med") > lit(3) * lit(1.4826) * $"mad")
        .select($"event_id", $"event_type",
          (floor(abs($"value" - $"med") / (lit(1.4826) * $"mad")
            * lit(10000) + lit(0.5)) / lit(10000)).as("z_mad"))
        .orderBy("event_id")
    },

    // AR(2) autoregression per series (MADlib arima_train, the
    // ARIMA(p,0,0) conditional-least-squares case: with no
    // differencing/MA terms the CSS objective IS ordinary least squares
    // on the lag matrix, so the fit is exact and closed-form — no
    // Levenberg-Marquardt loop). Lag features come from per-series
    // windows (the series key partitions the window; ties broken by
    // event_id for a total order), then the SAME one-pass moment
    // aggregate + Cramer solve as q_agg_ols — one corpus scan, one
    // |series|-row shuffle at any scale. fc1 is the one-step-ahead
    // forecast b0 + b1·y_T + b2·y_{T-1} from each series' last rows.
    Q("q_ts_ar", Some {
      import graft.operators.Regression.Sql._
      val det = det3(c0, c1, c2)
      val (db0, db1, db2) = (det3(r, c1, c2), det3(c0, r, c2), det3(c0, c1, r))
      val (b0, b1, b2) = (s"($db0 / $det)", s"($db1 / $det)", s"($db2 / $det)")
      val sse = s"(syy - ($b0 * sy + $b1 * sx1y + $b2 * sx2y))"
      val sst = "(syy - sy * sy / n)"
      s"""WITH lg AS (SELECT event_type, ts, event_id, value,
         |    lag(value, 1) OVER (PARTITION BY event_type
         |                        ORDER BY ts, event_id) AS x1,
         |    lag(value, 2) OVER (PARTITION BY event_type
         |                        ORDER BY ts, event_id) AS x2
         |  FROM events),
         |l AS (SELECT * FROM lg WHERE x2 IS NOT NULL),
         |t AS (SELECT event_type AS grp, CAST(count(*) AS DOUBLE) AS n,
         |    ${Q.oSum("x1", 6)} AS sx1, ${Q.oSum("x2", 6)} AS sx2,
         |    ${Q.oSum("value", 6)} AS sy,
         |    ${Q.oSum("x1 * x1", 6)} AS sx11,
         |    ${Q.oSum("x2 * x2", 6)} AS sx22,
         |    ${Q.oSum("x1 * x2", 6)} AS sx12,
         |    ${Q.oSum("x1 * value", 6)} AS sx1y,
         |    ${Q.oSum("x2 * value", 6)} AS sx2y,
         |    ${Q.oSum("value * value", 6)} AS syy
         |  FROM l GROUP BY 1),
         |lst AS (SELECT event_type AS grp, value AS y_t, x1 AS y_t1
         |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
         |      ORDER BY ts DESC, event_id DESC) AS rn FROM l)
         |  WHERE rn = 1)
         |SELECT t.grp, CAST(n AS BIGINT) AS n,
         |  round(CASE WHEN abs($det) > 1e-9 THEN $b0 END, 4) AS b0,
         |  round(CASE WHEN abs($det) > 1e-9 THEN $b1 END, 4) AS b1,
         |  round(CASE WHEN abs($det) > 1e-9 THEN $b2 END, 4) AS b2,
         |  round(CASE WHEN abs($det) > 1e-9 AND $sst > 0.0
         |    THEN 1.0 - $sse / $sst END, 6) AS r2,
         |  round(CASE WHEN abs($det) > 1e-9
         |    THEN $b0 + $b1 * y_t + $b2 * y_t1 END, 4) AS fc1
         |FROM t JOIN lst ON t.grp = lst.grp ORDER BY t.grp""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val wl = Window.partitionBy($"event_type").orderBy($"ts", $"event_id")
      val lagged = Tables.T(s, dir).events
        .select($"event_type", $"ts", $"event_id", $"value",
          lag($"value", 1).over(wl).as("x1"),
          lag($"value", 2).over(wl).as("x2"))
        .filter($"x2".isNotNull)
      val fit = graft.operators.Regression.olsFit2(
        lagged, "event_type", "value", "x1", "x2")
      val wd = Window.partitionBy($"event_type")
        .orderBy($"ts".desc, $"event_id".desc)
      val last = lagged
        .select($"event_type".as("grp"), $"value", $"x1",
          row_number().over(wd).as("rn"))
        .filter($"rn" === 1)
        .select($"grp", $"value".as("y_t"), $"x1".as("y_t1"))
      fit.join(last, "grp")
        .select($"grp", $"n",
          round($"b0", 4).as("b0"), round($"b1", 4).as("b1"),
          round($"b2", 4).as("b2"), round($"r2", 6).as("r2"),
          round($"b0" + $"b1" * $"y_t" + $"b2" * $"y_t1", 4).as("fc1"))
        .orderBy("grp")
    },

    // ROC-AUC (MADlib area_under_roc parity) via the Mann–Whitney
    // rank-sum identity with midranks for ties: AUC = (Σ midrank⁺ −
    // n⁺(n⁺+1)/2) / (n⁺·n⁻). The rank side is one per-distinct-score
    // aggregate + the Ranks.cumBelow distributed prefix sum (NOT an
    // unpartitioned rank window, which would gather the corpus into one
    // task): per score, 2·Σmidrank⁺ = n⁺ₛ·(2·below + cntₛ + 1) — all
    // exact longs, so both engines agree bit-for-bit. The oracle
    // expresses the same prefix sum as a window over the DISTINCT-score
    // relation (DuckDB-side only).
    Q("q_ml_auc", Some(
      """WITH s AS (SELECT value AS score,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |per AS (SELECT score, count(*) AS cnt, sum(y) AS np_s
        |  FROM s GROUP BY 1),
        |cum AS (SELECT score, cnt, np_s,
        |    coalesce(sum(cnt) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS below
        |  FROM per),
        |agg AS (SELECT
        |    sum(np_s * (2 * below + cnt + 1)) AS two_rsum,
        |    sum(np_s) AS np, sum(cnt - np_s) AS nn
        |  FROM cum)
        |SELECT CAST(np AS BIGINT) AS np, CAST(nn AS BIGINT) AS nn,
        |  (CAST(two_rsum AS DOUBLE) / 2.0
        |     - CAST(np AS DOUBLE) * (CAST(np AS DOUBLE) + 1.0) / 2.0)
        |    / (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)) AS auc
        |FROM agg""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val sc = Tables.T(s, dir).events
        .select($"value".as("score"),
          when($"event_type" === "purchase", 1L).otherwise(0L).as("y"))
      val per = sc.groupBy("score")
        .agg(count(lit(1)).as("cnt"), sum($"y").as("np_s"))
      graft.operators.Ranks.cumBelow(per, "score", "cnt")
        .agg(
          // decimal BEFORE the multiply (the Stats.mwTest discipline):
          // the per-value product np_s·2n itself passes 2^63 at full
          // scale, and DuckDB multiplies HUGEINTs
          sum($"np_s".cast(org.apache.spark.sql.types.DecimalType(38, 0))
            * (lit(2) * $"below" + $"cnt" + 1)
              .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .as("two_rsum"),
          sum($"np_s").as("np"), sum($"cnt" - $"np_s").as("nn"))
        .select($"np".cast("long").as("np"), $"nn".cast("long").as("nn"),
          (($"two_rsum".cast("double") / lit(2.0)
            - $"np".cast("double") * ($"np".cast("double") + lit(1.0))
              / lit(2.0))
            / ($"np".cast("double") * $"nn".cast("double"))).as("auc"))
    },

    // PR-AUC / average precision (the ranking metric beside q_ml_auc's
    // ROC — scikit's step-wise AP = Σ (R_k − R_{k−1})·P_k over distinct
    // score thresholds, descending): TP/ALL prefixes come from TWO
    // Ranks.cumBelow passes over the per-score relation (never an
    // unpartitioned window); each threshold term micros-quantizes
    // before the order-free integer sum, and the result is an exact
    // 1e-6 multiple presented raw.
    Q("q_ml_auc_pr", Some(
      """WITH s AS (SELECT value AS score,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |per AS (SELECT score, count(*) AS cnt, sum(y) AS np_s
        |  FROM s GROUP BY 1),
        |cum AS (SELECT score, cnt, np_s,
        |    coalesce(sum(cnt) OVER (ORDER BY score DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS below_all,
        |    coalesce(sum(np_s) OVER (ORDER BY score DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS below_np
        |  FROM per),
        |tot AS (SELECT sum(np_s) AS np FROM per),
        |terms AS (SELECT CAST(floor(
        |      CAST(np_s AS DOUBLE) / np
        |      * (CAST(below_np + np_s AS DOUBLE)
        |         / CAST(below_all + cnt AS DOUBLE))
        |      * 1000000 + 0.5) AS BIGINT) AS tm
        |  FROM cum, tot WHERE np_s > 0)
        |SELECT CAST(t.np AS BIGINT) AS np,
        |  sum(tm) / 1000000.0 AS ap
        |FROM terms, tot t GROUP BY t.np""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val sc = Tables.T(s, dir).events
        .select($"value".as("score"),
          when($"event_type" === "purchase", 1L).otherwise(0L).as("y"))
      val per = sc.groupBy("score")
        .agg(count(lit(1)).as("cnt"), sum($"y").as("np_s"))
        .withColumn("neg", -$"score")
      val c1 = graft.operators.Ranks.cumBelow(per, "neg", "cnt")
        .withColumnRenamed("below", "below_all")
      val c2 = graft.operators.Ranks.cumBelow(c1, "neg", "np_s")
        .withColumnRenamed("below", "below_np")
      val np = per.agg(sum($"np_s")).head.getLong(0)
      val term = floor(
        $"np_s".cast("double") / lit(np.toDouble) *
          (($"below_np" + $"np_s").cast("double") /
            ($"below_all" + $"cnt").cast("double")) *
          lit(1000000d) + lit(0.5)).cast("long")
      c2.filter($"np_s" > 0)
        .select(term.as("tm"))
        .agg((sum($"tm") / lit(1000000.0)).as("ap"))
        .select(lit(np).as("np"), $"ap")
    },

    // Chi-square test of independence (MADlib chi2 test parity):
    // event_type × user-cohort contingency table from ONE hash
    // aggregate of exact counts; expected cells and the statistic are
    // identical integer-derived doubles in both engines. Marginals
    // broadcast back onto the cells (catalog-scale), so the plan is one
    // corpus aggregate + tiny joins.
    Q("q_ml_chi2", Some(
      """WITH o AS (SELECT event_type AS r, user_id % 4 AS c,
        |    count(*) AS o FROM events GROUP BY 1, 2),
        |rm AS (SELECT r, sum(o) AS rn FROM o GROUP BY 1),
        |cm AS (SELECT c, sum(o) AS cn FROM o GROUP BY 1),
        |n AS (SELECT sum(o) AS n FROM o),
        |cells AS (SELECT o.r, o.c, o.o,
        |    CAST(rm.rn AS DOUBLE) * CAST(cm.cn AS DOUBLE)
        |      / CAST(n.n AS DOUBLE) AS e
        |  FROM o JOIN rm ON o.r = rm.r JOIN cm ON o.c = cm.c
        |         CROSS JOIN n)
        |SELECT CAST(count(*) AS BIGINT) AS cells,
        |  floor(sum((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e)
        |            / e) * 1000000 + 0.5) / 1000000 AS chi2
        |FROM cells""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val o = Tables.T(s, dir).events
        .groupBy($"event_type".as("r"), ($"user_id" % 4).as("c"))
        .agg(count(lit(1)).as("o"))
      val rm = o.groupBy("r").agg(sum($"o").as("rn"))
      val cm = o.groupBy("c").agg(sum($"o").as("cn"))
      val n = o.agg(sum($"o").as("n"))
      o.join(broadcast(rm), "r").join(broadcast(cm), "c")
        .join(broadcast(n))
        .withColumn("e", $"rn".cast("double") * $"cn".cast("double")
          / $"n".cast("double"))
        .agg(count(lit(1)).cast("long").as("cells"),
          (floor(sum(($"o".cast("double") - $"e")
              * ($"o".cast("double") - $"e") / $"e")
            * lit(1000000) + lit(0.5)) / lit(1000000)).as("chi2"))
    },

    // Two-sample Kolmogorov–Smirnov test (MADlib ks_test parity; the
    // pipeline drift-detection primitive): D = max |F_view − F_click|
    // over pooled values. Spark side rides Ranks.cumBelow prefix sums;
    // the oracle expresses the same inclusive CDFs as windows over the
    // distinct-value relation. All CDF values are ratios of exact
    // longs → identical argmax in both engines (ties → smallest x).
    Q("q_ml_kstest", Some(
      """WITH per AS (SELECT value AS x,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cnt_a,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS cnt_b
        |  FROM events WHERE event_type IN ('view', 'click')
        |  GROUP BY 1),
        |cum AS (SELECT x, cnt_a, cnt_b,
        |    sum(cnt_a) OVER (ORDER BY x) AS ca,
        |    sum(cnt_b) OVER (ORDER BY x) AS cb
        |  FROM per),
        |tot AS (SELECT sum(cnt_a) AS n_a, sum(cnt_b) AS n_b FROM per)
        |SELECT abs(CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE)
        |         - CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE)) AS ks,
        |  x AS at_value, CAST(n_a AS BIGINT) AS n_a,
        |  CAST(n_b AS BIGINT) AS n_b
        |FROM cum CROSS JOIN tot
        |ORDER BY ks DESC, x LIMIT 1""".stripMargin)) { (s, dir) =>
      graft.operators.Stats.ksTest(Tables.T(s, dir).events,
        "value", "event_type", "view", "click")
    },

    // Mann–Whitney U / Wilcoxon rank-sum (MADlib mw_test — completes
    // the stats module beside ks_test and chi2): midrank sums from
    // the AUC's per-distinct-value + prefix-sum machinery, exact
    // DECIMAL(38) integers end to end; z applies the tie-corrected
    // variance as a pinned double expression, identical across
    // engines unrounded.
    Q("q_ml_mwtest", Some(
      """WITH per AS (SELECT value AS x, count(*) AS cnt,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS na_s
        |  FROM events WHERE event_type IN ('view', 'click')
        |  GROUP BY 1),
        |cum AS (SELECT x, cnt, na_s,
        |    coalesce(sum(cnt) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS below
        |  FROM per),
        |agg AS (SELECT
        |    sum(CAST(na_s AS HUGEINT) * (2 * below + cnt + 1))
        |      AS two_rsum,
        |    sum(na_s) AS na, sum(cnt - na_s) AS nb,
        |    sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie3
        |  FROM cum),
        |u AS (SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT)
        |      AS n_b,
        |    CAST(two_rsum AS DOUBLE) / 2.0
        |      - CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) + 1.0) / 2.0
        |      AS u_a,
        |    CAST(tie3 AS DOUBLE) AS t3
        |  FROM agg)
        |SELECT n_a, n_b, u_a,
        |  (u_a - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
        |    / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
        |      * (CAST(n_a + n_b AS DOUBLE) + 1.0
        |         - t3 / (CAST(n_a + n_b AS DOUBLE)
        |                 * (CAST(n_a + n_b AS DOUBLE) - 1.0)))) AS z
        |FROM u""".stripMargin)) { (s, dir) =>
      graft.operators.Stats.mwTest(Tables.T(s, dir).events,
        "value", "event_type", "view", "click")
    },

    // Wilcoxon signed-rank (MADlib wsr_test; the PAIRED companion of
    // q_ml_mwtest): d = discount − tax per row, zeros dropped, |d|
    // midranks from the same prefix machinery, W⁺ exact, z pinned
    // with the tie-corrected variance.
    Q("q_ml_wsrtest", Some(
      """WITH d AS (SELECT CAST(l_discount AS DOUBLE)
        |      - CAST(l_tax AS DOUBLE) AS d
        |  FROM lineitem
        |  WHERE CAST(l_discount AS DOUBLE) <> CAST(l_tax AS DOUBLE)),
        |per AS (SELECT abs(d) AS ad, count(*) AS cnt,
        |    sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS np_s
        |  FROM d GROUP BY 1),
        |cum AS (SELECT ad, cnt, np_s,
        |    coalesce(sum(cnt) OVER (ORDER BY ad
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS below
        |  FROM per),
        |agg AS (SELECT
        |    sum(CAST(np_s AS HUGEINT) * (2 * below + cnt + 1))
        |      AS two_wsum,
        |    sum(cnt) AS n,
        |    sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie3
        |  FROM cum),
        |u AS (SELECT CAST(n AS BIGINT) AS n,
        |    CAST(two_wsum AS DOUBLE) / 2.0 AS w_plus,
        |    CAST(n AS DOUBLE) AS nd, CAST(tie3 AS DOUBLE) AS t3
        |  FROM agg)
        |SELECT n, w_plus,
        |  (w_plus - nd * (nd + 1.0) / 4.0)
        |    / sqrt(nd * (nd + 1.0) * (2.0 * nd + 1.0) / 24.0
        |           - t3 / 48.0) AS z
        |FROM u""".stripMargin)) { (s, dir) =>
      import s.implicits._
      graft.operators.Stats.wsrTest(
        Tables.T(s, dir).lineitem
          .select($"l_discount".cast("double").as("x"),
            $"l_tax".cast("double").as("y")),
        "x", "y")
    },

    // Mutual information between two categoricals (the feature-
    // relevance cousin of q_ml_chi2, same one-aggregate contingency
    // dataflow): I = Σ p(r,c)·ln(p(r,c)/(p(r)p(c))). ln() may differ
    // by an ulp across libms, so each cell term is micros-rounded
    // before the exact split-sum (the q_text_keyness discipline) and
    // the statistic is emitted at the same precision.
    Q("q_ml_mutinfo", Some(
      s"""WITH o AS (SELECT event_type AS r, user_id % 4 AS c,
         |    count(*) AS o FROM events GROUP BY 1, 2),
         |rm AS (SELECT r, sum(o) AS rn FROM o GROUP BY 1),
         |cm AS (SELECT c, sum(o) AS cn FROM o GROUP BY 1),
         |n AS (SELECT sum(o) AS n FROM o),
         |cells AS (SELECT
         |    (CAST(o.o AS DOUBLE) / CAST(n.n AS DOUBLE))
         |      * ln(CAST(o.o AS DOUBLE) * CAST(n.n AS DOUBLE)
         |           / (CAST(rm.rn AS DOUBLE) * CAST(cm.cn AS DOUBLE)))
         |      AS term
         |  FROM o JOIN rm ON o.r = rm.r JOIN cm ON o.c = cm.c
         |         CROSS JOIN n)
         |SELECT CAST(count(*) AS BIGINT) AS cells,
         |  ${Q.oSum("term", 6)} AS mi
         |FROM cells""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val o = Tables.T(s, dir).events
        .groupBy($"event_type".as("r"), ($"user_id" % 4).as("c"))
        .agg(count(lit(1)).as("o"))
      val rm = o.groupBy("r").agg(sum($"o").as("rn"))
      val cm = o.groupBy("c").agg(sum($"o").as("cn"))
      val n = o.agg(sum($"o").as("n"))
      o.join(broadcast(rm), "r").join(broadcast(cm), "c")
        .join(broadcast(n))
        .withColumn("term",
          ($"o".cast("double") / $"n".cast("double"))
            * log($"o".cast("double") * $"n".cast("double")
              / ($"rn".cast("double") * $"cn".cast("double"))))
        .agg(count(lit(1)).cast("long").as("cells"),
          Q.dsum($"term", 6).as("mi"))
    },

    // Decile lift chart (the model-evaluation companion of q_ml_auc):
    // rank-deciles of the score via the same Ranks.cumBelow prefix sum
    // (no unpartitioned ntile window), response rate per decile over
    // the base rate. Decile assignment is exact long floor-division;
    // every rate is a ratio of exact longs.
    Q("q_ml_lift", Some(
      """WITH s AS (SELECT value AS score,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |per AS (SELECT score, count(*) AS cnt, sum(y) AS ys
        |  FROM s GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS n, sum(ys) AS yy FROM per),
        |cum AS (SELECT score, cnt, ys,
        |    coalesce(sum(cnt) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS below
        |  FROM per),
        |dec AS (SELECT CAST((below * 10) // n AS INT) AS decile,
        |    cnt, ys FROM cum CROSS JOIN tot)
        |SELECT decile, CAST(sum(cnt) AS BIGINT) AS n_d,
        |  CAST(sum(ys) AS BIGINT) AS y_d,
        |  (CAST(sum(ys) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE))
        |    / (CAST(max(yy) AS DOUBLE) / CAST(max(n) AS DOUBLE)) AS lift
        |FROM (SELECT d.*, t.n, t.yy FROM dec d CROSS JOIN tot t)
        |GROUP BY 1 ORDER BY 1""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val sc = Tables.T(s, dir).events
        .select($"value".as("score"),
          when($"event_type" === "purchase", 1L).otherwise(0L).as("y"))
      val per = sc.groupBy("score")
        .agg(count(lit(1)).as("cnt"), sum($"y").as("ys"))
      val tot = per.agg(sum($"cnt").as("n"), sum($"ys").as("yy"))
      graft.operators.Ranks.cumBelow(per, "score", "cnt")
        .join(broadcast(tot))
        .select(expr("CAST((below * 10) div n AS INT)").as("decile"),
          $"cnt", $"ys", $"n", $"yy")
        .groupBy("decile")
        .agg(sum($"cnt").cast("long").as("n_d"),
          sum($"ys").cast("long").as("y_d"),
          ((sum($"ys").cast("double") / sum($"cnt").cast("double"))
            / (max($"yy").cast("double") / max($"n").cast("double")))
            .as("lift"))
        .orderBy("decile")
    },

    // Gini concentration coefficient — revenue inequality across
    // customers (the market-concentration analytics GP shops run).
    // G = (2·Σ rankᵢ·xᵢ − (n+1)·Σx) / (n·Σx) over values sorted
    // ascending; tie blocks contribute v·Σranks regardless of
    // within-tie order, so the per-distinct-value form on
    // Ranks.cumBelow is EXACT: Σranks(v) = cnt·below + cnt(cnt+1)/2.
    // Revenues become micros longs, every sum is DECIMAL(38), and the
    // single division happens after both sides cast the identical
    // integers to double.
    Q("q_ml_gini", Some {
      val sy = Q.pSum("o_totalprice", 2)
      """WITH rev AS (SELECT o_custkey, """ + sy + """ AS rev
        |  FROM orders GROUP BY 1),
        |per AS (SELECT rev, count(*) AS cnt FROM rev GROUP BY 1),
        |cum AS (SELECT rev, cnt,
        |    coalesce(sum(cnt) OVER (ORDER BY rev
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS below
        |  FROM per),
        |t AS (SELECT
        |    CAST(floor(rev * 1000000 + 0.5) AS BIGINT) AS v6,
        |    cnt, below,
        |    cnt * below + cnt * (cnt + 1) // 2 AS sumranks
        |  FROM cum),
        |agg AS (SELECT sum(cnt) AS n, sum(v6 * cnt) AS sx6,
        |    sum(v6 * sumranks) AS srx
        |  FROM t)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(2 * srx - (n + 1) * sx6 AS DOUBLE)
        |    / CAST(n * sx6 AS DOUBLE) AS gini
        |FROM agg""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val rev = Tables.T(s, dir).orders
        .groupBy($"o_custkey")
        .agg(Q.dsum($"o_totalprice", 2).as("rev"))
      val per = rev.groupBy("rev").agg(count(lit(1)).as("cnt"))
      val t = graft.operators.Ranks.cumBelow(per, "rev", "cnt")
        .select(floor($"rev" * lit(1000000) + lit(0.5)).cast("long")
            .as("v6"),
          $"cnt", $"below",
          // integer div keeps the term a LONG (Spark `/` on longs
          // yields double); cnt·(cnt+1) is even so this is exact
          expr("cnt * below + (cnt * (cnt + 1)) div 2").as("sumranks"))
      t.agg(sum($"cnt").as("n"),
          sum(($"v6" * $"cnt").cast(dec)).as("sx6"),
          sum(($"v6" * $"sumranks").cast(dec)).as("srx"))
        .select($"n".cast("long").as("n"),
          ((lit(2) * $"srx" - ($"n" + 1) * $"sx6").cast("double")
            / ($"n" * $"sx6").cast("double")).as("gini"))
    },

    // Smoothed target encoding (the feature-engineering standard for
    // high-cardinality categoricals; Micci-Barreca 2001): enc(cat) =
    // (Σy + m·prior) / (n + m). One category aggregate + a broadcast
    // global prior — at 100 TB the encode table is category-scale and
    // broadcast-joins back onto the corpus as a map-only enrich.
    Q("q_ml_target_enc", Some {
      val sy = Q.pSum("o_totalprice", 6)
      s"""WITH cat AS (SELECT c_nationkey AS cat, count(*) AS n,
         |    $sy AS sy
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1),
         |g AS (SELECT sum(n) AS gn, ${Q.oSum("sy", 6)} AS gs FROM cat)
         |SELECT cat, CAST(n AS BIGINT) AS n,
         |  (sy + 100.0 * (gs / CAST(gn AS DOUBLE)))
         |    / (CAST(n AS DOUBLE) + 100.0) AS enc
         |FROM cat CROSS JOIN g ORDER BY cat""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val t = Tables.T(s, dir)
      val cat = t.orders
        .join(t.customer, $"o_custkey" === $"c_custkey")
        .groupBy($"c_nationkey".as("cat"))
        .agg(count(lit(1)).as("n"), Q.dsum($"o_totalprice", 6).as("sy"))
      val g = cat.agg(sum($"n").as("gn"), Q.dsum($"sy", 6).as("gs"))
      cat.join(broadcast(g))
        .select($"cat", $"n".cast("long").as("n"),
          (($"sy" + lit(100.0) * ($"gs" / $"gn".cast("double")))
            / ($"n".cast("double") + lit(100.0))).as("enc"))
        .orderBy("cat")
    },

    // Welch two-sample t-test (MADlib t_test parity): ONE conditional
    // moment aggregate (split-sum discipline → shuffle-order exact),
    // then pure scalar algebra — mean difference over the pooled
    // standard error with Welch–Satterthwaite df. sqrt is correctly
    // rounded per IEEE (unlike pow), so both engines emit the
    // identical statistic from the identical moments.
    Q("q_ml_ttest", Some {
      def side(g: String, sfx: String) = Seq(
        s"sum(CASE WHEN event_type = '$g' THEN 1 ELSE 0 END) AS n$sfx",
        s"${Q.pSum("value", 6, s"event_type = '$g'")} AS sx$sfx",
        s"${Q.pSum("value * value", 6, s"event_type = '$g'")} AS sxx$sfx")
      val aggs = (side("view", "1") ++ side("click", "2")).mkString(",\n  ")
      val va = "((sxx1 - sx1 * sx1 / CAST(n1 AS DOUBLE)) " +
        "/ CAST(n1 - 1 AS DOUBLE))"
      val vb = "((sxx2 - sx2 * sx2 / CAST(n2 AS DOUBLE)) " +
        "/ CAST(n2 - 1 AS DOUBLE))"
      val sea = s"($va / CAST(n1 AS DOUBLE))"
      val seb = s"($vb / CAST(n2 AS DOUBLE))"
      s"""WITH m AS (SELECT
         |  $aggs
         |FROM events)
         |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         |  (sx1 / CAST(n1 AS DOUBLE) - sx2 / CAST(n2 AS DOUBLE))
         |    / sqrt($sea + $seb) AS t,
         |  ($sea + $seb) * ($sea + $seb)
         |    / ($sea * $sea / CAST(n1 - 1 AS DOUBLE)
         |       + $seb * $seb / CAST(n2 - 1 AS DOUBLE)) AS df
         |FROM m""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      def cond(g: String) = $"event_type" === g
      val m = Tables.T(s, dir).events.agg(
        sum(when(cond("view"), 1L).otherwise(0L)).as("n1"),
        Q.dsum(when(cond("view"), $"value"), 6).as("sx1"),
        Q.dsum(when(cond("view"), $"value" * $"value"), 6).as("sxx1"),
        sum(when(cond("click"), 1L).otherwise(0L)).as("n2"),
        Q.dsum(when(cond("click"), $"value"), 6).as("sx2"),
        Q.dsum(when(cond("click"), $"value" * $"value"), 6).as("sxx2"))
      val va = ($"sxx1" - $"sx1" * $"sx1" / $"n1".cast("double")) /
        ($"n1" - 1).cast("double")
      val vb = ($"sxx2" - $"sx2" * $"sx2" / $"n2".cast("double")) /
        ($"n2" - 1).cast("double")
      val sea = va / $"n1".cast("double")
      val seb = vb / $"n2".cast("double")
      m.select($"n1".cast("long").as("n1"), $"n2".cast("long").as("n2"),
        (($"sx1" / $"n1".cast("double") - $"sx2" / $"n2".cast("double"))
          / sqrt(sea + seb)).as("t"),
        ((sea + seb) * (sea + seb)
          / (sea * sea / ($"n1" - 1).cast("double")
            + seb * seb / ($"n2" - 1).cast("double"))).as("df"))
    },

    // One-way ANOVA F (MADlib anova parity): per-group moments in one
    // aggregate, then SSB/SSW from micros-rounded per-group terms —
    // the second (k-row) aggregate re-applies split-sum discipline so
    // group iteration order can't move either engine's F.
    Q("q_ml_anova", Some {
      val ssw = Q.oSum("sxx - sx * sx / CAST(n AS DOUBLE)", 6)
      val sgm = Q.oSum("sx * sx / CAST(n AS DOUBLE)", 6)
      val gsum = Q.oSum("sx", 6)
      s"""WITH g AS (SELECT event_type,
         |    count(*) AS n, ${Q.pSum("value", 6)} AS sx,
         |    ${Q.pSum("value * value", 6)} AS sxx
         |  FROM events GROUP BY 1),
         |m AS (SELECT count(*) AS k, sum(n) AS nn,
         |    $gsum AS gs, $sgm AS sgm, $ssw AS ssw
         |  FROM g)
         |SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
         |  ((sgm - gs * gs / CAST(nn AS DOUBLE))
         |     / CAST(k - 1 AS DOUBLE))
         |    / (ssw / CAST(nn - k AS DOUBLE)) AS f
         |FROM m""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val g = Tables.T(s, dir).events.groupBy($"event_type")
        .agg(count(lit(1)).as("n"), Q.dsum($"value", 6).as("sx"),
          Q.dsum($"value" * $"value", 6).as("sxx"))
      val m = g.agg(count(lit(1)).as("k"), sum($"n").as("nn"),
        Q.dsum($"sx", 6).as("gs"),
        Q.dsum($"sx" * $"sx" / $"n".cast("double"), 6).as("sgm"),
        Q.dsum($"sxx" - $"sx" * $"sx" / $"n".cast("double"), 6).as("ssw"))
      m.select($"k".cast("long").as("k"), $"nn".cast("long").as("n"),
        ((($"sgm" - $"gs" * $"gs" / $"nn".cast("double"))
          / ($"k" - 1).cast("double"))
          / ($"ssw" / ($"nn" - $"k").cast("double"))).as("f"))
    },

    // MA(1) per series by conditional least squares over a θ grid
    // (MADlib arima_train's moving-average half; q_ts_ar covers the
    // AR side): innovations e_t = y_t − c − θ·e_{t−1} are an
    // inherently sequential per-series recurrence — same honest shape
    // as q_ts_holt (parallel across series, HOF fold within). Each θ
    // candidate is one in-row fold; SSE accumulates as exact integer
    // micros; argmin θ ties to the smallest index. The first fold
    // step is sentinel-detected (ss = −1) so both engines initialize
    // e₁ = q6(y₁ − c) identically inside the same lambda text.
    Q("q_ts_ma", Some {
      val thetas = Seq(-0.6, -0.3, 0.0, 0.3, 0.6)
      def q6(x: String) = s"floor(($x) * 1000000 + 0.5) / 1000000"
      def mic(x: String) = s"floor(($x) * 1000000 + 0.5)"
      def foldSql(theta: String) = {
        val eprev = s"(CASE WHEN acc[2] < 0 THEN ${q6("acc[1] - c")} " +
          "ELSE acc[1] END)"
        val ssprev = s"(CASE WHEN acc[2] < 0 THEN ${mic(s"$eprev * $eprev")} " +
          "ELSE acc[2] END)"
        val enew = q6(s"x[1] - c - ($theta) * $eprev")
        s"""list_reduce(list_transform(ys, y -> [y, CAST(-1 AS DOUBLE)]),
           |      (acc, x) -> [$enew, $ssprev + ${mic(s"($enew) * ($enew)")}])"""
          .stripMargin
      }
      def finSql(st: String) =
        s"(CASE WHEN $st[2] < 0 THEN ${mic(
          s"(${q6(s"$st[1] - c")}) * (${q6(s"$st[1] - c")})")} " +
          s"ELSE $st[2] END)"
      val cands = thetas.zipWithIndex.map { case (t, i) =>
        s"{'ss': ${finSql(s"(${foldSql(t.toString)})")}, 'i': $i, " +
          s"'th': CAST($t AS DOUBLE)}"
      }.mkString(",\n      ")
      s"""WITH s AS (SELECT user_id,
         |    list(value ORDER BY ts, event_id) AS ys,
         |    count(*) AS n, ${Q.pSum("value", 6)} AS sy
         |  FROM events GROUP BY user_id),
         |c0 AS (SELECT user_id, ys, n,
         |    ${q6("sy / n")} AS c FROM s),
         |f AS (SELECT user_id, n, c,
         |    list_sort([
         |      $cands
         |    ])[1] AS best
         |  FROM c0)
         |SELECT user_id, CAST(n AS BIGINT) AS n, c,
         |  best.th AS theta,
         |  best.ss / 1000000.0 / n AS mse
         |FROM f ORDER BY user_id""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val thetas = Seq(-0.6, -0.3, 0.0, 0.3, 0.6)
      def q6(x: String) = s"floor(($x) * 1000000 + 0.5) / 1000000D"
      def mic(x: String) = s"floor(($x) * 1000000 + 0.5)"
      def foldExpr(theta: String) = {
        val eprev = s"(CASE WHEN acc.ss < 0 THEN ${q6("acc.e - c")} " +
          "ELSE acc.e END)"
        val ssprev = s"(CASE WHEN acc.ss < 0 THEN ${mic(s"$eprev * $eprev")} " +
          "ELSE acc.ss END)"
        val enew = q6(s"y - c - ($theta) * $eprev")
        s"""aggregate(slice(ys, 2, size(ys) - 1),
           |  named_struct('e', ys[0], 'ss', CAST(-1 AS DOUBLE)),
           |  (acc, y) -> named_struct('e', $enew,
           |    'ss', $ssprev + ${mic(s"($enew) * ($enew)")}))""".stripMargin
      }
      def finExpr(st: String) =
        s"(CASE WHEN $st.ss < 0 THEN ${mic(
          s"(${q6(s"$st.e - c")}) * (${q6(s"$st.e - c")})")} " +
          s"ELSE $st.ss END)"
      val cands = thetas.zipWithIndex.map { case (t, i) =>
        s"named_struct('ss', ${finExpr(s"(${foldExpr(t.toString)})")}, " +
          s"'i', $i, 'th', CAST($t AS DOUBLE))"
      }.mkString(", ")
      Tables.T(s, dir).events
        .groupBy($"user_id")
        .agg(
          expr("sort_array(collect_list(struct(ts, event_id, value)))")
            .as("pts"),
          count(lit(1)).as("n"), Q.dsum($"value", 6).as("sy"))
        .select($"user_id", expr("transform(pts, p -> p.value)").as("ys"),
          $"n", expr(s"floor((sy / n) * 1000000 + 0.5) / 1000000D").as("c"))
        .select($"user_id", $"n".cast("long").as("n"), $"c",
          expr(s"array_min(array($cands))").as("best"))
        .select($"user_id", $"n", $"c", $"best.th".as("theta"),
          ($"best.ss" / lit(1000000.0) / $"n").as("mse"))
        .orderBy("user_id")
    },

    // ARIMA(2,1,1) per series — MADlib arima_train composed from the
    // pieces q_ts_ar and q_ts_ma already pin: difference once (one
    // per-series lag window), fit AR(2) on the diffs with the exact
    // closed-form moment pass (ONE aggregate + Cramer solve, the
    // olsFit2 shape), then estimate the MA θ on the AR residuals by
    // conditional-least-squares grid (in-row fold per candidate) —
    // Hannan–Rissanen two-stage ARMA estimation. Coefficients
    // micros-quantize before the residual pass and innovations
    // micros-quantize per step, so both engines walk identical exact
    // fixed-point states; SSE accumulates as integer micros. Scale:
    // parallel across series; the fold is per-entity-bounded (the
    // q_ts_holt/q_ts_ma contract); the AR fit shuffles 10 doubles per
    // series; the coefficient join-back is a broadcast of the
    // series-catalog-scale fit relation.
    Q("q_ts_arima", Some {
      import graft.operators.Regression.Sql._
      val thetas = Seq(-0.6, -0.3, 0.0, 0.3, 0.6)
      def q6(x: String) = s"floor(($x) * 1000000 + 0.5) / 1000000"
      def mic(x: String) = s"floor(($x) * 1000000 + 0.5)"
      val det = det3(c0, c1, c2)
      val (db0, db1, db2) = (det3(r, c1, c2), det3(c0, r, c2), det3(c0, c1, r))
      def foldSql(theta: String) = {
        val ssprev = s"(CASE WHEN acc[2] < 0 THEN ${mic("acc[1] * acc[1]")} " +
          "ELSE acc[2] END)"
        val enew = q6(s"x[1] - ($theta) * acc[1]")
        s"""list_reduce(list_transform(rs, e -> [e, CAST(-1 AS DOUBLE)]),
           |      (acc, x) -> [$enew, $ssprev + ${mic(s"($enew) * ($enew)")}])"""
          .stripMargin
      }
      def finSql(st: String) =
        s"(CASE WHEN $st[2] < 0 THEN ${mic(s"$st[1] * $st[1]")} " +
          s"ELSE $st[2] END)"
      val cands = thetas.zipWithIndex.map { case (t, i) =>
        s"{'ss': ${finSql(s"(${foldSql(t.toString)})")}, 'i': $i, " +
          s"'th': CAST($t AS DOUBLE)}"
      }.mkString(",\n      ")
      s"""WITH d0 AS (SELECT user_id, ts, event_id, value,
         |    lag(value) OVER (PARTITION BY user_id
         |                     ORDER BY ts, event_id) AS pv
         |  FROM events),
         |dd AS (SELECT user_id, ts, event_id, value - pv AS dy
         |  FROM d0 WHERE pv IS NOT NULL),
         |lg AS (SELECT user_id, ts, event_id, dy,
         |    lag(dy, 1) OVER (PARTITION BY user_id
         |                     ORDER BY ts, event_id) AS x1,
         |    lag(dy, 2) OVER (PARTITION BY user_id
         |                     ORDER BY ts, event_id) AS x2
         |  FROM dd),
         |l AS (SELECT * FROM lg WHERE x2 IS NOT NULL),
         |t AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
         |    ${Q.oSum("x1", 6)} AS sx1, ${Q.oSum("x2", 6)} AS sx2,
         |    ${Q.oSum("dy", 6)} AS sy,
         |    ${Q.oSum("x1 * x1", 6)} AS sx11,
         |    ${Q.oSum("x2 * x2", 6)} AS sx22,
         |    ${Q.oSum("x1 * x2", 6)} AS sx12,
         |    ${Q.oSum("x1 * dy", 6)} AS sx1y,
         |    ${Q.oSum("x2 * dy", 6)} AS sx2y,
         |    ${Q.oSum("dy * dy", 6)} AS syy
         |  FROM l GROUP BY 1),
         |f AS (SELECT user_id, n,
         |    ${q6(s"$db0 / $det")} AS b0,
         |    ${q6(s"$db1 / $det")} AS b1,
         |    ${q6(s"$db2 / $det")} AS b2
         |  FROM t WHERE abs($det) > 1e-9),
         |rr AS (SELECT l.user_id, ts, event_id, n, b0, b1, b2,
         |    ${q6("dy - b0 - b1 * x1 - b2 * x2")} AS rv
         |  FROM l JOIN f USING (user_id)),
         |s AS (SELECT user_id, n, b0, b1, b2,
         |    list(rv ORDER BY ts, event_id) AS rs
         |  FROM rr GROUP BY 1, 2, 3, 4, 5),
         |g AS (SELECT user_id, n, b0, b1, b2,
         |    list_sort([
         |      $cands
         |    ])[1] AS best
         |  FROM s)
         |SELECT user_id, CAST(n AS BIGINT) AS n,
         |  round(b0, 4) AS b0, round(b1, 4) AS b1, round(b2, 4) AS b2,
         |  best.th AS theta, best.ss / 1000000.0 / n AS mse
         |FROM g ORDER BY user_id""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val thetas = Seq(-0.6, -0.3, 0.0, 0.3, 0.6)
      def q6c(c: org.apache.spark.sql.Column) =
        floor(c * lit(1000000d) + lit(0.5)) / lit(1000000d)
      def q6(x: String) = s"floor(($x) * 1000000 + 0.5) / 1000000D"
      def mic(x: String) = s"floor(($x) * 1000000 + 0.5)"
      val wl = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val dd = Tables.T(s, dir).events
        .select($"user_id", $"ts", $"event_id",
          ($"value" - lag($"value", 1).over(wl)).as("dy"))
        .filter($"dy".isNotNull)
      val lagged = dd.select($"user_id", $"ts", $"event_id", $"dy",
          lag($"dy", 1).over(wl).as("x1"), lag($"dy", 2).over(wl).as("x2"))
        .filter($"x2".isNotNull)
      val fit = graft.operators.Regression
        .olsFit2(lagged, "user_id", "dy", "x1", "x2")
        .filter($"b0".isNotNull)
        .select($"grp".as("user_id"), $"n",
          q6c($"b0").as("b0"), q6c($"b1").as("b1"), q6c($"b2").as("b2"))
      val resid = lagged.join(broadcast(fit), "user_id")
        .select($"user_id", $"ts", $"event_id", $"n",
          $"b0", $"b1", $"b2",
          q6c($"dy" - $"b0" - $"b1" * $"x1" - $"b2" * $"x2").as("rv"))
      def foldExpr(theta: String) = {
        val ssprev = s"(CASE WHEN acc.ss < 0 THEN ${mic("acc.e * acc.e")} " +
          "ELSE acc.ss END)"
        val enew = q6(s"e - ($theta) * acc.e")
        s"""aggregate(slice(rs, 2, size(rs) - 1),
           |  named_struct('e', rs[0], 'ss', CAST(-1 AS DOUBLE)),
           |  (acc, e) -> named_struct('e', $enew,
           |    'ss', $ssprev + ${mic(s"($enew) * ($enew)")}))""".stripMargin
      }
      def finExpr(st: String) =
        s"(CASE WHEN $st.ss < 0 THEN ${mic(s"$st.e * $st.e")} " +
          s"ELSE $st.ss END)"
      val cands = thetas.zipWithIndex.map { case (t, i) =>
        s"named_struct('ss', ${finExpr(s"(${foldExpr(t.toString)})")}, " +
          s"'i', $i, 'th', CAST($t AS DOUBLE))"
      }.mkString(", ")
      resid.groupBy($"user_id", $"n", $"b0", $"b1", $"b2")
        .agg(expr(
          "transform(sort_array(collect_list(struct(ts, event_id, rv)))," +
            " p -> p.rv)").as("rs"))
        .select($"user_id", $"n", $"b0", $"b1", $"b2",
          expr(s"array_min(array($cands))").as("best"))
        .select($"user_id", $"n".cast("long").as("n"),
          round($"b0", 4).as("b0"), round($"b1", 4).as("b1"),
          round($"b2", 4).as("b2"), $"best.th".as("theta"),
          ($"best.ss" / lit(1000000.0) / $"n").as("mse"))
        .orderBy("user_id")
    },

    // ARIMA(2,1,1) h-step FORECAST per series — MADlib arima_forecast:
    // the q_ts_arima fit (difference → AR(2) moment fit → θ grid on
    // residual folds) extended with the forecast recursion. The chosen
    // candidate fold carries its FINAL innovation e_T; forecasts on
    // the differenced scale are d̂₁ = q6(b0 + b1·dyₜ + b2·dyₜ₋₁ + θ·e_T),
    // d̂ₕ = q6(b0 + b1·d̂ₕ₋₁ + b2·d̂ₕ₋₂) (future innovations have mean 0),
    // and integration undoes the differencing: ŷₕ = yₜ + Σ d̂. Every
    // step micros-quantizes, so both engines walk identical states.
    // Scale: the fold is per-entity-bounded; last-value extraction is
    // one per-series aggregate; everything joins at series-catalog
    // scale.
    Q("q_ts_arima_forecast", Some {
      import graft.operators.Regression.Sql._
      val thetas = Seq(-0.6, -0.3, 0.0, 0.3, 0.6)
      def q6(x: String) = s"floor(($x) * 1000000 + 0.5) / 1000000"
      def mic(x: String) = s"floor(($x) * 1000000 + 0.5)"
      val det = det3(c0, c1, c2)
      val (db0, db1, db2) = (det3(r, c1, c2), det3(c0, r, c2), det3(c0, c1, r))
      def foldSql(theta: String) = {
        val ssprev = s"(CASE WHEN acc[2] < 0 THEN ${mic("acc[1] * acc[1]")} " +
          "ELSE acc[2] END)"
        val enew = q6(s"x[1] - ($theta) * acc[1]")
        s"""list_reduce(list_transform(rs, e -> [e, CAST(-1 AS DOUBLE)]),
           |      (acc, x) -> [$enew, $ssprev + ${mic(s"($enew) * ($enew)")}])"""
          .stripMargin
      }
      val cands = thetas.zipWithIndex.map { case (t, i) =>
        s"""list_transform([(${foldSql(t.toString)})], st ->
           |        {'ss': (CASE WHEN st[2] < 0 THEN ${mic("st[1] * st[1]")}
           |                ELSE st[2] END),
           |         'i': $i, 'th': CAST($t AS DOUBLE), 'e': st[1]})[1]"""
          .stripMargin
      }.mkString(",\n      ")
      s"""WITH d0 AS (SELECT user_id, ts, event_id, value,
         |    lag(value) OVER (PARTITION BY user_id
         |                     ORDER BY ts, event_id) AS pv
         |  FROM events),
         |dd AS (SELECT user_id, ts, event_id, value - pv AS dy
         |  FROM d0 WHERE pv IS NOT NULL),
         |lg AS (SELECT user_id, ts, event_id, dy,
         |    lag(dy, 1) OVER (PARTITION BY user_id
         |                     ORDER BY ts, event_id) AS x1,
         |    lag(dy, 2) OVER (PARTITION BY user_id
         |                     ORDER BY ts, event_id) AS x2
         |  FROM dd),
         |l AS (SELECT * FROM lg WHERE x2 IS NOT NULL),
         |t AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
         |    ${Q.oSum("x1", 6)} AS sx1, ${Q.oSum("x2", 6)} AS sx2,
         |    ${Q.oSum("dy", 6)} AS sy,
         |    ${Q.oSum("x1 * x1", 6)} AS sx11,
         |    ${Q.oSum("x2 * x2", 6)} AS sx22,
         |    ${Q.oSum("x1 * x2", 6)} AS sx12,
         |    ${Q.oSum("x1 * dy", 6)} AS sx1y,
         |    ${Q.oSum("x2 * dy", 6)} AS sx2y,
         |    ${Q.oSum("dy * dy", 6)} AS syy
         |  FROM l GROUP BY 1),
         |f AS (SELECT user_id, n,
         |    ${q6(s"$db0 / $det")} AS b0,
         |    ${q6(s"$db1 / $det")} AS b1,
         |    ${q6(s"$db2 / $det")} AS b2
         |  FROM t WHERE abs($det) > 1e-9),
         |rr AS (SELECT l.user_id, ts, event_id, n, b0, b1, b2,
         |    ${q6("dy - b0 - b1 * x1 - b2 * x2")} AS rv
         |  FROM l JOIN f USING (user_id)),
         |s AS (SELECT user_id, n, b0, b1, b2,
         |    list(rv ORDER BY ts, event_id) AS rs
         |  FROM rr GROUP BY 1, 2, 3, 4, 5),
         |g AS (SELECT user_id, n, b0, b1, b2,
         |    list_sort([
         |      $cands
         |    ])[1] AS best
         |  FROM s),
         |lastd AS (SELECT user_id,
         |    list(dy ORDER BY ts, event_id) AS ds FROM dd GROUP BY 1),
         |lasty AS (SELECT user_id,
         |    list(value ORDER BY ts, event_id) AS ys
         |  FROM events GROUP BY 1),
         |fc AS (SELECT g.user_id, best.th AS theta,
         |    ${q6("b0 + b1 * ds[-1] + b2 * ds[-2] + best.th * best.e")}
         |      AS d1, ds[-1] AS dyt, ys[-1] AS yt
         |  FROM g JOIN lastd USING (user_id) JOIN lasty USING (user_id)),
         |fc2 AS (SELECT user_id, theta, yt, d1,
         |    ${q6("b0 + b1 * d1 + b2 * dyt")} AS d2, b0, b1, b2
         |  FROM (SELECT fc.*, g2.b0, g2.b1, g2.b2 FROM fc
         |        JOIN g g2 USING (user_id)) q),
         |fc3 AS (SELECT user_id, theta, yt, d1, d2,
         |    ${q6("b0 + b1 * d2 + b2 * d1")} AS d3
         |  FROM fc2)
         |SELECT user_id, theta,
         |  yt + d1 AS f1,
         |  yt + d1 + d2 AS f2,
         |  yt + d1 + d2 + d3 AS f3
         |FROM fc3 ORDER BY user_id""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val thetas = Seq(-0.6, -0.3, 0.0, 0.3, 0.6)
      def q6c(c: org.apache.spark.sql.Column) =
        floor(c * lit(1000000d) + lit(0.5)) / lit(1000000d)
      def q6(x: String) = s"floor(($x) * 1000000 + 0.5) / 1000000D"
      def mic(x: String) = s"floor(($x) * 1000000 + 0.5)"
      val wl = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val ev = Tables.T(s, dir).events
      val dd = ev
        .select($"user_id", $"ts", $"event_id",
          ($"value" - lag($"value", 1).over(wl)).as("dy"))
        .filter($"dy".isNotNull)
      val lagged = dd.select($"user_id", $"ts", $"event_id", $"dy",
          lag($"dy", 1).over(wl).as("x1"), lag($"dy", 2).over(wl).as("x2"))
        .filter($"x2".isNotNull)
      val fit = graft.operators.Regression
        .olsFit2(lagged, "user_id", "dy", "x1", "x2")
        .filter($"b0".isNotNull)
        .select($"grp".as("user_id"), $"n",
          q6c($"b0").as("b0"), q6c($"b1").as("b1"), q6c($"b2").as("b2"))
      val resid = lagged.join(broadcast(fit), "user_id")
        .select($"user_id", $"ts", $"event_id", $"n",
          $"b0", $"b1", $"b2",
          q6c($"dy" - $"b0" - $"b1" * $"x1" - $"b2" * $"x2").as("rv"))
      def foldExpr(theta: String) = {
        val ssprev = s"(CASE WHEN acc.ss < 0 THEN ${mic("acc.e * acc.e")} " +
          "ELSE acc.ss END)"
        val enew = q6(s"e - ($theta) * acc.e")
        s"""aggregate(slice(rs, 2, size(rs) - 1),
           |  named_struct('e', rs[0], 'ss', CAST(-1 AS DOUBLE)),
           |  (acc, e) -> named_struct('e', $enew,
           |    'ss', $ssprev + ${mic(s"($enew) * ($enew)")}))""".stripMargin
      }
      val cands = thetas.zipWithIndex.map { case (t, i) =>
        s"""element_at(transform(array(${foldExpr(t.toString)}), st ->
           |  named_struct(
           |    'ss', (CASE WHEN st.ss < 0 THEN ${mic("st.e * st.e")}
           |           ELSE st.ss END),
           |    'i', $i, 'th', CAST($t AS DOUBLE), 'e', st.e)), 1)"""
          .stripMargin
      }.mkString(", ")
      val g = resid.groupBy($"user_id", $"n", $"b0", $"b1", $"b2")
        .agg(expr(
          "transform(sort_array(collect_list(struct(ts, event_id, rv)))," +
            " p -> p.rv)").as("rs"))
        .select($"user_id", $"b0", $"b1", $"b2",
          expr(s"array_min(array($cands))").as("best"))
      val lastd = dd.groupBy($"user_id").agg(expr(
        "transform(sort_array(collect_list(struct(ts, event_id, dy)))," +
          " p -> p.dy)").as("ds"))
      val lasty = ev.groupBy($"user_id").agg(expr(
        "transform(sort_array(collect_list(struct(ts, event_id, value)))," +
          " p -> p.value)").as("ys"))
      g.join(lastd, "user_id").join(lasty, "user_id")
        .select($"user_id", $"best.th".as("theta"),
          $"b0", $"b1", $"b2", $"best.e".as("e"),
          expr("element_at(ds, -1)").as("dyt"),
          expr("element_at(ds, -2)").as("dyt1"),
          expr("element_at(ys, -1)").as("yt"))
        .withColumn("d1",
          expr(q6("b0 + b1 * dyt + b2 * dyt1 + theta * e")))
        .withColumn("d2", expr(q6("b0 + b1 * d1 + b2 * dyt")))
        .withColumn("d3", expr(q6("b0 + b1 * d2 + b2 * d1")))
        // forecasts emit RAW: exact sums of identical doubles repr
        // identically on both engines, while round(4) strikes the
        // half-midpoint tie (NOTES: half-micros presentation ties)
        .select($"user_id", $"theta",
          ($"yt" + $"d1").as("f1"),
          ($"yt" + $"d1" + $"d2").as("f2"),
          ($"yt" + $"d1" + $"d2" + $"d3").as("f3"))
        .orderBy("user_id")
    },

    // Confusion matrix + precision/recall/F1/accuracy (MADlib
    // prediction-metrics module): a deterministic threshold classifier
    // (value > global median ⇒ purchase) scored against the label —
    // ONE aggregate of exact counts after the exact-percentile
    // threshold broadcast; every metric is a pinned ratio of exact
    // longs, identical across engines unrounded.
    Q("q_ml_confusion", Some(
      """WITH m AS (SELECT quantile_cont(value, 0.5) AS thr FROM events),
        |c AS (SELECT
        |    sum(CASE WHEN value > thr AND event_type = 'purchase'
        |        THEN 1 ELSE 0 END) AS tp,
        |    sum(CASE WHEN value > thr AND event_type <> 'purchase'
        |        THEN 1 ELSE 0 END) AS fp,
        |    sum(CASE WHEN value <= thr AND event_type = 'purchase'
        |        THEN 1 ELSE 0 END) AS fn,
        |    sum(CASE WHEN value <= thr AND event_type <> 'purchase'
        |        THEN 1 ELSE 0 END) AS tn
        |  FROM events CROSS JOIN m)
        |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
        |  CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
        |  CAST(tp AS DOUBLE) / (tp + fp) AS precision_,
        |  CAST(tp AS DOUBLE) / (tp + fn) AS recall_,
        |  CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) AS f1,
        |  CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) AS accuracy
        |FROM c""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val ev = Tables.T(s, dir).events
      val thr = ev.agg(percentile($"value", lit(0.5)).as("thr"))
      val c = ev.crossJoin(broadcast(thr)).agg(
        sum(when($"value" > $"thr" && $"event_type" === "purchase", 1L)
          .otherwise(0L)).as("tp"),
        sum(when($"value" > $"thr" && $"event_type" =!= "purchase", 1L)
          .otherwise(0L)).as("fp"),
        sum(when($"value" <= $"thr" && $"event_type" === "purchase", 1L)
          .otherwise(0L)).as("fn"),
        sum(when($"value" <= $"thr" && $"event_type" =!= "purchase", 1L)
          .otherwise(0L)).as("tn"))
      c.select($"tp", $"fp", $"fn", $"tn",
        ($"tp".cast("double") / ($"tp" + $"fp")).as("precision_"),
        ($"tp".cast("double") / ($"tp" + $"fn")).as("recall_"),
        ((($"tp" * 2).cast("double"))
          / ($"tp" * 2 + $"fp" + $"fn")).as("f1"),
        (($"tp" + $"tn").cast("double")
          / ($"tp" + $"fp" + $"fn" + $"tn")).as("accuracy"))
    },

    // Levene's test (Brown–Forsythe median variant — the variance-
    // homogeneity companion run before q_ml_anova): one-way ANOVA F on
    // z = |x − group median|. Group medians are exact percentiles
    // (the q_ts_anomaly cross-engine precedent) broadcast back; then
    // the identical one-aggregate moment dataflow as q_ml_anova on z
    // with split-sum discipline.
    Q("q_ml_levene", Some {
      val ssw = Q.oSum("szz - sz * sz / CAST(n AS DOUBLE)", 6)
      val sgm = Q.oSum("sz * sz / CAST(n AS DOUBLE)", 6)
      val gsum = Q.oSum("sz", 6)
      s"""WITH med AS (SELECT event_type,
         |    quantile_cont(value, 0.5) AS med FROM events GROUP BY 1),
         |z AS (SELECT e.event_type, abs(e.value - m.med) AS z
         |  FROM events e JOIN med m ON e.event_type = m.event_type),
         |g AS (SELECT event_type, count(*) AS n,
         |    ${Q.pSum("z", 6)} AS sz, ${Q.pSum("z * z", 6)} AS szz
         |  FROM z GROUP BY 1),
         |m2 AS (SELECT count(*) AS k, sum(n) AS nn,
         |    $gsum AS gs, $sgm AS sgm, $ssw AS ssw
         |  FROM g)
         |SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
         |  ((sgm - gs * gs / CAST(nn AS DOUBLE))
         |     / CAST(k - 1 AS DOUBLE))
         |    / (ssw / CAST(nn - k AS DOUBLE)) AS w
         |FROM m2""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val ev = Tables.T(s, dir).events
      val med = ev.groupBy($"event_type")
        .agg(percentile($"value", lit(0.5)).as("med"))
      val z = ev.join(broadcast(med), "event_type")
        .select($"event_type", abs($"value" - $"med").as("z"))
      val g = z.groupBy($"event_type")
        .agg(count(lit(1)).as("n"), Q.dsum($"z", 6).as("sz"),
          Q.dsum($"z" * $"z", 6).as("szz"))
      val m = g.agg(count(lit(1)).as("k"), sum($"n").as("nn"),
        Q.dsum($"sz", 6).as("gs"),
        Q.dsum($"sz" * $"sz" / $"n".cast("double"), 6).as("sgm"),
        Q.dsum($"szz" - $"sz" * $"sz" / $"n".cast("double"), 6).as("ssw"))
      m.select($"k".cast("long").as("k"), $"nn".cast("long").as("n"),
        ((($"sgm" - $"gs" * $"gs" / $"nn".cast("double"))
          / ($"k" - 1).cast("double"))
          / ($"ssw" / ($"nn" - $"k").cast("double"))).as("w"))
    },

    // Multimodal plumbing: binary payload column + partition-wise decode
    // (stubbed codec, real schema/batch shape — Multimodal.featurize).
    // Ordered-step funnel (view → click → purchase within 72 h of the
    // first view): each stage is a per-user min-aggregate + equi-join
    // against the shrinking qualified set — never a window over the
    // full stream, never event×event.
    Q("q_events_funnel", Some(
      """WITH s1 AS (SELECT user_id AS u, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id AS u, s1.t1, min(e.ts) AS tk
        |  FROM events e JOIN s1 ON e.user_id = s1.u
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |    AND e.ts <= s1.t1 + INTERVAL 72 HOUR
        |  GROUP BY 1, 2),
        |s3 AS (SELECT e.user_id AS u, s2.t1, min(e.ts) AS tk
        |  FROM events e JOIN s2 ON e.user_id = s2.u
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.tk
        |    AND e.ts <= s2.t1 + INTERVAL 72 HOUR
        |  GROUP BY 1, 2)
        |SELECT 1 AS step, 'view' AS event_type,
        |  (SELECT count(*) FROM s1) AS users
        |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
        |ORDER BY step""".stripMargin)) { (s, dir) =>
      Funnels.funnel(Tables.T(s, dir).events,
        Seq("view", "click", "purchase"), windowHours = 72)
        .orderBy("step")
    },

    // MADlib `path` (the symbol-pattern matcher over ordered event
    // sequences; utilities/path in the MADlib tree): per user the
    // event types compress to a symbol string in (ts, event_id)
    // order; the pattern v[^p]*p ("view, anything but a purchase,
    // then the purchase" — the conversion path) counts non-overlapping
    // matches. The pattern is chosen first-match-deterministic (every
    // match ends at the FIRST p after its v), so Java regex and RE2
    // enumerate identical matches — leftmost-greedy vs
    // leftmost-longest cannot differ. One user-keyed shuffle; symbol
    // strings are series-scale (the q_ts_holt per-entity-bounded
    // regime).
    Q("q_events_path", Some(
      """WITH s AS (SELECT user_id,
        |    string_agg(CASE event_type WHEN 'view' THEN 'v'
        |      WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
        |      WHEN 'signup' THEN 's' ELSE 'e' END, ''
        |      ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |  CAST(len(regexp_extract_all(seq, 'v[^p]*p')) AS BIGINT)
        |    AS n_paths,
        |  CAST(len(array_to_string(regexp_extract_all(seq, 'v[^p]*p'),
        |    '')) AS BIGINT) AS matched_len,
        |  CAST(len(seq) AS BIGINT) AS seq_len
        |FROM s ORDER BY user_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val sym = when($"event_type" === "view", "v")
        .when($"event_type" === "click", "c")
        .when($"event_type" === "purchase", "p")
        .when($"event_type" === "signup", "s")
        .otherwise("e")
      Tables.T(s, dir).events
        .select($"user_id", struct($"ts", $"event_id", sym.as("sym")).as("e"))
        .groupBy("user_id")
        .agg(array_join(transform(sort_array(collect_list($"e")),
          x => x.getField("sym")), "").as("seq"))
        .select($"user_id",
          size(expr("regexp_extract_all(seq, 'v[^p]*p', 0)"))
            .cast("long").as("n_paths"),
          length(array_join(expr("regexp_extract_all(seq, 'v[^p]*p', 0)"),
            "")).cast("long").as("matched_len"),
          length($"seq").cast("long").as("seq_len"))
        .orderBy("user_id")
    },

    // Markov transition matrix over per-user event sequences: one lag
    // window per user (event_id tiebreak for equal timestamps), then a
    // (prev, cur)-keyed count with row-normalized probabilities —
    // clickstream next-event analytics.
    Q("q_events_markov", Some(
      """WITH seq AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT prev, event_type, count(*) AS n FROM seq
        |  WHERE prev IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT c.prev, c.event_type, c.n,
        |  round(c.n / CAST(t.tot AS DOUBLE), 4) AS p
        |FROM c JOIN t USING (prev)
        |ORDER BY prev, event_type""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val seq = Tables.T(s, dir).events
        .select($"user_id", $"event_type",
          lag($"event_type", 1).over(w).as("prev"))
        .filter($"prev".isNotNull)
      val c = seq.groupBy($"prev", $"event_type").agg(count(lit(1)).as("n"))
      val t = c.groupBy($"prev").agg(sum($"n").as("tot"))
      c.join(t, "prev")
        .select($"prev", $"event_type", $"n",
          round($"n" / $"tot".cast("double"), 4).as("p"))
        .orderBy("prev", "event_type")
    },

    // Weekly cohort retention: users bucketed by first-event week, one
    // row per (cohort, week offset) with active members that week.
    Q("q_events_retention", Some(
      """WITH ev AS (SELECT DISTINCT user_id AS u,
        |    date_trunc('week', ts) AS w FROM events),
        |cohort AS (SELECT u, min(w) AS cw FROM ev GROUP BY 1)
        |SELECT CAST(cw AS TIMESTAMP) AS cohort_week,
        |  CAST((epoch_us(w) - epoch_us(cw)) // 604800000000 AS INT)
        |    AS week_offset,
        |  count(*) AS users
        |FROM ev JOIN cohort USING (u)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin)) {
      (s, dir) =>
        import s.implicits._
        Funnels.retention(Tables.T(s, dir).events)
          .orderBy("cohort_week", "week_offset")
    },

    // Frame sampling over "video" payloads: 64-byte frames at stride 48
    // (overlapping), one output row per frame via the lazy flatMap
    // iterator — the 1→N UDTF batch shape a real codec plugs into.
    Q("q_multimodal_frames", Some(
      """WITH f AS (SELECT doc_id, CAST(k AS INT) AS frame_idx,
        |    CAST(k * 48 AS BIGINT) AS "offset",
        |    substr(text, CAST(k * 48 + 1 AS INT), 64) AS fb
        |  FROM documents,
        |    unnest(range(0, CASE WHEN length(text) < 64 THEN 0
        |      ELSE (length(text) - 64) // 48 + 1 END)) r(k)
        |  WHERE doc_id < 200)
        |SELECT doc_id, frame_idx, "offset",
        |  CAST(64 AS BIGINT) AS n_bytes,
        |  CAST(list_reduce(list_transform(range(1, len(fb) + 1),
        |    i -> CAST(ascii(substr(fb, i, 1)) AS BIGINT)),
        |    (a, b) -> (a * 31 + b) % 1000003) AS BIGINT) AS checksum
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin)) { (s, dir) =>
      import s.implicits._
      Multimodal.frameSample(s,
        Multimodal.mediaTable(
          Tables.T(s, dir).documents.filter($"doc_id" < 200)),
        frameBytes = 64, stride = 48)
        .toDF()
        .select($"doc_id", $"frame_idx", $"offset", $"n_bytes", $"checksum")
        .orderBy("doc_id", "frame_idx")
    },

    Q("q_multimodal_decode", Some(
      """SELECT doc_id,
        |  'image/png;src=' || source AS mime,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  CAST(doc_id % 640 + 1 AS INT) AS width,
        |  CAST(doc_id % 480 + 1 AS INT) AS height,
        |  CAST(list_reduce(list_transform(range(1, len(text) + 1),
        |    i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
        |    (a, b) -> (a * 31 + b) % 1000003) AS BIGINT) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      Multimodal.featurize(s, Multimodal.mediaTable(Tables.T(s, dir).documents))
        .toDF()
        .select($"doc_id", $"mime", $"n_bytes", $"width", $"height", $"checksum")
        .orderBy("doc_id")
    },

    // Multimodal resize (r8): binary → binary with the metadata struct
    // updated in the same pass — the "quarter-resolution" spec (every
    // 4th byte survives, dims halve, checksum folds over the sampled
    // bytes) is replayed exactly by the oracle; a real deployment
    // swaps the sampler for a codec scale call and keeps the shape.
    Q("q_multimodal_resize", Some(
      """SELECT doc_id,
        |  'image/png;src=' || source AS mime,
        |  CAST((doc_id % 640 + 2) // 2 AS INT) AS width,
        |  CAST((doc_id % 480 + 2) // 2 AS INT) AS height,
        |  CAST(CASE WHEN len(text) = 0 THEN 0
        |       ELSE (len(text) - 1) // 4 + 1 END AS BIGINT) AS n_bytes,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, len(text) + 1, 4),
        |      i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000003) AS BIGINT) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      Multimodal.resize(s, Multimodal.mediaTable(Tables.T(s, dir).documents))
        .toDF()
        .select($"doc_id", $"mime", $"width", $"height", $"n_bytes",
          $"checksum")
        .orderBy("doc_id")
    },

    // Multimodal feature extraction (r8): payload → fixed-width
    // embedding (exact per-dim integer rolling hash, one double
    // division) — the bridge from media columns into the ANN/dedup
    // kernels; a real extractor swaps the hash for a model forward
    // pass behind the same (binary → vector) signature.
    // The dims are emitted as SCALAR columns e1..e4 (not one array
    // column): the driver's pandas canonicalizer sorts raw cells and
    // cannot hash array values, so an array<double> result can never
    // compare green even when byte-identical (r8 red row).
    Q("q_multimodal_embed", Some {
      def dim(j: Int): String =
        s"""CAST(list_reduce(list_prepend(CAST($j AS BIGINT),
           |    list_transform(range(1, len(text) + 1),
           |      i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
           |    (a, b) -> (a * 31 + b) % 1000003) AS DOUBLE) / 1000003.0
           |    AS e$j""".stripMargin
      s"""SELECT doc_id,
         |  ${dim(1)}, ${dim(2)}, ${dim(3)}, ${dim(4)}
         |FROM documents WHERE doc_id < 500 ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      Multimodal.embed(s,
        Multimodal.mediaTable(
          Tables.T(s, dir).documents.filter($"doc_id" < 500)), dim = 4)
        .select($"doc_id",
          element_at($"embedding", 1).as("e1"),
          element_at($"embedding", 2).as("e2"),
          element_at($"embedding", 3).as("e3"),
          element_at($"embedding", 4).as("e4"))
        .orderBy("doc_id")
    }
  )
}
