package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SQL-expressible shapes of the event-store operators (SURVEY §2),
  * exercised over the driver's `events` test table so the DuckDB oracle
  * can check them: A3 last-per-partition, A4 event-time seek, the J1
  * band join, W1 LAG monotonicity, the P5-P9 predicate family, and the
  * F-family scalar functions missing from round 1 (interval, regex,
  * JSON construction, sequence generation).
  *
  * The real event-store implementations live in graft.store (typed,
  * with validation and state); these queries pin the *relational
  * semantics* of each shape against an independent engine.
  */
object EventStoreQueries {

  /** Oracle-side (DuckDB) spelling of the normalized `events.ts` — the
    * single choke point paired with [[graft.Tables.events]] on the
    * Spark side. The testdata has shipped `ts` as both `timestamp[ns]`
    * and `timestamp[us]` across generations (the round-9 drift); DuckDB
    * reads either natively and this cast lands both on µs TIMESTAMP,
    * matching what Tables.events yields under the UTC session. If the
    * encoding drifts again (e.g. to epoch integers), THIS constant and
    * Tables.events are the only two places to touch.
    */
  val TsSql = "CAST(ts AS TIMESTAMP)"

  val all: Seq[Q] = Seq(

    // ----------------------------------------------------------------
    // Funnel analysis over the event log: how far does each user get
    // through signup → view → click → purchase in TIME order, each
    // stage strictly after the previous stage's first occurrence and
    // within a 3-day conversion window of it? The staged-min shape:
    // each stage is one key-partitioned aggregate joined to the
    // previous stage's firsts — four shuffles on user_id, no window
    // over the whole log, no per-user event collection (the classic
    // scalable funnel, vs. collect_list+UDF).
    Q("es_funnel_stages",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"))
        def firstAfter(typ: String, prev: DataFrame, prevT: String, out: String) =
          e.filter(col("event_type") === typ)
            .join(prev.select(col("user_id"), col(prevT)), "user_id")
            .filter(col("ts") > col(prevT) &&
              col("ts") <= col(prevT) + expr("INTERVAL 3 DAYS"))
            .groupBy("user_id").agg(min(col("ts")).as(out))
        val s1 = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts")).as("t1"))
        val s2 = firstAfter("view", s1, "t1", "t2")
        val s3 = firstAfter("click", s2, "t2", "t3")
        val s4 = firstAfter("purchase", s3, "t3", "t4")
        s1.join(s2.select("user_id", "t2"), Seq("user_id"), "left")
          .join(s3.select("user_id", "t3"), Seq("user_id"), "left")
          .join(s4.select("user_id", "t4"), Seq("user_id"), "left")
          .select(col("user_id"),
            (lit(1) + when(col("t2").isNotNull, 1).otherwise(0)
              + when(col("t3").isNotNull, 1).otherwise(0)
              + when(col("t4").isNotNull, 1).otherwise(0)).cast("int").as("stage"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (SELECT user_id, event_type, $TsSql AS ts
                         FROM events),
             s1 AS (SELECT user_id, min(ts) AS t1 FROM e
                    WHERE event_type = 'signup' GROUP BY user_id),
             s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN s1 USING (user_id)
                    WHERE e.event_type = 'view' AND e.ts > s1.t1
                      AND e.ts <= s1.t1 + INTERVAL 3 DAY GROUP BY e.user_id),
             s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN s2 USING (user_id)
                    WHERE e.event_type = 'click' AND e.ts > s2.t2
                      AND e.ts <= s2.t2 + INTERVAL 3 DAY GROUP BY e.user_id),
             s4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM e JOIN s3 USING (user_id)
                    WHERE e.event_type = 'purchase' AND e.ts > s3.t3
                      AND e.ts <= s3.t3 + INTERVAL 3 DAY GROUP BY e.user_id)
             SELECT s1.user_id,
                    CAST(1 + (s2.user_id IS NOT NULL)::INT
                           + (s3.user_id IS NOT NULL)::INT
                           + (s4.user_id IS NOT NULL)::INT AS INT) AS stage
             FROM s1
             LEFT JOIN s2 USING (user_id)
             LEFT JOIN s3 USING (user_id)
             LEFT JOIN s4 USING (user_id)
             ORDER BY user_id""")),

    // ----------------------------------------------------------------
    // Cohort retention over the event log: users grouped by the week
    // of their first purchase, counted in each later week they
    // purchased again. Two aggregates on the user key + one count on
    // the (cohort, offset) key — the distinct-activity table is the
    // only wide shuffle, and it carries (user, week) pairs, never
    // events.
    Q("es_retention_cohorts",
      (s, d) => {
        val act = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
          .distinct()
        val first = act.groupBy("user_id").agg(min(col("wk")).as("cohort"))
        act.join(first, "user_id")
          .select(col("cohort").cast("timestamp_ntz").as("cohort_week"),
            (datediff(col("wk"), col("cohort")) / 7).cast("int").as("week_offset"))
          .groupBy("cohort_week", "week_offset")
          .agg(count(lit(1)).as("n_active"))
          .orderBy("cohort_week", "week_offset")
      },
      Some(s"""WITH e AS (SELECT user_id,
                           date_trunc('week', $TsSql) AS wk
                         FROM events WHERE event_type = 'purchase'),
             act AS (SELECT DISTINCT user_id, wk FROM e),
             first AS (SELECT user_id, min(wk) AS cohort FROM act GROUP BY user_id)
             SELECT CAST(f.cohort AS TIMESTAMP) AS cohort_week,
                    CAST(datediff('day', f.cohort, a.wk) / 7 AS INT) AS week_offset,
                    CAST(count(*) AS BIGINT) AS n_active
             FROM act a JOIN first f USING (user_id)
             GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ----------------------------------------------------------------
    // A3: DISTINCT ON / last-per-partition (reference schema.sql:290-294)
    // — the lock-matrix "head of every partition" aggregate. Window
    // rank-1 per key; scalable: partitioned window, no global sort.
    Q("es_a3_last_per_user",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("ts").cast("timestamp_ntz").as("ts"))
          .orderBy("user_id")
      },
      Some(s"""SELECT user_id, event_id, event_type, $TsSql AS ts
             FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                     ORDER BY ts DESC, event_id DESC) AS rn FROM events)
             WHERE rn = 1 ORDER BY user_id""")),

    // ----------------------------------------------------------------
    // A4: conditional COALESCE aggregate — the register_view event-time
    // seek (reference schema.sql:275-287) incl. the `offset - 1`
    // off-by-one and the "nothing after start_at ⇒ head" branch.
    Q("es_a4_seek_offset",
      (s, d) => {
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(coalesce(
            min(when(col("ts") >= lit("2024-01-15").cast("timestamp"), col("event_id"))) - 1,
            max(col("event_id"))).as("resume_offset"))
          .orderBy("user_id")
      },
      Some(s"""SELECT user_id,
             coalesce(min(CASE WHEN $TsSql >= TIMESTAMP '2024-01-15'
                               THEN event_id END) - 1,
                      max(event_id)) AS resume_offset
             FROM events GROUP BY user_id ORDER BY user_id""")),

    // ----------------------------------------------------------------
    // J1: equi-join with non-equi band residual — the stream_events
    // next-offset discovery (reference schema.sql:418-423): per
    // partition, MIN(offset) past the consumer's last_offset. The
    // "locks" side is derived (mid-stream ack point per user) and
    // broadcast — exactly how the delivery pipeline shapes it.
    Q("es_j1_band_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val locks = ev.groupBy("user_id")
          .agg((min(col("event_id")) +
            floor((max(col("event_id")) - min(col("event_id"))) / 2)).as("last_offset"))
        ev.join(broadcast(locks.withColumnRenamed("user_id", "l_user_id")),
            col("user_id") === col("l_user_id") && col("event_id") > col("last_offset"))
          .groupBy("user_id")
          .agg(min(col("event_id")).as("next_offset"),
               count(lit(1)).as("n_pending"))
          .orderBy("user_id")
      },
      Some(s"""WITH locks AS (
               SELECT user_id, min(event_id) +
                      CAST(floor((max(event_id) - min(event_id)) / 2) AS BIGINT) AS last_offset
               FROM events GROUP BY user_id)
             SELECT e.user_id, min(e.event_id) AS next_offset,
                    count(*) AS n_pending
             FROM events e JOIN locks l
               ON e.user_id = l.user_id AND e.event_id > l.last_offset
             GROUP BY e.user_id ORDER BY e.user_id""")),

    // ----------------------------------------------------------------
    // W1: LAG ordering check (reference tests/utils/assertions.sql:94-103)
    // — per-stream gap inspection, partitioned window (scalable).
    // Grouped z-score outlier flagging (the numeric-column cleaning
    // step of a data pipeline): events whose value sits more than 3
    // population-σ from their type's mean. Determinism: mean and
    // variance come from EXACT decimal sums (values are 2-decimal, so
    // x is DECIMAL(18,2)-exact and x² is DECIMAL(38,4)-exact;
    // Var = E[x²] − E[x]² in double afterwards) — a running-double
    // stddev would be partition-order-dependent. The 5-row stats side
    // broadcasts back onto the scan.
    Q("es_anomaly_zscore",
      (s, d) => {
        val ev = Tables.events(s, d)
        val stats = ev.groupBy(col("event_type").as("t"))
          .agg(
            (sum(col("value").cast("decimal(18,2)")).cast("double") / count(col("value")))
              .as("mean"),
            (sum((col("value").cast("decimal(18,2)") * col("value").cast("decimal(18,2)"))
              .cast("decimal(38,4)")).cast("double") / count(col("value"))).as("ex2"))
          // clamp: ex2 − mean² can be a tiny NEGATIVE double for
          // near-constant groups; Spark's sqrt would give NaN (filter
          // silently false) but DuckDB's sqrt RAISES — clamp both sides
          .withColumn("sd", sqrt(greatest(col("ex2") - col("mean") * col("mean"), lit(0.0))))
        ev.join(broadcast(stats), ev("event_type") === stats("t"))
          .filter(abs(col("value") - col("mean")) > lit(3.0) * col("sd"))
          .select(col("event_id"), col("event_type"), col("value"))
          .orderBy("event_id")
      },
      Some(s"""WITH stats AS (
               SELECT event_type AS t,
                      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS mean,
                      CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) / count(value) AS ex2
               FROM events GROUP BY event_type)
             SELECT event_id, event_type, value
             FROM events JOIN stats ON event_type = t
             WHERE abs(value - mean) > 3.0 * sqrt(greatest(ex2 - mean * mean, 0.0))
             ORDER BY event_id""")),

    // RANGE-interval window frame (time-based moving aggregate): each
    // event's trailing-7-day average value within its user's stream.
    // The frame is VALUE-based (all rows within the interval), not
    // ROWS-based — tied timestamps share one frame, so the result is
    // order-stable without a tie-break. Accumulation is exact decimal
    // (frame evaluation order differs between engines — Spark walks the
    // frame, DuckDB may use segment trees — and a double sum would
    // drift); the one avg division is correctly rounded on both sides.
    Q("es_moving_avg_7d",
      (s, d) => {
        // range frame over epoch micros ≡ RANGE INTERVAL 7 DAYS on the
        // timestamp itself (unix_micros is order-isomorphic and exact)
        val w = Window.partitionBy("user_id").orderBy(col("ots"))
          .rangeBetween(-7L * 86400L * 1000000L, Window.currentRow)
        Tables.events(s, d)
          .withColumn("ots", unix_micros(col("ts")))
          .select(col("event_id"), col("user_id"),
            (sum(col("value").cast("decimal(18,2)")).over(w).cast("double") /
              count(col("value")).over(w)).as("avg_7d"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id,
             CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) /
               count(value) OVER w AS avg_7d
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY $TsSql
                          RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
             ORDER BY event_id""")),

    // Frame-sensitive first/last_value + lead over an explicit ROWS
    // frame (the window primitives not covered elsewhere: w1 has lag,
    // A3 has max_by): a 3-event trailing context per user — last_value
    // is frame-end-sensitive by SQL semantics, which is exactly what
    // the explicit frame pins (the default frame would make it the
    // current row trivially).
    Q("es_w5_frame_bounds",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-2, Window.currentRow)
        val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            first("event_type").over(w).as("ctx_first"),
            last("event_type").over(w).as("ctx_last"),
            lead("event_type", 1).over(wOrd).as("next_type"))
          .orderBy("user_id", "event_id")
      },
      Some(s"""SELECT user_id, event_id,
             first_value(event_type) OVER w AS ctx_first,
             last_value(event_type) OVER w AS ctx_last,
             lead(event_type) OVER w2 AS next_type
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY $TsSql, event_id
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                    w2 AS (PARTITION BY user_id ORDER BY $TsSql, event_id)
             ORDER BY user_id, event_id""")),

    // Distribution ranks: percent_rank + cume_dist complete the window
    // function families (rank/ntile/lag/lead/frames covered elsewhere).
    // The window ordering carries a unique tie-break (value, event_id),
    // so rank positions — and therefore both rationals — are
    // deterministic; the division is one double op on exact integers,
    // identical across engines, rounded as belt-and-braces.
    Q("es_w6_distribution_ranks",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("value", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cum_dist"))
          .orderBy("user_id", "event_id")
      },
      Some(s"""SELECT user_id, event_id,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cum_dist
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
             ORDER BY user_id, event_id""")),

    Q("es_w1_lag_gaps",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            lag("event_id", 1).over(w).as("prev_event_id"),
            (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
          .orderBy("user_id", "event_id")
      },
      Some(s"""SELECT user_id, event_id,
             lag(event_id) OVER w AS prev_event_id,
             epoch_us($TsSql) - lag(epoch_us($TsSql)) OVER w AS gap_us
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY $TsSql, event_id)
             ORDER BY user_id, event_id""")),

    // ----------------------------------------------------------------
    // P5-P9 predicate family in one pass: non-equi band (P5), LIKE
    // prefix (P6), boolean flag (P7), null checks (P8), null-safe
    // equality (P9).
    Q("es_p_predicates",
      (s, d) => {
        Tables.events(s, d)
          .filter(col("event_type").like("c%") &&          // P6
                  col("value").isNotNull &&                 // P8
                  col("event_id") > col("user_id") * 10)    // P5 non-equi
          .select(col("event_id"),
            (col("value") > 100).as("is_big"),              // P7 flag
            col("props").isNull.as("no_props"),             // P8
            col("event_type") <=> lit("click") as "is_click") // P9
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, value > 100 AS is_big,
             props IS NULL AS no_props,
             event_type IS NOT DISTINCT FROM 'click' AS is_click
             FROM events
             WHERE event_type LIKE 'c%' AND value IS NOT NULL
               AND event_id > user_id * 10
             ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // F2: interval arithmetic (reference schema.sql:413,464 — lease
    // expiry & scheduled-nack timestamps).
    Q("es_f2_interval",
      (s, d) => {
        Tables.events(s, d)
          .filter(col("user_id") < 10)
          .select(col("event_id"),
            (col("ts") + expr("INTERVAL 1 HOUR")).cast("timestamp_ntz").as("lease_until"),
            (col("ts") - expr("INTERVAL 30 SECONDS")).cast("timestamp_ntz").as("grace_start"),
            ((unix_micros(col("ts")) - unix_micros(lit("2024-01-01 00:00:00").cast("timestamp"))) / lit(1000000L)).cast("long").as("age_s"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id,
             $TsSql + INTERVAL 1 HOUR AS lease_until,
             $TsSql - INTERVAL 30 SECOND AS grace_start,
             CAST((epoch_us($TsSql) - epoch_us(TIMESTAMP '2024-01-01')) // 1000000 AS BIGINT) AS age_s
             FROM events WHERE user_id < 10 ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // F4: regex — rlike filter + extraction (reference error-regex
    // matching, test-helpers.sql:188).
    Q("es_f4_regex",
      (s, d) => {
        Tables.events(s, d)
          .filter(col("event_type").rlike("^(click|scroll|signup)"))
          .select(col("event_id"),
            regexp_extract(col("props"), "[0-9]+", 0).as("first_num"),
            regexp_replace(col("event_type"), "[aeiou]", "_").as("devoweled"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id,
             regexp_extract(props, '[0-9]+') AS first_num,
             regexp_replace(event_type, '[aeiou]', '_', 'g') AS devoweled
             FROM events WHERE regexp_matches(event_type, '^(click|scroll|signup)')
             ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // F6: JSON construction (reference jsonb_build_object,
    // extensions.sql:46 — the push-payload envelope).
    Q("es_f6_json_envelope",
      (s, d) => {
        Tables.events(s, d)
          .filter(col("user_id") < 10)
          .select(col("event_id"),
            to_json(struct(col("user_id").as("u"), col("event_type").as("t"),
              col("event_id").as("o"))).as("envelope"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id,
             to_json(struct_pack(u := user_id, t := event_type, o := event_id)) AS envelope
             FROM events WHERE user_id < 10 ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // Distinct aggregation (extension beyond the reference, SURVEY
    // §2.4 note): exact distinct counts per group — the dedup-aware
    // cardinality question every consumer-lag dashboard asks.
    Q("es_a_distinct_users",
      (s, d) => {
        Tables.events(s, d)
          .groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_users"),
               count(lit(1)).as("n_events"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, count(DISTINCT user_id) AS n_users,
             count(*) AS n_events
             FROM events GROUP BY event_type ORDER BY event_type""")),

    // Binned histogram: the width_bucket shape via portable floor
    // arithmetic (bucket = floor(value / width) — one exact double op,
    // no engine-specific bucket function). Bounds are exact decimal
    // min/max per bin; the aggregation is one map-side-combined
    // shuffle on the bin id.
    Q("es_value_histogram",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(floor(col("value") / 10.0d).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
              .cast("double").as("lo"),
            max(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
              .cast("double").as("hi"))
          .orderBy("bucket")
      },
      Some(s"""SELECT CAST(floor(value / 10.0) AS BIGINT) AS bucket,
             count(*) AS n,
             CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS lo,
             CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hi
             FROM events GROUP BY 1 ORDER BY bucket""")),

    // ----------------------------------------------------------------
    // P3: point lookup by unique key (reference assertions
    // WHERE event_id = ?, tests/utils/assertions.sql:21-23).
    Q("es_p3_point_lookup",
      (s, d) => {
        Tables.events(s, d)
          .filter(col("event_id") === 4242L)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("ts").cast("timestamp_ntz").as("ts"))
      },
      Some(s"""SELECT event_id, user_id, event_type, $TsSql AS ts
             FROM events WHERE event_id = 4242""")),

    // ----------------------------------------------------------------
    // O2: top-1 latest (reference get_last_event ORDER BY offset DESC
    // LIMIT 1, schema.sql:359-367) — TakeOrderedAndProject, k = 1.
    Q("es_o2_latest_event",
      (s, d) => {
        Tables.events(s, d)
          .orderBy(col("ts").desc, col("event_id").desc)
          .limit(1)
          .select(col("event_id"), col("user_id"), col("event_type"))
      },
      Some(s"""SELECT event_id, user_id, event_type FROM events
             ORDER BY $TsSql DESC, event_id DESC LIMIT 1""")),

    // ----------------------------------------------------------------
    // F3: string construction pack — repeat/format/pad (reference
    // format(), repeat('x',1000) stress payloads).
    Q("es_f3_strings",
      (s, d) => {
        Tables.events(s, d)
          .filter(col("user_id") < 5)
          .select(col("event_id"),
            format_string("evt-%05d/%s", col("event_id"), col("event_type")).as("label"),
            repeat(lit("x"), 8).as("pad8"),
            lpad(col("user_id").cast("string"), 4, "0").as("uid4"),
            reverse(col("event_type")).as("rev"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id,
             printf('evt-%05d/%s', event_id, event_type) AS label,
             repeat('x', 8) AS pad8,
             lpad(CAST(user_id AS VARCHAR), 4, '0') AS uid4,
             reverse(event_type) AS rev
             FROM events WHERE user_id < 5 ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // F7: UUID materialization. Random uuid() is inherently
    // un-oracle-able, so the checkable form is the deterministic
    // content-derived UUID (v4 layout carved from md5 — the standard
    // "stable synthetic id" trick in ingest pipelines).
    Q("es_f7_uuid",
      (s, d) => {
        val h = md5(concat(lit("evt:"), col("event_id").cast("string")))
        Tables.events(s, d)
          .filter(col("user_id") < 5)
          .select(col("event_id"),
            concat_ws("-",
              substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
              substring(h, 17, 4), substring(h, 21, 12)).as("stable_uuid"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id,
             substr(h,1,8) || '-' || substr(h,9,4) || '-' || substr(h,13,4) || '-' ||
             substr(h,17,4) || '-' || substr(h,21,12) AS stable_uuid
             FROM (SELECT event_id, md5('evt:' || CAST(event_id AS VARCHAR)) AS h
                   FROM events WHERE user_id < 5)
             ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // Tumbling event-time window aggregate (SURVEY §7.6 extended
    // surface; Spark `window()` over events.ts, checked against
    // DuckDB time_bucket semantics via date_trunc).
    Q("es_window_tumbling",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
               round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("sum_value"))
          .select(col("w.start").cast("timestamp_ntz").as("day_start"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy("day_start", "event_type")
      },
      Some(s"""SELECT date_trunc('day', $TsSql) AS day_start,
             event_type, count(*) AS n,
             round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
             FROM events GROUP BY 1, 2 ORDER BY day_start, event_type""")),

    // ----------------------------------------------------------------
    // Hopping (sliding) windows: 2-day width, 1-day hop — every event
    // lands in exactly two windows. The oracle replays Spark's
    // epoch-aligned window generation as an unnest of the two
    // qualifying starts; the Spark side is the native overlapping
    // `window(ts, width, hop)` generate + one partial-agg shuffle.
    Q("es_window_hopping",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(window(col("ts"), "2 days", "1 day").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
               round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("sum_value"))
          .select(col("w.start").cast("timestamp_ntz").as("w_start"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy("w_start", "event_type")
      },
      Some(s"""WITH e AS (SELECT $TsSql AS t, event_type, value FROM events),
             x AS (SELECT unnest([date_trunc('day', t) - INTERVAL 1 DAY,
                                  date_trunc('day', t)]) AS w_start,
                          event_type, value
                   FROM e)
             SELECT w_start, event_type, count(*) AS n,
                    round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
             FROM x GROUP BY 1, 2 ORDER BY w_start, event_type""")),

    // ----------------------------------------------------------------
    // Session windows (gap-based) per user — expressible relationally
    // as gap > threshold ⇒ new session (lag + cumulative sum), so the
    // oracle can check the exact session assignment Spark's
    // session_window would produce (30-minute gap).
    Q("es_session_window",
      (s, d) => {
        val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wCum = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
          .withColumn("gap_new",
            when(col("prev_us").isNull, 1)
              .when(unix_micros(col("ts")) - col("prev_us") > 30L * 60 * 1000000, 1)
              .otherwise(0))
          .withColumn("session_id", sum(col("gap_new")).over(wCum))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            min(unix_micros(col("ts"))).as("session_start_us"),
            max(unix_micros(col("ts"))).as("session_end_us"))
          .orderBy("user_id", "session_id")
      },
      Some(s"""WITH g AS (
               SELECT user_id, event_id, epoch_us($TsSql) AS us,
                      CASE WHEN epoch_us($TsSql) -
                           lag(epoch_us($TsSql))
                             OVER (PARTITION BY user_id ORDER BY $TsSql, event_id)
                           > 30 * 60 * 1000000 THEN 1
                           WHEN lag(epoch_us($TsSql))
                             OVER (PARTITION BY user_id ORDER BY $TsSql, event_id)
                           IS NULL THEN 1 ELSE 0 END AS gap_new
               FROM events),
             s AS (
               SELECT user_id, us,
                      CAST(sum(gap_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
               FROM g)
             SELECT user_id, session_id, count(*) AS n_events,
                    min(us) AS session_start_us, max(us) AS session_end_us
             FROM s GROUP BY user_id, session_id
             ORDER BY user_id, session_id""")),

    // ----------------------------------------------------------------
    // As-of join (the classic "operator Spark lacks" — composed from
    // builtins per the preference order: union + keyed window
    // carry-forward, ONE shuffle on user_id, no per-row subquery, no
    // range explosion). Each purchase is matched to the user's most
    // recent STRICTLY-earlier click; clicks deduped to one per
    // (user, ts) so the match is total. Oracle: DuckDB's native
    // ASOF LEFT JOIN.
    Q("es_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("click_id"))
          .select(col("user_id"), col("ts"), lit(1).as("kind"),
            col("click_id"), lit(null).cast("long").as("purchase_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(0).as("kind"),
            lit(null).cast("long").as("click_id"), col("event_id").as("purchase_id"))
        // sort (ts, kind): purchases (0) sort BEFORE same-ts clicks (1),
        // so a click at exactly the purchase timestamp is excluded —
        // the strict `p.ts > c.ts` ASOF semantics.
        val w = Window.partitionBy("user_id").orderBy("ts", "kind")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        clicks.unionByName(purchases)
          .withColumn("last_click", last(col("click_id"), ignoreNulls = true).over(w))
          .filter(col("kind") === 0)
          .select(col("purchase_id"),
            coalesce(col("last_click"), lit(-1L)).as("last_click_id"))
          .orderBy("purchase_id")
      },
      Some(s"""WITH c AS (
               SELECT user_id, ts, max(event_id) AS click_id
               FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
             SELECT p.event_id AS purchase_id,
                    coalesce(c.click_id, -1) AS last_click_id
             FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts > c.ts
             ORDER BY purchase_id""")),

    // ----------------------------------------------------------------
    // Exact interpolated percentiles (extension surface): Spark
    // percentile() ≡ DuckDB quantile_cont (both linear-interpolated
    // over the sorted set); rounded to absorb interpolation-order lsb.
    Q("es_percentiles",
      (s, d) => {
        Tables.events(s, d)
          .groupBy("event_type")
          .agg(
            round(expr("percentile(value, 0.5)"), 4).as("p50"),
            round(expr("percentile(value, 0.9)"), 4).as("p90"),
            round(expr("percentile(value, 0.99)"), 4).as("p99"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type,
             round(quantile_cont(value, 0.5), 4) AS p50,
             round(quantile_cont(value, 0.9), 4) AS p90,
             round(quantile_cont(value, 0.99), 4) AS p99
             FROM events GROUP BY event_type ORDER BY event_type""")),

    // ----------------------------------------------------------------
    // Pivot (long→wide reshaping — the per-entity feature-vector
    // construction step of training-data pipelines). Spark's pivot
    // compiles to conditional aggregation; the oracle states that
    // desugared form explicitly.
    Q("es_pivot_event_counts",
      (s, d) => {
        Tables.events(s, d)
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
          .count()
          .na.fill(0L)
          .withColumnsRenamed(Map(
            "click" -> "n_click", "view" -> "n_view", "purchase" -> "n_purchase",
            "signup" -> "n_signup", "error" -> "n_error"))
          .orderBy("user_id")
      },
      Some(s"""SELECT user_id,
             count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
             count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
             count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
             count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
             count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
             FROM events GROUP BY user_id ORDER BY user_id""")),

    // ----------------------------------------------------------------
    // Sketch aggregates (extension surface): approximate distinct
    // cardinality and approximate quantiles, the constant-memory forms
    // of es_a_distinct_users / es_percentiles for 100 TB streams.
    //
    // HLL/KLL sketch INTERNALS are engine-specific, so raw estimates
    // cannot hash-match DuckDB. Instead the query emits its own
    // error-bound attestation: exact values plus one boolean per
    // estimate, true iff the sketch landed inside its DOCUMENTED error
    // (HLL: 3·rsd relative, rsd = 0.05 default; approx_percentile:
    // ±0.01 rank). The oracle computes the exact values and literal
    // TRUEs — a sketch drifting out of bounds breaks the hash match,
    // so the driver row carries a real rows+bounds check rather than
    // rows-only. The exact twins cost one extra aggregation pass here;
    // at 100 TB a user runs the sketch alone — the attested form is
    // the verification query.
    Q("es_approx_sketches",
      (s, d) => {
        val ev = Tables.events(s, d)
        val sk = ev.groupBy("event_type")
          .agg(
            approx_count_distinct(col("user_id")).as("approx_users"),
            expr("approx_percentile(value, array(0.5, 0.99), 10000)").as("aq"),
            count_distinct(col("user_id")).as("exact_users"),
            count(col("value")).as("n_vals"))
          .select(col("event_type"), col("exact_users"), col("approx_users"),
            col("aq").getItem(0).as("ap50"), col("aq").getItem(1).as("ap99"),
            col("n_vals"))
        // exact rank of each approximate quantile (one more pass over
        // events, broadcast of the per-type sketch row)
        val ranks = ev.join(broadcast(sk.select("event_type", "ap50", "ap99")),
            "event_type")
          .groupBy("event_type")
          .agg(
            sum(when(col("value") < col("ap50"), 1L).otherwise(0L)).as("lt50"),
            sum(when(col("value") <= col("ap50"), 1L).otherwise(0L)).as("le50"),
            sum(when(col("value") < col("ap99"), 1L).otherwise(0L)).as("lt99"),
            sum(when(col("value") <= col("ap99"), 1L).otherwise(0L)).as("le99"))
        val eps = 0.01 // documented rank tolerance (accuracy = 10000, plus slack)
        sk.join(ranks, "event_type")
          .select(col("event_type"), col("exact_users"),
            (abs(col("approx_users") - col("exact_users")).cast("double") <=
              greatest(lit(1.0), col("exact_users") * 3 * 0.05)).as("hll_within"),
            coalesce(col("lt50") <= ceil(lit(0.5 + eps) * col("n_vals")) &&
              col("le50") >= floor(lit(0.5 - eps) * col("n_vals")), lit(true)).as("p50_ok"),
            coalesce(col("lt99") <= ceil(lit(0.99 + eps) * col("n_vals")) &&
              col("le99") >= floor(lit(0.99 - eps) * col("n_vals")), lit(true)).as("p99_ok"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, count(DISTINCT user_id) AS exact_users,
             TRUE AS hll_within, TRUE AS p50_ok, TRUE AS p99_ok
             FROM events GROUP BY event_type ORDER BY event_type""")),

    // ----------------------------------------------------------------
    // F10: sequence generator + explode (reference generate_series,
    // test_stress_conditions.sql:38).
    Q("es_f10_sequence",
      (s, d) => {
        Tables.events(s, d)
          .select("user_id").distinct()
          .filter(col("user_id") < 50)
          .select(col("user_id"),
            explode(sequence(lit(1), pmod(col("user_id"), lit(5)) + 1)).as("s"))
          .orderBy("user_id", "s")
      },
      Some(s"""SELECT user_id, s
             FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 50),
                  UNNEST(generate_series(1, user_id % 5 + 1)) AS t(s)
             ORDER BY user_id, s""")),

    // ----------------------------------------------------------------
    // SCD2 (slowly-changing-dimension type-2) interval builder: turn
    // the per-user event stream into a validity-interval dimension —
    // the standard event-log → warehouse-dimension op. Consecutive
    // events with the SAME state (event_type here) compact into one
    // interval (classic SCD2 change capture): keep only change rows
    // (state ≠ previous state), then valid_to = next change's
    // valid_from; the open interval (valid_to IS NULL) is current.
    // Scale: both windows share ONE partitioning (user_id) — a single
    // shuffle, no self-join, each user's history sorted independently;
    // at 100 TB this is a hash-partition by entity plus a per-entity
    // sort, the same shape any CDC compaction job runs.
    Q("es_scd2_intervals",
      (s, d) => {
        val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_type").as("state"),
            col("ts"), col("event_id"))
          .withColumn("prev_state", lag(col("state"), 1).over(wOrd))
          .filter(col("prev_state").isNull || col("state") =!= col("prev_state"))
          .withColumn("valid_to_raw", lead(col("ts"), 1).over(wOrd))
          .select(col("user_id"), col("state"),
            col("ts").cast("timestamp_ntz").as("valid_from"),
            col("valid_to_raw").cast("timestamp_ntz").as("valid_to"),
            col("valid_to_raw").isNull.as("is_current"))
          // valid_to as the final sort key makes the presentation order
          // a total one even when (user_id, ts) duplicates put two
          // change rows at the same (valid_from, state) — without it
          // the engines could legally emit those rows swapped
          // (order-sensitive oracle compare). NULLS LAST to match
          // DuckDB's default ascending placement.
          .orderBy(col("user_id"), col("valid_from"), col("state"),
            col("valid_to").asc_nulls_last)
      },
      Some(s"""WITH e AS (
               SELECT user_id, event_type AS state, $TsSql AS ts, event_id,
                      lag(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS prev_state
               FROM events),
             chg AS (
               SELECT user_id, state, ts, event_id FROM e
               WHERE prev_state IS NULL OR state <> prev_state)
             SELECT user_id, state, ts AS valid_from,
                    lead(ts) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS valid_to,
                    (lead(ts) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) IS NULL) AS is_current
             FROM chg ORDER BY user_id, valid_from, state, valid_to"""))
  )
}
