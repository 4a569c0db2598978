package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.ops.{Graph, Relational}
import graft.streaming.EventStreams

/** Events-table (time-series) + multimodal queries. The event rollup
  * and sessionization are the batch twins of the Structured Streaming
  * pipelines in graft.streaming — same transforms, static source — so
  * the oracle pins the semantics the stream must reproduce.
  */
object EventQueries {
  import Tables._

  val defs: Seq[QueryDef] = Seq(

    // hourly windowed rollup (batch twin of EventStreams.hourlyRollup)
    QueryDef("q_event_window",
      Some("""WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
              SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_start,
                     event_type, count(*) AS n,
                     CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                       AS value_cents
              FROM e GROUP BY 1, 2 ORDER BY hour_start, event_type"""),
      (s, d) => EventStreams.hourlyRollup(events(s, d), streaming = false)
        .orderBy("hour_start", "event_type")),

    // lag/lead offset windows: each event with its user's previous and
    // next event ids plus the inter-event gap in micros — the
    // event-stream delta every funnel/latency analysis starts from
    // (first/last rows carry NULL offsets on both engines)
    QueryDef("q_lag_lead",
      Some("""SELECT event_id, user_id,
                lag(event_id) OVER w AS prev_event,
                lead(event_id) OVER w AS next_event,
                CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER w AS BIGINT)
                  AS gap_us
              FROM events
              WINDOW w AS (PARTITION BY user_id
                ORDER BY epoch_us(ts), event_id)
              ORDER BY event_id"""),
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts")), col("event_id"))
        events(s, d).select(col("event_id"), col("user_id"),
          lag(col("event_id"), 1).over(w).as("prev_event"),
          lead(col("event_id"), 1).over(w).as("next_event"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
            .cast("long").as("gap_us"))
          .orderBy("event_id")
      }),

    // recency-decayed per-user activity score: each event is worth
    // 1e6 / 2^(age_days div 7) ppm as of the fixture's last day — the
    // recency-weighted popularity feature, in EXACT integer
    // arithmetic (ppm DIV a power of two) so the sum is order- and
    // engine-portable. Weight is map-side; one partially-aggregated
    // shuffle on user_id
    QueryDef("q_decay_score",
      Some("""WITH e AS (SELECT user_id,
                  least(greatest(date_diff('day', CAST(ts AS DATE),
                    DATE '2024-01-31'), 0) // 7, 62) AS k
                FROM events)
              SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(1000000 // CAST(power(2, k) AS BIGINT)) AS BIGINT)
                  AS score_ppm
              FROM e GROUP BY 1 ORDER BY user_id"""),
      (s, d) => graft.ops.Cohorts.decayScore(events(s, d),
          "user_id", "ts", asOf = "2024-01-31", halfLifeDays = 7)
        .orderBy("user_id")),

    // weighted PageRank over the page-transition graph (consecutive
    // events per user -> src/dst page edges weighted by transition
    // count), 3 iterations, damping 85/100. ALL-INTEGER nanorank
    // arithmetic (multiply + truncating DIV + integer sums) makes the
    // iteration order- and engine-exact — the oracle replays it as
    // three chained CTEs and the hash must agree bit-for-bit
    QueryDef("q_pagerank",
      // page IS NOT NULL before the transition window in BOTH engines:
      // TRY_CAST hardening turns corrupt/missing props into NULL pages,
      // and an unfiltered NULL would survive as a graph NODE (null-src
      // edges pass dst IS NOT NULL; nodes = src UNION dst keeps NULL)
      // whose final-ORDER-BY tiebreak Spark (NULLS FIRST) and DuckDB
      // (NULLS LAST) break oppositely — a latent hash divergence
      // whenever the tie group reaches the LIMIT. Semantics of the
      // pre-window filter: a corrupt event is DROPPED from the user's
      // session sequence, so its two valid neighbors become adjacent
      // and contribute a prev→next transition edge (both engines
      // filter identically, so parity holds; a row_number guard would
      // be the alternative if bridging across corrupt events were not
      // intended).
      Some("""WITH ev0 AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
                  TRY_CAST(json_extract_string(TRY_CAST(props AS JSON),
                    '$.k') AS BIGINT) AS page
                FROM events),
              ev AS (SELECT * FROM ev0 WHERE page IS NOT NULL),
              tr AS (SELECT page AS src,
                  lead(page) OVER (PARTITION BY user_id
                    ORDER BY tus, event_id) AS dst
                FROM ev),
              e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
                FROM tr WHERE dst IS NOT NULL GROUP BY src, dst),
              nodes AS (SELECT src AS node FROM e
                        UNION SELECT dst FROM e),
              prm AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
              outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ww
                FROM e GROUP BY src),
              pr0 AS (SELECT node,
                  1000000000 // (SELECT n FROM prm) AS rank FROM nodes),
              it1 AS (SELECT nd.node,
                  (CAST(1000000000 AS BIGINT) * 15) // (100 * (SELECT n FROM prm)) +
                    (85 * COALESCE(s.s, 0)) // 100 AS rank
                FROM nodes nd LEFT JOIN (
                  SELECT e.dst AS node,
                    CAST(sum((p.rank * e.w) // o.ww) AS BIGINT) AS s
                  FROM e JOIN outw o ON e.src = o.src
                    JOIN pr0 p ON e.src = p.node
                  GROUP BY e.dst) s ON nd.node = s.node),
              it2 AS (SELECT nd.node,
                  (CAST(1000000000 AS BIGINT) * 15) // (100 * (SELECT n FROM prm)) +
                    (85 * COALESCE(s.s, 0)) // 100 AS rank
                FROM nodes nd LEFT JOIN (
                  SELECT e.dst AS node,
                    CAST(sum((p.rank * e.w) // o.ww) AS BIGINT) AS s
                  FROM e JOIN outw o ON e.src = o.src
                    JOIN it1 p ON e.src = p.node
                  GROUP BY e.dst) s ON nd.node = s.node),
              it3 AS (SELECT nd.node,
                  (CAST(1000000000 AS BIGINT) * 15) // (100 * (SELECT n FROM prm)) +
                    (85 * COALESCE(s.s, 0)) // 100 AS rank
                FROM nodes nd LEFT JOIN (
                  SELECT e.dst AS node,
                    CAST(sum((p.rank * e.w) // o.ww) AS BIGINT) AS s
                  FROM e JOIN outw o ON e.src = o.src
                    JOIN it2 p ON e.src = p.node
                  GROUP BY e.dst) s ON nd.node = s.node)
              SELECT node AS page, CAST(rank AS BIGINT) AS rank
              FROM it3 ORDER BY rank DESC, page LIMIT 20"""),
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts")), col("event_id"))
        val ev = events(s, d).select(col("user_id"), col("event_id"),
          col("ts"),
          expr("TRY_CAST(get_json_object(props, '$.k') AS BIGINT)")
            .as("page"))
          .filter(col("page").isNotNull)
        val edges = ev.select(col("page").as("src"),
            lead(col("page"), 1).over(w).as("dst"))
          .where(col("dst").isNotNull)
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        Graph.pageRank(edges, "src", "dst", "w", iters = 3)
          .select(col("node").as("page"), col("rank"))
          .orderBy(col("rank").desc, col("page"))
          .limit(20)
      }),

    // per-node triangle counts over the (undirected) page-transition
    // graph — id-oriented node-iterator join, every triangle closed
    // exactly once from its smallest vertex; exact integer counts
    QueryDef("q_triangles",
      Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
                  TRY_CAST(json_extract_string(TRY_CAST(props AS JSON),
                    '$.k') AS BIGINT) AS page
                FROM events),
              tr AS (SELECT page AS src,
                  lead(page) OVER (PARTITION BY user_id
                    ORDER BY tus, event_id) AS dst
                FROM ev),
              und AS (SELECT DISTINCT least(src, dst) AS a,
                  greatest(src, dst) AS b
                FROM tr WHERE dst IS NOT NULL AND src <> dst),
              wed AS (SELECT ab.a, ab.b, bc.b AS c
                FROM und ab JOIN und bc ON ab.b = bc.a),
              tri AS (SELECT w.a, w.b, w.c FROM wed w
                JOIN und ac ON ac.a = w.a AND ac.b = w.c)
              SELECT node AS page,
                CAST(count(*) AS BIGINT) AS n_triangles
              FROM (SELECT unnest([a, b, c]) AS node FROM tri)
              GROUP BY node ORDER BY n_triangles DESC, page LIMIT 20"""),
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts")), col("event_id"))
        val tr = events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"),
            expr("TRY_CAST(get_json_object(props, '$.k') AS BIGINT)")
            .as("page"))
          .select(col("page").as("src"),
            lead(col("page"), 1).over(w).as("dst"))
          .where(col("dst").isNotNull)
        Graph.triangleCounts(tr, "src", "dst")
          .select(col("node").as("page"), col("n_triangles"))
          .orderBy(col("n_triangles").desc, col("page"))
          .limit(20)
      }),

    // ordered step funnel: users reaching view -> later click -> later
    // purchase. Each stage is one keyed agg + join on user_id (min
    // timestamp AFTER the previous stage's min) — the standard funnel
    // over billions of events without any per-user event sorting
    QueryDef("q_funnel",
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus
                FROM events),
              s1 AS (SELECT user_id, min(tus) AS t1 FROM ev
                WHERE event_type = 'view' GROUP BY 1),
              s2 AS (SELECT e.user_id, min(e.tus) AS t2
                FROM ev e JOIN s1 USING (user_id)
                WHERE e.event_type = 'click' AND e.tus > s1.t1 GROUP BY 1),
              s3 AS (SELECT e.user_id, min(e.tus) AS t3
                FROM ev e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.tus > s2.t2 GROUP BY 1)
              SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_view,
                     (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click,
                     (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase"""),
      (s, d) => {
        val ev = events(s, d).select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"))
        val s1 = ev.where(col("event_type") === "view")
          .groupBy("user_id").agg(min("tus").as("t1"))
        val s2 = ev.where(col("event_type") === "click").join(s1, "user_id")
          .where(col("tus") > col("t1"))
          .groupBy("user_id").agg(min("tus").as("t2"))
        val s3 = ev.where(col("event_type") === "purchase").join(s2, "user_id")
          .where(col("tus") > col("t2"))
          .groupBy("user_id").agg(min("tus").as("t3"))
        s1.agg(count(lit(1)).as("n_view"))
          .crossJoin(s2.agg(count(lit(1)).as("n_click")))
          .crossJoin(s3.agg(count(lit(1)).as("n_purchase")))
      }),

    // trailing 7-day rolling distinct actives (WAU per day): each
    // (user, active-day) contributes to 7 report days via a bounded
    // 7-way explode, then one count-distinct per day — rolling
    // DISTINCT can't ride a window frame, and the explode form keeps
    // it one keyed aggregate at any scale. Report days are restricted
    // to days with actual activity
    QueryDef("q_rolling_dau",
      Some("""WITH act AS (SELECT DISTINCT user_id,
                  CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                    AS day
                FROM events),
              days AS (SELECT DISTINCT day FROM act),
              contrib AS (SELECT a.user_id, a.day + CAST(f.o AS INT) AS cday
                FROM act a CROSS JOIN
                  (SELECT unnest(range(0, 7)) AS o) f)
              SELECT c.cday AS day,
                CAST(count(DISTINCT c.user_id) AS BIGINT) AS wau
              FROM contrib c JOIN days d ON c.cday = d.day
              GROUP BY 1 ORDER BY day"""),
      (s, d) => {
        val act = events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val days = act.select(col("day").as("cday")).distinct()
        act.select(col("user_id"),
            explode(sequence(lit(0), lit(6))).as("o"), col("day"))
          .select(col("user_id"), date_add(col("day"), col("o")).as("cday"))
          .join(days, "cday")
          .groupBy("cday").agg(countDistinct("user_id").as("wau"))
          .select(col("cday").as("day"), col("wau"))
          .orderBy("day")
      }),

    // gap-based sessionization, batch formulation: lag -> gap flag ->
    // running sum = session seq (oracle twin of the stateful stream)
    QueryDef("q_event_sessions",
      Some("""WITH e AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
              marked AS (
                SELECT user_id, event_id, ts,
                  CASE WHEN lag(ts) OVER w IS NULL THEN 1
                       WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1
                       ELSE 0 END AS new_session
                FROM e
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              ), sess AS (
                SELECT user_id, ts,
                  CAST(sum(new_session) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS INT) AS session_seq
                FROM marked)
              SELECT user_id, session_seq, count(*) AS n_events,
                     CAST(min(ts) AS VARCHAR) AS start_ts,
                     CAST(max(ts) AS VARCHAR) AS end_ts
              FROM sess GROUP BY 1, 2 ORDER BY user_id, session_seq"""),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d)
          .withColumn("prev_ts", lag("ts", 1).over(w))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 1800000000L, 1)
              .otherwise(0))
          .withColumn("session_seq", sum("new_session").over(wRun).cast("int"))
          .groupBy("user_id", "session_seq")
          .agg(count(lit(1)).as("n_events"),
            min("ts").cast("string").as("start_ts"),
            max("ts").cast("string").as("end_ts"))
          .orderBy("user_id", "session_seq")
      }),

    // event funnel: per-user ordered event_type path (first 5 events)
    QueryDef("q_event_paths",
      Some("""SELECT user_id,
                     array_to_string((list(event_type ORDER BY ts, event_id))[1:5],
                       '>') AS path5
              FROM events GROUP BY user_id ORDER BY user_id"""),
      // (ns vs µs irrelevant here: ordering is preserved by the cast)
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .groupBy("user_id")
          .agg(array_join(
            transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
              x => x.getField("event_type")), ">").as("path5"))
          .orderBy("user_id")
      }),

    // JSON column surface (SURVEY.md §2.12 — unused by the reference,
    // standard for event pipelines): extract + filter on a JSON field
    QueryDef("q_json_extract",
      Some("""SELECT event_id,
                     TRY_CAST(json_extract_string(TRY_CAST(props AS JSON),
                       '$.k') AS INT) AS k_val,
                     json_extract_string(TRY_CAST(props AS JSON), '$.missing') AS missing
              FROM events
              WHERE TRY_CAST(json_extract_string(TRY_CAST(props AS JSON),
                      '$.k') AS INT) >= 50
              ORDER BY event_id"""),
      (s, d) => events(s, d)
        .select(col("event_id"),
          expr("TRY_CAST(get_json_object(props, '$.k') AS INT)").as("k_val"),
          get_json_object(col("props"), "$.missing").as("missing"))
        .filter(col("k_val") >= 50)
        .orderBy("event_id")),

    // VARIANT surface (Spark 4 semi-structured type): parse once into
    // the binary VARIANT encoding, then typed path extraction — at
    // scale this replaces per-path get_json_object re-parses of the
    // same string (N paths = N parses) with one parse + cheap binary
    // navigation. Missing paths come back null, not an error — and so
    // do MALFORMED documents and non-castable values (try_parse_json /
    // try_variant_get; the adversarial events fixture carries both): a
    // corrupt props row must degrade to nulls, not kill a 100 TB scan
    QueryDef("q_variant",
      Some("""SELECT event_id,
                     TRY_CAST(json_extract_string(TRY_CAST(props AS JSON),
                       '$.k') AS BIGINT) AS k_int,
                     json_extract_string(TRY_CAST(props AS JSON), '$.k') AS k_str,
                     json_extract_string(TRY_CAST(props AS JSON), '$.missing') AS missing
              FROM events ORDER BY event_id"""),
      // sort-first (r16, guide §1.2; see q_mask_tokens): the ORDER BY's
      // range-sampling job re-executes its child, so the VARIANT parse
      // sits above the sort and parses each props string once
      (s, d) => {
        val v = try_parse_json(col("props"))
        events(s, d)
          .select(col("event_id"), col("props"))
          .orderBy("event_id")
          .withColumn("v", v)
          .select(col("event_id"),
            try_variant_get(col("v"), "$.k", "bigint").as("k_int"),
            try_variant_get(col("v"), "$.k", "string").as("k_str"),
            try_variant_get(col("v"), "$.missing", "string").as("missing"))
      }),

    // forward fill (fill_null(strategy="forward")): value is observed
    // only on purchase events; every later event of the same user
    // carries the last purchase amount forward (null before the first
    // purchase). Window order (ts, event_id) is total, so the fill is
    // deterministic; one window shuffle on user_id
    QueryDef("q_ffill",
      Some("""SELECT event_id, user_id,
                last_value(CASE WHEN event_type = 'purchase' THEN value
                           END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS carried
              FROM events ORDER BY event_id"""),
      (s, d) => Relational.forwardFill(
          events(s, d).withColumn("carried",
            when(col("event_type") === "purchase", col("value"))),
          Seq("user_id"), Seq(col("ts"), col("event_id")), "carried")
        .select("event_id", "user_id", "carried")
        .orderBy("event_id")),

    // quantiles: interpolated percentiles (describe()/summary() family)
    QueryDef("q_quantiles",
      Some("""SELECT event_type,
                     quantile_cont(value, 0.5) AS p50,
                     quantile_cont(value, 0.9) AS p90
              FROM events GROUP BY 1 ORDER BY event_type"""),
      (s, d) => events(s, d)
        .groupBy("event_type")
        .agg(percentile(col("value"), lit(0.5)).as("p50"),
          percentile(col("value"), lit(0.9)).as("p90"))
        .orderBy("event_type")),

    // partitioned parquet sink + partition-pruned re-read: the scan of
    // the re-read must show PartitionFilters, not a full scan
    QueryDef("q_partitioned_sink",
      Some("""SELECT event_type, count(*) AS n,
                     CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                       AS cents
              FROM events WHERE event_type IN ('click', 'view')
              GROUP BY 1 ORDER BY event_type"""),
      (s, d) => {
        val dir = s"/tmp/graft_events_part/${Tables.tmpKey(d)}"
        events(s, d).withColumn("cents", floor(col("value") * 100 + 0.5))
          .write.mode("overwrite").partitionBy("event_type").parquet(dir)
        s.read.parquet(dir)
          .filter(col("event_type").isin("click", "view"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
          .orderBy("event_type")
      }),

    // multimodal: binary payload + metadata plumbing (oracle-expressible
    // slice; the batched decode stub is rows-only + unit-tested)
    QueryDef("q_media_summary",
      Some("""SELECT doc_id, 'text/plain' AS mime,
                     octet_length(encode(text)) AS n_bytes,
                     md5(text) AS payload_md5, lang AS tag
              FROM documents ORDER BY doc_id"""),
      (s, d) => Multimodal.mediaSummary(documents(s, d)).orderBy("doc_id")),

    // multimodal: every-kth-frame sampling over the binary payload
    // (64-byte frames, stride 4) — byte ranges and md5s must agree
    // with the oracle's substring slicing exactly
    QueryDef("q_frame_sample",
      Some("""WITH m AS (SELECT doc_id, hex(encode(text)) AS hx,
                       octet_length(encode(text)) AS n_bytes
                         FROM documents),
              f AS (SELECT doc_id, CAST(n_bytes AS INT) AS n_bytes,
                      list_transform(
                        list_filter(
                          range(0, CAST(ceil(n_bytes/64.0) AS INT)),
                          i -> i % 4 = 0),
                        i -> md5(substring(hx, CAST(i*128+1 AS INT), 128)))
                        AS fr
                    FROM m)
              SELECT doc_id, n_bytes,
                     CAST(len(fr) AS BIGINT) AS n_sampled,
                     fr[1] AS first_frame_md5
              FROM f ORDER BY doc_id"""),
      // DuckDB can't slice BLOBs, so the comparison goes through hex:
      // frame i of the binary == hex chars [i*128, i*128+128) (2 hex
      // chars per byte, both engines uppercase)
      // sort-first (r16, guide §1.2; see q_mask_tokens): asMedia and
      // the frame sampler are pure map-side projections
      (s, d) => Multimodal.asMedia(
          documents(s, d).select(col("doc_id"), col("text"), col("lang"))
            .orderBy("doc_id"))
        .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
          Multimodal.sampleFrames(col("payload"), 64, 4).as("frames"))
        .select(col("doc_id"), col("n_bytes"),
          size(col("frames")).cast("long").as("n_sampled"),
          md5(hex(try_element_at(col("frames"), lit(1)))).as("first_frame_md5"))),

    // multimodal: batched decode stub (mapPartitions). Fully oracled:
    // the stub's feature i is u16(md5[2i..2i+1])/65535f, so multiplying
    // back and rounding recovers the exact integer (float32 round-trip
    // error < 0.004 « 0.5); DuckDB rebuilds the same u16 from the md5
    // hex digits via strpos arithmetic.
    QueryDef("q_media_features",
      Some("""WITH m AS (
                SELECT doc_id, md5(text) AS h,
                       octet_length(encode(text)) AS n_bytes
                FROM documents),
              d AS (
                SELECT doc_id, n_bytes,
                  (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096 +
                  (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256 +
                  (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16 +
                  (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) AS f0_u16
                FROM m)
              SELECT doc_id, n_bytes, CAST(f0_u16 AS BIGINT) AS f0_u16
              FROM d ORDER BY doc_id"""),
      (s, d) => Multimodal.decodeStub(s, Multimodal.asMedia(documents(s, d)))
        .toDF().select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
          floor(element_at(col("features"), 1) * 65535.0 + 0.5).cast("long")
            .as("f0_u16"))
        .orderBy("doc_id")),

    // multimodal near-dup: 64-bit perceptual aHash over REAL DECODED
    // pixels — each doc is wrapped into a genuine binary PGM ("P5")
    // payload (dims vary per doc_id, raster = the text's UTF-8 bytes
    // repeated), PgmAHashBands parses the header and average-pools the
    // pixel grid to 8×8 luma, then LSH-bucketed on 4 sixteen-bit
    // bands — candidates meet on an equi key, never all-pairs — then
    // exact hamming <= 6 verify, sketch carried through the join (the
    // image twin of q_dedup_simhash). The 8×8 pooling makes the hash
    // resolution-independent: the same byte stream rasterized 8x8 and
    // 16x16 still meets. The oracle never builds the payload — it
    // replays the decode's byte-walk (pixel i = utf8(text)[i mod nb],
    // parsed out of the hex dump) and every pooling/threshold step in
    // integer arithmetic.
    QueryDef("q_media_phash",
      Some("""WITH base AS (SELECT doc_id,
                       CAST(8 + (doc_id % 3) * 4 AS BIGINT) AS w,
                       CAST(8 + (doc_id % 2) * 8 AS BIGINT) AS h,
                       hex(encode(text)) AS hx,
                       CAST(octet_length(encode(text)) AS BIGINT) AS nb
                     FROM documents WHERE len(text) > 0),
              px AS (SELECT doc_id, w, h, w*h AS npix, CAST(t.i AS BIGINT) AS i,
                       CAST((strpos('0123456789ABCDEF',
                               substr(hx, CAST((t.i % nb)*2+1 AS INT), 1)) - 1) * 16 +
                            (strpos('0123456789ABCDEF',
                               substr(hx, CAST((t.i % nb)*2+2 AS INT), 1)) - 1)
                         AS BIGINT) AS v
                     FROM base, unnest(range(0, w*h)) AS t(i)),
              seg AS (SELECT doc_id, npix,
                        ((i // w) * 8 // h) * 8 + ((i % w) * 8 // w) AS s, v
                      FROM px),
              tot AS (SELECT doc_id, npix, sum(v) AS total
                      FROM seg GROUP BY doc_id, npix),
              sa AS (SELECT doc_id, s, sum(v) AS sv, count(*) AS sc
                     FROM seg GROUP BY doc_id, s),
              bits AS (SELECT sa.doc_id, sa.s,
                        CASE WHEN sa.sv * t.npix > t.total * sa.sc
                             THEN 1 ELSE 0 END AS bit
                       FROM sa JOIN tot t ON t.doc_id = sa.doc_id),
              bands AS (SELECT doc_id, CAST(s // 16 AS INT) AS b,
                         CAST(sum(bit * CAST(power(2, s % 16) AS BIGINT))
                           AS BIGINT) AS v
                        FROM bits GROUP BY doc_id, b),
              hb AS (SELECT doc_id, list(v ORDER BY b) AS bands
                     FROM bands GROUP BY doc_id),
              e AS (SELECT doc_id, b, v FROM bands),
              cand AS (SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
                       FROM e a JOIN e bb
                         ON a.b = bb.b AND a.v = bb.v
                        AND a.doc_id < bb.doc_id),
              hm AS (SELECT c.id_a, c.id_b,
                       CAST(bit_count(xor(ha.bands[1], hc.bands[1])) +
                            bit_count(xor(ha.bands[2], hc.bands[2])) +
                            bit_count(xor(ha.bands[3], hc.bands[3])) +
                            bit_count(xor(ha.bands[4], hc.bands[4]))
                         AS BIGINT) AS hamming
                     FROM cand c
                     JOIN hb ha ON ha.doc_id = c.id_a
                     JOIN hb hc ON hc.doc_id = c.id_b)
              SELECT id_a, id_b, hamming FROM hm WHERE hamming <= 6
              ORDER BY id_a, id_b"""),
      (s, d) => {
        val wc = (lit(8) + pmod(col("doc_id"), lit(3)) * 4).cast("int")
        val hc = (lit(8) + pmod(col("doc_id"), lit(2)) * 8).cast("int")
        val ah = graft.ops.StageCache.persisted(
          documents(s, d).filter(length(col("text")) > 0)
            .select(col("doc_id"),
              Multimodal.pgmAHash(
                Multimodal.asPgm(col("text"), wc, hc)).as("bands"))
            .filter(col("bands").isNotNull))
        val e = ah.select(col("doc_id"),
          posexplode(col("bands")).as(Seq("b", "v")))
        val cand = e.select(col("b"), col("v"), col("doc_id").as("id_a"))
          .join(e.select(col("b"), col("v"), col("doc_id").as("id_b")),
            Seq("b", "v"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct()
        val hamming = (0 until 4).map(i =>
          bit_count(element_at(col("ba"), i + 1)
            .bitwiseXOR(element_at(col("bb"), i + 1)))).reduce(_ + _)
        cand
          .join(ah.select(col("doc_id").as("id_a"), col("bands").as("ba")),
            Seq("id_a"))
          .join(ah.select(col("doc_id").as("id_b"), col("bands").as("bb")),
            Seq("id_b"))
          .withColumn("hamming", hamming.cast("long"))
          .filter(col("hamming") <= 6)
          .select("id_a", "id_b", "hamming")
          .orderBy("id_a", "id_b")
      })
  )
}
