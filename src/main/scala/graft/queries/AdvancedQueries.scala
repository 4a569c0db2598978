package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.TemporalJoins
import graft.similarity.Quantize
import graft.text.{Scoring, TextAnalysis}

/** Round-3 surface: temporal joins (as-of, range), reshaping
  * (pivot/unpivot/rollup), frame-window aggregates, grouped top-k,
  * BM25 relevance and int8 embedding quantization. Each query pairs a
  * scale-shaped Spark plan with a DuckDB oracle; double-typed scores
  * use a fixed operation order so both engines emit identical bits.
  */
object AdvancedQueries {
  import Tables._

  /** DuckDB fragment mirroring TextAnalysis.dupFraction: fraction of
    * array elements that repeat an earlier element.
    */
  private def dupFracSql(x: String): String =
    s"""CASE WHEN len($x) > 0
          THEN (CAST(len($x) AS DOUBLE) - CAST(len(list_distinct($x)) AS DOUBLE))
               / CAST(len($x) AS DOUBLE)
          ELSE 0.0 END"""

  val defs: Seq[QueryDef] = Seq(

    // as-of join: each purchase matched to the user's latest preceding
    // (or simultaneous) click — union + one window scan, never a range
    // probe (graft.ops.TemporalJoins.asofJoin)
    QueryDef("q_asof_join",
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
                         WHERE event_type = 'purchase'),
              c AS (SELECT user_id, ts AS click_ts, min(event_id) AS click_id
                    FROM events WHERE event_type = 'click' GROUP BY 1, 2)
              SELECT p.event_id, p.user_id, CAST(p.ts AS VARCHAR) AS ts,
                     c.click_id, CAST(c.click_ts AS VARCHAR) AS click_ts,
                     CAST(epoch_us(p.ts) - epoch_us(c.click_ts) AS BIGINT) AS gap_us
              FROM p ASOF LEFT JOIN c
                ON p.user_id = c.user_id AND p.ts >= c.click_ts
              ORDER BY event_id"""),
      (s, d) => {
        val ev = events(s, d)
        val p = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        // dedupe right side per (key, time): asofJoin requires it
        val c = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts").as("click_ts"))
          .agg(min("event_id").as("click_id"))
        TemporalJoins.asofJoin(p, c, Seq("user_id"), "ts", "click_ts",
            Seq("click_id", "click_ts"))
          .select(col("event_id"), col("user_id"),
            col("ts").cast("string").as("ts"), col("click_id"),
            col("click_ts").cast("string").as("click_ts"),
            (unix_micros(col("ts")) - unix_micros(col("click_ts")))
              .cast("long").as("gap_us"))
          .orderBy("event_id")
      }),

    // the SAME as-of semantics through the BROADCAST path: clicks are
    // a small dimension here, so the purchase side is never shuffled —
    // a map-only binary search into the broadcast per-user time index
    // (AsOfBroadcastSpec pins the plan exchange-free). Third member of
    // the as-of family: window-union / native shuffle-merge / broadcast
    QueryDef("q_asof_broadcast",
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
                         WHERE event_type = 'purchase'),
              c AS (SELECT user_id, ts AS click_ts, min(event_id) AS click_id
                    FROM events WHERE event_type = 'click' GROUP BY 1, 2)
              SELECT p.event_id, p.user_id, CAST(p.ts AS VARCHAR) AS ts,
                     c.click_id, CAST(c.click_ts AS VARCHAR) AS click_ts,
                     CAST(epoch_us(p.ts) - epoch_us(c.click_ts) AS BIGINT) AS gap_us
              FROM p ASOF LEFT JOIN c
                ON p.user_id = c.user_id AND p.ts >= c.click_ts
              ORDER BY event_id"""),
      (s, d) => {
        val ev = events(s, d)
        val p = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val c = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts").as("click_ts"))
          .agg(min("event_id").as("click_id"))
        TemporalJoins.asofJoinBroadcast(p, c, Seq("user_id"), "ts",
            "click_ts", Seq("click_id", "click_ts"))
          .select(col("event_id"), col("user_id"),
            col("ts").cast("string").as("ts"), col("click_id"),
            col("click_ts").cast("string").as("click_ts"),
            (unix_micros(col("ts")) - unix_micros(col("click_ts")))
              .cast("long").as("gap_us"))
          .orderBy("event_id")
      }),

    // FORWARD as-of through the native operator: each purchase matched
    // to the user's EARLIEST click at-or-after it (follow-up
    // attribution) — backward as-of on the negated time axis inside
    // the same sorted-merge exec; DuckDB oracles it with ASOF ... <=
    QueryDef("q_asof_fwd",
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
                         WHERE event_type = 'purchase'),
              c AS (SELECT user_id, ts AS click_ts, min(event_id) AS click_id
                    FROM events WHERE event_type = 'click' GROUP BY 1, 2)
              SELECT p.event_id, p.user_id, CAST(p.ts AS VARCHAR) AS ts,
                     c.click_id, CAST(c.click_ts AS VARCHAR) AS click_ts,
                     CAST(epoch_us(c.click_ts) - epoch_us(p.ts) AS BIGINT) AS gap_us
              FROM p ASOF LEFT JOIN c
                ON p.user_id = c.user_id AND p.ts <= c.click_ts
              ORDER BY event_id"""),
      (s, d) => {
        val ev = events(s, d)
        val p = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val c = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts").as("click_ts"))
          .agg(min("event_id").as("click_id"))
        TemporalJoins.asofJoinNative(p, c, Seq("user_id"), "ts", "click_ts",
            Seq("click_id", "click_ts"), direction = "forward")
          .select(col("event_id"), col("user_id"),
            col("ts").cast("string").as("ts"), col("click_id"),
            col("click_ts").cast("string").as("click_ts"),
            (unix_micros(col("click_ts")) - unix_micros(col("ts")))
              .cast("long").as("gap_us"))
          .orderBy("event_id")
      }),

    // the SAME as-of semantics through the NATIVE custom operator
    // (AsOfJoinPlan -> AsOfJoinStrategy -> AsOfJoinExec): one shuffle
    // per side + O(1)-state sorted merge, no union row padding. Same
    // oracle as q_asof_join — the two paths must agree bit-for-bit
    QueryDef("q_asof_native",
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
                         WHERE event_type = 'purchase'),
              c AS (SELECT user_id, ts AS click_ts, min(event_id) AS click_id
                    FROM events WHERE event_type = 'click' GROUP BY 1, 2)
              SELECT p.event_id, p.user_id, CAST(p.ts AS VARCHAR) AS ts,
                     c.click_id, CAST(c.click_ts AS VARCHAR) AS click_ts,
                     CAST(epoch_us(p.ts) - epoch_us(c.click_ts) AS BIGINT) AS gap_us
              FROM p ASOF LEFT JOIN c
                ON p.user_id = c.user_id AND p.ts >= c.click_ts
              ORDER BY event_id"""),
      (s, d) => {
        val ev = events(s, d)
        val p = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val c = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts").as("click_ts"))
          .agg(min("event_id").as("click_id"))
        TemporalJoins.asofJoinNative(p, c, Seq("user_id"), "ts", "click_ts",
            Seq("click_id", "click_ts"))
          .select(col("event_id"), col("user_id"),
            col("ts").cast("string").as("ts"), col("click_id"),
            col("click_ts").cast("string").as("click_ts"),
            (unix_micros(col("ts")) - unix_micros(col("click_ts")))
              .cast("long").as("gap_us"))
          .orderBy("event_id")
      }),

    // range join: line items shipped inside 3-day promo windows around
    // urgent orders — binned equi-join + exact filter, not an
    // interval cross-product (graft.ops.TemporalJoins.rangeJoinBinned)
    QueryDef("q_range_join",
      Some("""WITH w AS (SELECT o_orderkey AS wkey, o_orderdate AS w_start,
                     o_orderdate + INTERVAL 3 DAY AS w_end
                   FROM orders
                   WHERE o_orderpriority = '1-URGENT' AND o_custkey < 150)
              SELECT wkey, CAST(w_start AS VARCHAR) AS w_start,
                     count(*) AS n_items,
                     CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS qty_cents
              FROM w JOIN lineitem
                ON l_shipdate >= w_start AND l_shipdate < w_end
              GROUP BY 1, 2 ORDER BY wkey"""),
      (s, d) => {
        val w = orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_custkey") < 150)
          .select(col("o_orderkey").as("wkey"), col("o_orderdate").as("w_start"),
            expr("o_orderdate + INTERVAL 3 DAY").as("w_end"))
        TemporalJoins.rangeJoinBinned(w, "w_start", "w_end",
            lineitem(s, d).select("l_shipdate", "l_quantity"),
            "l_shipdate", binSeconds = 3 * 86400L)
          .groupBy("wkey", "w_start")
          .agg(count(lit(1)).as("n_items"),
            sum(floor(col("l_quantity") * 100 + 0.5)).cast("long").as("qty_cents"))
          .select(col("wkey"), col("w_start").cast("string").as("w_start"),
            col("n_items"), col("qty_cents"))
          .orderBy("wkey")
      }),

    // LEFT range join: the same windows with a 1-DAY span, so some
    // contain no shipment at all — and STILL appear, zero-counted
    // (binned inner + bare-id anti join; the dead-window report a
    // coverage audit needs). count(l_shipdate) skips the null padding
    QueryDef("q_range_join_left",
      Some("""WITH w AS (SELECT o_orderkey AS wkey, o_orderdate AS w_start,
                     o_orderdate + INTERVAL 1 DAY AS w_end
                   FROM orders
                   WHERE o_orderpriority = '1-URGENT' AND o_custkey < 150)
              SELECT wkey, CAST(w_start AS VARCHAR) AS w_start,
                     CAST(count(l_shipdate) AS BIGINT) AS n_items,
                     CAST(COALESCE(sum(CAST(floor(l_quantity * 100 + 0.5)
                       AS BIGINT)), 0) AS BIGINT) AS qty_cents
              FROM w LEFT JOIN lineitem
                ON l_shipdate >= w_start AND l_shipdate < w_end
              GROUP BY 1, 2 ORDER BY wkey"""),
      (s, d) => {
        val w = orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_custkey") < 150)
          .select(col("o_orderkey").as("wkey"), col("o_orderdate").as("w_start"),
            expr("o_orderdate + INTERVAL 1 DAY").as("w_end"))
        TemporalJoins.rangeJoinBinnedLeft(w, "wkey", "w_start", "w_end",
            lineitem(s, d).select("l_shipdate", "l_quantity"),
            "l_shipdate", binSeconds = 86400L)
          .groupBy("wkey", "w_start")
          .agg(count(col("l_shipdate")).as("n_items"),
            coalesce(sum(floor(col("l_quantity") * 100 + 0.5)).cast("long"),
              lit(0L)).as("qty_cents"))
          .select(col("wkey"), col("w_start").cast("string").as("w_start"),
            col("n_items"), col("qty_cents"))
          .orderBy("wkey")
      }),

    // the same point-in-interval semantics through the PURE SQL
    // surface: the query text writes the bare inequality join every
    // user naturally writes (no equi key -> Spark alone can only plan
    // a nested loop), and RangeBinJoinRule (installed imperatively —
    // the driver session sets no spark.sql.extensions) rewrites it to
    // the binned equi-join at optimization time. The 50 highest-value
    // events open 6 h attribution windows; each window counts and
    // sums every event inside it. RangeBinJoinRuleSpec pins the plan
    // (no nested-loop node survives the rewrite)
    QueryDef("q_range_auto",
      Some("""WITH iv AS (SELECT event_id AS iv_id, ts AS w_start,
                     ts + INTERVAL 6 HOUR AS w_end
                   FROM events ORDER BY value DESC, event_id LIMIT 50)
              SELECT iv_id, CAST(count(*) AS BIGINT) AS n_ev,
                     CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS cents
              FROM iv JOIN events e
                ON e.ts >= iv.w_start AND e.ts < iv.w_end
              GROUP BY iv_id ORDER BY iv_id"""),
      (s, d) => {
        if (!s.experimental.extraOptimizations
            .contains(graft.plans.RangeBinJoinRule))
          s.experimental.extraOptimizations =
            s.experimental.extraOptimizations :+
              graft.plans.RangeBinJoinRule
        // bin = the window length: each interval fans out to <= 2 bins.
        // The conf is scoped to THIS build: the rule reads it at
        // optimization time, so optimize while the conf is set, then
        // restore — no other inequality join on the shared session
        // gets silently re-planned, and RangeBinJoinRuleSpec's
        // conf-off assertions stay order-independent. The REWRITTEN
        // plan is then re-wrapped as the returned frame: merely
        // forcing df.queryExecution.optimizedPlan would cache the
        // rewrite only on that one QueryExecution, and any downstream
        // action that builds a fresh one (Bench's noop write, Verify's
        // parquet write) would re-optimize from the raw logical plan
        // AFTER the conf restore — silently falling back to the
        // nested loop this query exists to avoid.
        val binKey = graft.plans.RangeBinJoinRule.binSecondsKey
        val prior = s.conf.getOption(binKey)
        s.conf.set(binKey, "21600")
        try {
          val view = s"g_range_ev_${Tables.tmpKey(d)}"
          events(s, d).createOrReplaceTempView(view)
          val df = s.sql(
            s"""WITH iv AS (SELECT event_id AS iv_id, ts AS w_start,
                 ts + INTERVAL 6 HOUR AS w_end
               FROM $view ORDER BY value DESC, event_id LIMIT 50)
             SELECT iv_id, CAST(count(*) AS BIGINT) AS n_ev,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                 AS BIGINT) AS cents
             FROM iv JOIN $view e
               ON e.ts >= iv.w_start AND e.ts < iv.w_end
             GROUP BY iv_id ORDER BY iv_id""")
          org.apache.spark.sql.GraftShim.ofRows(s,
            df.queryExecution.optimizedPlan) // rewrite baked into the plan
        } finally prior match {
          case Some(v) => s.conf.set(binKey, v)
          case None => s.conf.unset(binKey)
        }
      }),

    // interval-overlap join: view and purchase 30-minute activity
    // windows of the same user that intersect — both sides are
    // intervals (TemporalJoins.intervalOverlapJoin: binned equi-join,
    // first-common-bin gate, so each pair emits once with NO distinct)
    QueryDef("q_interval_join",
      Some("""WITH a AS (SELECT user_id, event_id AS a_id,
                     epoch_us(ts) AS a_start,
                     epoch_us(ts) + 1800000000 AS a_end
                   FROM events WHERE event_type = 'view'),
              b AS (SELECT user_id, event_id AS b_id,
                     epoch_us(ts) AS b_start,
                     epoch_us(ts) + 1800000000 AS b_end
                   FROM events WHERE event_type = 'purchase')
              SELECT a.user_id, a_id, b_id,
                     CAST(least(a_end, b_end) - greatest(a_start, b_start)
                       AS BIGINT) AS overlap_us
              FROM a JOIN b ON a.user_id = b.user_id
                AND a_start < b_end AND b_start < a_end
              ORDER BY a.user_id, a_id, b_id"""),
      (s, d) => {
        val ev = events(s, d)
        val halfHourUs = 1800L * 1000000L
        def side(tpe: String, idAs: String, sAs: String, eAs: String) =
          ev.filter(col("event_type") === tpe)
            .select(col("user_id"), col("event_id").as(idAs),
              unix_micros(col("ts")).as(sAs),
              (unix_micros(col("ts")) + halfHourUs).as(eAs))
        TemporalJoins.intervalOverlapJoin(
            side("view", "a_id", "a_start", "a_end"),
            side("purchase", "b_id", "b_start", "b_end"),
            Seq("user_id"), "a_start", "a_end", "b_start", "b_end",
            binMicros = halfHourUs)
          .select(col("user_id"), col("a_id"), col("b_id"),
            (least(col("a_end"), col("b_end")) -
              greatest(col("a_start"), col("b_start"))).cast("long")
              .as("overlap_us"))
          .orderBy("user_id", "a_id", "b_id")
      }),

    // pivot: long-to-wide with an EXPLICIT value list (no extra
    // values-discovery job — required form at scale)
    QueryDef("q_pivot",
      Some("""SELECT source,
                CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
                CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
                CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
                CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
                CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
              FROM documents GROUP BY source ORDER BY source"""),
      (s, d) => {
        val langs = Seq("de", "en", "es", "fr", "zh")
        documents(s, d)
          .groupBy("source").pivot("lang", langs).agg(count(lit(1)))
          .na.fill(0L, langs) // empty cells: count-pivot yields null, oracle 0
          .orderBy("source")
      }),

    // unpivot/melt: wide-to-long over per-lang corpus stats
    QueryDef("q_unpivot",
      Some("""WITH st AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(n_chars) AS BIGINT) AS total_chars
                   FROM documents GROUP BY lang)
              SELECT lang, metric, value FROM (
                SELECT lang, 'n_docs' AS metric, n_docs AS value FROM st
                UNION ALL
                SELECT lang, 'total_chars' AS metric, total_chars AS value FROM st)
              ORDER BY lang, metric"""),
      (s, d) => documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("total_chars"))
        .unpivot(Array(col("lang")), Array(col("n_docs"), col("total_chars")),
          "metric", "value")
        .orderBy("lang", "metric")),

    // rollup: hierarchical subtotals + grouping flags in one pass
    // (Spark expands grouping sets before the shuffle — still one agg)
    QueryDef("q_rollup",
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
                     coalesce(l_linestatus, 'ALL') AS ls,
                     CAST(grouping(l_returnflag) AS INT) AS g_rf,
                     CAST(grouping(l_linestatus) AS INT) AS g_ls,
                     CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
              FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
              ORDER BY rf, ls"""),
      (s, d) => lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          sum(col("l_quantity").cast("long")).cast("long").as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("g_rf"), col("g_ls"), col("sum_qty"))
        .orderBy("rf", "ls")),

    // frame-window aggregate: 7-day moving sum/avg of daily event counts
    QueryDef("q_moving_avg",
      Some("""WITH d AS (SELECT event_type,
                     CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
                   FROM events GROUP BY 1, 2)
              SELECT event_type, CAST(day AS VARCHAR) AS day, n,
                     CAST(sum(n) OVER w AS BIGINT) AS sum7,
                     CAST(sum(n) OVER w AS DOUBLE) / CAST(count(n) OVER w AS DOUBLE)
                       AS avg7
              FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
              ORDER BY event_type, day"""),
      (s, d) => {
        val daily = events(s, d)
          .groupBy(col("event_type"),
            date_trunc("day", col("ts")).cast("date").as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
        daily.select(col("event_type"), col("day").cast("string").as("day"),
            col("n"), sum("n").over(w).cast("long").as("sum7"),
            (sum("n").over(w).cast("double") / count("n").over(w).cast("double"))
              .as("avg7"))
          .orderBy("event_type", "day")
      }),

    // grouped top-k: k best rows per group with a deterministic
    // tie-break (generalizes W2 keep-first beyond rank 1)
    QueryDef("q_group_topk",
      Some("""SELECT lang, doc_id, n_chars, rn FROM (
                SELECT lang, doc_id, n_chars,
                  CAST(row_number() OVER (PARTITION BY lang
                    ORDER BY n_chars DESC, doc_id) AS INT) AS rn
                FROM documents)
              WHERE rn <= 3 ORDER BY lang, rn"""),
      (s, d) => {
        val w = Window.partitionBy("lang")
          .orderBy(col("n_chars").desc, col("doc_id"))
        documents(s, d)
          .select(col("lang"), col("doc_id"), col("n_chars"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy("lang", "rn")
      }),

    // pure-SQL surface pin: temp view + spark.sql through the
    // REGISTERED custom function (jaro_winkler) — the path a SQL-only
    // user of the library takes; integer ten-thousandths so the float
    // never meets engine rounding
    QueryDef("q_sql_surface",
      Some("""SELECT c_custkey AS id,
                CAST(floor(jaro_winkler_similarity(c_name,
                  'Customer#000000001') * 10000 + 0.5) AS BIGINT) AS sim_e4
              FROM customer WHERE c_custkey <= 100 ORDER BY id"""),
      (s, d) => {
        graft.functions.Registry.registerAll(s)
        val view = s"g_sql_cust_${Tables.tmpKey(d)}"
        customer(s, d).createOrReplaceTempView(view)
        s.sql(s"""SELECT c_custkey AS id,
            CAST(floor(jaro_winkler(c_name, 'Customer#000000001')
              * 10000 + 0.5) AS BIGINT) AS sim_e4
          FROM $view WHERE c_custkey <= 100 ORDER BY id""")
      }),

    // RANGE-frame rolling aggregate: trailing 48 h of activity per
    // user at every event — an INTERVAL window (peers by value), not
    // the rows-frame of q_moving_avg; frame bounds in epoch micros so
    // both engines draw identical boundaries from the same nanosecond
    // fixture (ns -> us truncation matches Tables.events' `div 1000`)
    QueryDef("q_range_window",
      Some("""SELECT event_id, user_id,
                     CAST(count(*) OVER w AS BIGINT) AS n_48h,
                     CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       OVER w AS BIGINT) AS cents_48h
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 172800000000 PRECEDING AND CURRENT ROW)
              ORDER BY event_id"""),
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts")))
          .rangeBetween(-172800000000L, 0L)
        events(s, d)
          .select(col("event_id"), col("user_id"),
            count(lit(1)).over(w).as("n_48h"),
            sum(floor(col("value") * 100 + 0.5).cast("long")).over(w)
              .as("cents_48h"))
          .orderBy("event_id")
      }),

    // grouped top-k AS AN AGGREGATE (typed Aggregator UDAF): same
    // 3-longest-docs-per-lang answer as q_group_topk, but partial
    // aggregation caps the exchange at k rows per group per partition
    // where the window shuffles+sorts every row — the shape that wins
    // at 100 TB. The window formulation IS the oracle
    QueryDef("q_group_topk_agg",
      Some("""SELECT lang, doc_id, n_chars, rn FROM (
                SELECT lang, doc_id, n_chars,
                  CAST(row_number() OVER (PARTITION BY lang
                    ORDER BY n_chars DESC, doc_id) AS INT) AS rn
                FROM documents)
              WHERE rn <= 3 ORDER BY lang, rn"""),
      (s, d) => documents(s, d)
        .groupBy("lang")
        .agg(graft.functions.TopKBy.topKBy(3)(
          col("n_chars"), col("doc_id")).as("top"))
        .select(col("lang"), posexplode(col("top")).as(Seq("p", "t")))
        .select(col("lang"), col("t._2").as("doc_id"),
          col("t._1").as("n_chars"), (col("p") + 1).cast("int").as("rn"))
        .orderBy("lang", "rn")),

    // BM25 relevance (rational idf — pure arithmetic, engine-exact;
    // graft.text.Scoring). Corpus stats are one tiny broadcast row.
    QueryDef("q_bm25",
      Some("""WITH t AS (SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
              d AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
                      CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE) AS tf0,
                      CAST(len(list_filter(toks, x -> x = 'hash')) AS DOUBLE) AS tf1
                    FROM t),
              g AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                      sum(dl) / CAST(count(*) AS DOUBLE) AS avgdl,
                      CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
                      CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1
                    FROM d)
              SELECT doc_id,
                ((n_docs - df0 + 0.5) / (df0 + 0.5))
                  * ((tf0 * 2.2) / (tf0 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))))
                + ((n_docs - df1 + 0.5) / (df1 + 0.5))
                  * ((tf1 * 2.2) / (tf1 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))))
                AS score
              FROM d, g ORDER BY doc_id"""),
      (s, d) => Scoring.bm25(documents(s, d), Seq("doc_id"), "text",
          Seq("join", "hash"))
        .orderBy("doc_id")),

    // int8 embedding quantization: map-side projection, zero shuffles;
    // codes verified by portable md5 (graft.similarity.Quantize)
    QueryDef("q_quantize",
      Some("""WITH q AS (SELECT vec_id,
                     CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS mn,
                     CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS mx,
                     embedding
                   FROM embeddings)
              SELECT vec_id, mn, mx,
                     md5(array_to_string(list_transform(embedding,
                       x -> CAST(floor((CAST(x AS DOUBLE) - mn)
                              * (CASE WHEN mx > mn THEN 254.0 / (mx - mn)
                                      ELSE 0.0 END) + 0.5) AS BIGINT) - 127),
                       ',')) AS q_md5
              FROM q ORDER BY vec_id"""),
      // sort-first (r16, guide §1.2; see q_mask_tokens): int8
      // quantization is a map-side projection, so it runs above the
      // sort once instead of re-executing in the sampling job
      (s, d) => Quantize.int8(
          embeddings(s, d).select(col("vec_id"), col("embedding"))
            .orderBy("vec_id"), "embedding")
        .select(col("vec_id"), col("mn"), col("mx"),
          md5(concat_ws(",", transform(col("q"), _.cast("string")))).as("q_md5"))),

    // within-document repetition signals (the Gopher/MassiveText-style
    // quality rules): repeated-word and repeated-bigram fractions plus
    // a keep flag — all map-side array HOFs, zero shuffles
    QueryDef("q_repetition",
      Some(s"""WITH t AS (SELECT doc_id,
                     string_split_regex(trim(text), '\\s+') AS toks
                   FROM documents),
              b AS (SELECT doc_id, toks,
                      CASE WHEN len(toks) >= 2 THEN
                        list_transform(range(0, len(toks) - 1), i ->
                          array_to_string(toks[CAST(i+1 AS INT):CAST(i+2 AS INT)], ' '))
                      ELSE [] END AS bg
                    FROM t)
              SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
                     ${dupFracSql("toks")} AS dup_word_frac,
                     ${dupFracSql("bg")} AS dup_bigram_frac,
                     (${dupFracSql("toks")} <= 0.55
                       AND ${dupFracSql("bg")} <= 0.05) AS keep
              FROM b ORDER BY doc_id"""),
      // sort-first (r16, guide §1.2; see q_mask_tokens): the bigram
      // zip + dup-fraction HOFs run once, not twice
      (s, d) => documents(s, d)
        .select(col("doc_id"), col("text"))
        .orderBy("doc_id")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .withColumn("bg", TextAnalysis.bigramsT(col("toks")))
        .select(col("doc_id"), size(col("toks")).cast("long").as("n_tok"),
          TextAnalysis.dupFraction(col("toks")).as("dup_word_frac"),
          TextAnalysis.dupFraction(col("bg")).as("dup_bigram_frac"))
        .withColumn("keep",
          col("dup_word_frac") <= 0.55 && col("dup_bigram_frac") <= 0.05)),

    // batch twin of the stream-stream interval join (EventStreams
    // .clickPurchaseJoin): the oracle pins the semantics the streaming
    // path must reproduce (StreamingSpec asserts stream == batch)
    QueryDef("q_stream_join",
      Some("""WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
                   FROM events WHERE event_type = 'click'),
              p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
                   FROM events WHERE event_type = 'purchase')
              SELECT c.user_id, c.click_id, p.purchase_id,
                     CAST(c.click_ts AS VARCHAR) AS click_ts,
                     CAST(p.purchase_ts AS VARCHAR) AS purchase_ts
              FROM c JOIN p ON c.user_id = p.user_id
                AND p.purchase_ts >= c.click_ts
                AND p.purchase_ts <= c.click_ts + INTERVAL 2 HOUR
              ORDER BY click_id, purchase_id"""),
      (s, d) => graft.streaming.EventStreams
        .clickPurchaseJoin(events(s, d), streaming = false)
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          col("click_ts").cast("string").as("click_ts"),
          col("purchase_ts").cast("string").as("purchase_ts"))
        .orderBy("click_id", "purchase_id"))
        ,

    // cohort retention triangle (graft.ops.Cohorts.retention):
    // customers bucketed by first-order month, distinct actives per
    // (cohort, month-offset). Months are integer year*12+month — no
    // date-diff float surface in either engine.
    QueryDef("q_cohort",
      Some("""WITH m AS (
                SELECT o_custkey AS u,
                       year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mi
                FROM orders),
              f AS (SELECT u, min(mi) AS ci FROM m GROUP BY u)
              SELECT printf('%04d-%02d', ci // 12, ci % 12 + 1)
                       AS cohort_month,
                     CAST(mi - ci AS INT) AS month_offset,
                     CAST(count(DISTINCT m.u) AS BIGINT) AS n_users
              FROM m JOIN f ON m.u = f.u
              WHERE mi - ci <= 3
              GROUP BY 1, 2 ORDER BY cohort_month, month_offset"""),
      (s, d) => graft.ops.Cohorts.retention(orders(s, d), "o_custkey",
          "o_orderdate", 3)
        .orderBy("cohort_month", "month_offset")),

    // Pearson correlation per group with EXACT integer moments: the
    // five sums accumulate as decimal(38,0)/HUGEINT (order-proof,
    // overflow-proof at sf1000), and the one double expression at the
    // end evaluates in the same operation order on both engines —
    // corr without the accumulation-order float trap of built-in
    // corr() aggregates
    QueryDef("q_corr",
      // NULLIF guard on the denominator: a single-row or
      // constant-valued group has zero variance — corr is undefined
      // and must come back NULL in both engines (the moments are exact
      // integers riding doubles, so "zero" is exact and the guard
      // fires identically; unguarded, ANSI Spark raises DIVIDE_BY_ZERO
      // on a degenerate group — adversarial-fixture find)
      Some("""SELECT rflag, CAST(n AS BIGINT) AS n_rows,
                (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                NULLIF(
                 sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                 sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0)
                  AS corr_qty_price
              FROM (
                SELECT rflag, count(*) AS n, sum(qty) AS sx, sum(cents) AS sy,
                       sum(qty * cents) AS sxy, sum(qty * qty) AS sxx,
                       sum(cents * cents) AS syy
                FROM (SELECT l_returnflag AS rflag,
                        CAST(CAST(l_quantity AS BIGINT) AS HUGEINT) AS qty,
                        CAST(CAST(floor(l_extendedprice * 100 + 0.5)
                          AS BIGINT) AS HUGEINT) AS cents
                      FROM lineitem)
                GROUP BY rflag)
              ORDER BY rflag"""),
      (s, d) => {
        val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
        val base = lineitem(s, d).select(
          col("l_returnflag").as("rflag"),
          col("l_quantity").cast("long").as("qty"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
        base.groupBy("rflag")
          .agg(count(lit(1)).as("n"),
            sum(dec(col("qty"))).as("sx"),
            sum(dec(col("cents"))).as("sy"),
            sum(dec(col("qty")) * dec(col("cents"))).as("sxy"),
            sum(dec(col("qty")) * dec(col("qty"))).as("sxx"),
            sum(dec(col("cents")) * dec(col("cents"))).as("syy"))
          .select(col("rflag"), col("n").as("n_rows"),
            ((col("n").cast("double") * col("sxy").cast("double")
              - col("sx").cast("double") * col("sy").cast("double")) /
             nullif(
               sqrt(col("n").cast("double") * col("sxx").cast("double")
                 - col("sx").cast("double") * col("sx").cast("double")) *
               sqrt(col("n").cast("double") * col("syy").cast("double")
                 - col("sy").cast("double") * col("sy").cast("double")),
               lit(0.0)))
              .as("corr_qty_price"))
          .orderBy("rflag")
      }),

    // Composite: the reference's widest cleanup pipeline in ONE plan
    // (reference `awarxe_cleanup.py:14-131`) — DEA regex screen (:47),
    // DEA mod-10 checksum (:57-69), NPI Luhn+24 (:183-199), the
    // suffix-not-resident/fellow rule (:85-96), the multi-DEA list
    // pipeline (:108-141: strip → upper → split(',') → partition into
    // active/inactive by membership against the active-DEA table →
    // ' | ' joins, all/some-inactive flags), and the role-count window
    // the role reports aggregate by. Registrant fields are synthesized
    // from `orders` with the same arithmetic on both engines (the
    // q_dea_checksum / q_npi_checksum convention).
    //
    // Scale shape: the reference collects the active-DEA list to the
    // driver and runs is_in against a Python list; here membership is
    // a LEFT JOIN of the posexploded association list against the
    // (distinct, dimension-sized) active-DEA frame — AQE broadcasts
    // it while it is small and shuffle-joins past that — and the
    // per-registrant lists reassemble order-preserving via
    // array_sort(collect_list(struct(pos, elem))), so no stage ever
    // holds a corpus-scale list on one node. collect_list skips NULLs,
    // which is exactly the per-branch filter the reference's
    // list.filter expresses.
    QueryDef("q_awarxe_cleanup",
      Some("""WITH base AS (
                SELECT o_orderkey AS okey,
                       'AB' || lpad(CAST(o_orderkey % 10000000 AS VARCHAR), 7, '0') AS dea,
                       lpad(CAST((o_orderkey * 7919) % 10000000000 AS VARCHAR), 10, '0') AS npi,
                       CASE o_orderkey % 5
                         WHEN 0 THEN 'Physician Resident'
                         WHEN 1 THEN 'Surgical Fellow'
                         WHEN 2 THEN 'Pharmacist'
                         WHEN 3 THEN 'Physician'
                         ELSE 'Nurse Practitioner' END AS role,
                       CASE WHEN o_orderkey % 7 = 0
                            THEN 'R' || CAST(o_orderkey % 97 AS VARCHAR) END AS suffix,
                       ' ab' || lpad(CAST(o_custkey % 10000000 AS VARCHAR), 7, '0') ||
                       ' , ab' || lpad(CAST((o_custkey + 1) % 10000000 AS VARCHAR), 7, '0')
                         AS assoc
                FROM orders),
              act_list AS (
                SELECT list(DISTINCT 'AB' || lpad(CAST(o_custkey % 10000000 AS VARCHAR), 7, '0')) AS al
                FROM orders WHERE o_orderstatus = 'F'),
              lists AS (
                SELECT okey,
                       string_split(upper(regexp_replace(assoc, '\s', '', 'g')), ',') AS l
                FROM base),
              ag AS (
                SELECT okey,
                       COALESCE(array_to_string(
                         list_filter(l, x -> list_contains(al, x)), ' | '), '')
                         AS active_deas,
                       COALESCE(array_to_string(
                         list_filter(l, x -> NOT list_contains(al, x)), ' | '), '')
                         AS inactive_deas,
                       len(list_filter(l, x -> list_contains(al, x))) AS n_act,
                       len(list_filter(l, x -> NOT list_contains(al, x))) AS n_inact
                FROM lists, act_list)
              SELECT b.okey, b.dea,
                     (regexp_matches(b.dea, '^[ABCFGHMPR][A-Z][0-9]{7}$')
                      AND substr(b.dea, 3, 7) <> '0000000') AS pattern_ok,
                     (regexp_matches(b.dea, '^[ABCFGHMPR][A-Z][0-9]{7}$')
                      AND substr(b.dea, 3, 7) <> '0000000'
                      AND (CAST(substr(b.dea,3,1) AS INT) + CAST(substr(b.dea,5,1) AS INT)
                         + CAST(substr(b.dea,7,1) AS INT)
                         + 2 * (CAST(substr(b.dea,4,1) AS INT) + CAST(substr(b.dea,6,1) AS INT)
                              + CAST(substr(b.dea,8,1) AS INT))) % 10
                          = CAST(substr(b.dea,9,1) AS INT)) AS dea_ok,
                     (regexp_matches(b.npi, '^[0-9]{10}$')
                      AND (list_sum(list_transform(range(1, 10), i ->
                             CASE WHEN i % 2 = 1 THEN
                               CASE WHEN 2 * CAST(substr(b.npi, CAST(i AS INT), 1) AS INT) > 9
                                    THEN 2 * CAST(substr(b.npi, CAST(i AS INT), 1) AS INT) - 9
                                    ELSE 2 * CAST(substr(b.npi, CAST(i AS INT), 1) AS INT) END
                             ELSE CAST(substr(b.npi, CAST(i AS INT), 1) AS INT) END))
                           + 24 + CAST(substr(b.npi, 10, 1) AS INT)) % 10 = 0) AS npi_ok,
                     (b.suffix IS NOT NULL
                      AND NOT contains(lower(b.role), 'resident')
                      AND NOT contains(lower(b.role), 'fellow')) AS bad_suffix,
                     b.role, ag.active_deas, ag.inactive_deas,
                     ag.n_act = 0 AS all_inactive,
                     (ag.n_act > 0 AND ag.n_inact > 0) AS some_inactive,
                     count(*) OVER (PARTITION BY b.role) AS role_n
              FROM base b JOIN ag USING (okey) ORDER BY okey"""),
      (s, d) => {
        def deaOf(c: org.apache.spark.sql.Column, lower: Boolean) =
          concat(lit(if (lower) "ab" else "AB"),
            lpad((c % 10000000L).cast("string"), 7, "0"))
        val base = orders(s, d).select(
          col("o_orderkey").as("okey"),
          deaOf(col("o_orderkey"), lower = false).as("dea"),
          lpad(((col("o_orderkey") * 7919) % 10000000000L).cast("string"),
            10, "0").as("npi"),
          (col("o_orderkey") % 5).cast("int").as("role5"),
          when(col("o_orderkey") % 7 === 0,
            concat(lit("R"), (col("o_orderkey") % 97).cast("string")))
            .as("suffix"),
          concat(lit(" "), deaOf(col("o_custkey"), lower = true),
            lit(" , "), deaOf(col("o_custkey") + 1, lower = true)).as("assoc"))
          .withColumn("role",
            when(col("role5") === 0, "Physician Resident")
              .when(col("role5") === 1, "Surgical Fellow")
              .when(col("role5") === 2, "Pharmacist")
              .when(col("role5") === 3, "Physician")
              .otherwise("Nurse Practitioner"))
        val active = orders(s, d).filter(col("o_orderstatus") === "F")
          .select(deaOf(col("o_custkey"), lower = false).as("adea")).distinct()
        val mem = base
          .select(col("okey"), posexplode(
            split(upper(regexp_replace(col("assoc"), "\\s", "")), ","))
            .as(Seq("pos", "elem")))
          .join(active, col("elem") === col("adea"), "left")
          .withColumn("act", col("adea").isNotNull)
        def sideList(keep: org.apache.spark.sql.Column) =
          array_join(transform(
            array_sort(collect_list(when(keep, struct(col("pos"), col("elem"))))),
            e => e.getField("elem")), " | ")
        val ag = mem.groupBy("okey").agg(
          sideList(col("act")).as("active_deas"),
          sideList(!col("act")).as("inactive_deas"),
          sum(when(col("act"), 1L).otherwise(0L)).as("n_act"),
          sum(when(!col("act"), 1L).otherwise(0L)).as("n_inact"))
        val deaPat = col("dea").rlike("^[ABCFGHMPR][A-Z][0-9]{7}$") &&
          substring(col("dea"), 3, 7) =!= "0000000"
        // role_n as a 5-row broadcast aggregate, NOT a count-over
        // window (r16, guide §2.4/§2.5): `count(*) OVER (PARTITION BY
        // role)` shuffled every full-width output row (incl. the
        // reassembled DEA list strings) onto FIVE hot keys — a
        // guaranteed-skew exchange at corpus scale that AQE cannot
        // split (single giant keys). The count needs only the role5
        // ordinal, so it is a map-side-combined aggregate over the
        // scan, broadcast back; one full-width Exchange+Sort drops
        // out of the plan and no stage keys on a 5-value column.
        val roleCounts = orders(s, d)
          .select((col("o_orderkey") % 5).cast("int").as("role5"))
          .groupBy("role5").agg(count(lit(1)).as("role_n"))
        base.join(ag, Seq("okey"))
          .join(broadcast(roleCounts), Seq("role5"))
          .select(col("okey"), col("dea"),
            deaPat.as("pattern_ok"),
            graft.functions.Checksums.deaValid(col("dea")).as("dea_ok"),
            graft.functions.Checksums.npiValid(col("npi")).as("npi_ok"),
            (col("suffix").isNotNull &&
              !lower(col("role")).contains("resident") &&
              !lower(col("role")).contains("fellow")).as("bad_suffix"),
            col("role"), col("active_deas"), col("inactive_deas"),
            (col("n_act") === 0).as("all_inactive"),
            (col("n_act") > 0 && col("n_inact") > 0).as("some_inactive"),
            col("role_n"))
          .orderBy("okey")
      })
  )
}
