package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Relational

/** Aggregations, windows, sorts, top-k (SURVEY.md §2.4/2.5/2.6).
  * Spark's hash aggregate gives partial (map-side) + final aggregation
  * for free — one shuffle of the already-combined partials, which is the
  * shape that survives a 100 TB fact table. Double-typed sums are
  * rounded in BOTH engines so accumulation order can't flip a bit.
  */
object AggQueries {
  import Tables._

  val defs: Seq[QueryDef] = Seq(

    // A1: group count (reference `error_pharmacies.py:35-39`)
    QueryDef("q_group_count",
      Some("""SELECT l_returnflag AS rflag, l_linestatus AS lstatus,
                     count(*) AS n
              FROM lineitem GROUP BY 1, 2 ORDER BY rflag, lstatus"""),
      (s, d) => lineitem(s, d)
        .groupBy(col("l_returnflag").as("rflag"), col("l_linestatus").as("lstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy("rflag", "lstatus")),

    // A2/A6: group max/min (reference `mu_extras.py:130-134`)
    QueryDef("q_group_minmax",
      Some("""SELECT o_orderpriority AS prio,
                     min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
                     min(CAST(o_orderdate AS DATE)) AS first_date,
                     max(CAST(o_orderdate AS DATE)) AS last_date
              FROM orders GROUP BY 1 ORDER BY prio"""),
      (s, d) => orders(s, d)
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(min("o_totalprice").as("min_price"), max("o_totalprice").as("max_price"),
          min(to_date(col("o_orderdate"))).as("first_date"),
          max(to_date(col("o_orderdate"))).as("last_date"))
        .orderBy("prio")),

    // exact per-group median (percentile_disc(0.5) semantics: the
    // value at sorted position (n+1) div 2) and mode (most frequent
    // value, min-value tiebreak). Discrete picks so BOTH engines
    // choose the identical value — no interpolation, no
    // engine-private quantile algorithms. Spark computes the median
    // from the (flag, qty) HISTOGRAM (Relational.
    // groupedMedianFromCounts — one partially-aggregated shuffle,
    // windows only over histogram rows); the oracle spells the same
    // element as a row_number window. The sketch-based path at 100 TB
    // is q_quantiles' approx summary, this is the exact complement
    // (quantities are integer-valued doubles, so the BIGINT cast is
    // lossless on both engines)
    QueryDef("q_median_mode",
      Some("""WITH q AS (SELECT l_returnflag AS flag,
                  CAST(l_quantity AS BIGINT) AS qty
                FROM lineitem),
              med AS (SELECT flag, qty AS median_qty FROM (
                SELECT flag, qty,
                  row_number() OVER (PARTITION BY flag ORDER BY qty) AS rn,
                  count(*) OVER (PARTITION BY flag) AS n
                FROM q) WHERE rn = (n + 1) // 2),
              md AS (SELECT flag, qty AS mode_qty, n AS mode_n FROM (
                SELECT flag, qty, n,
                  row_number() OVER (PARTITION BY flag
                    ORDER BY n DESC, qty) AS r
                FROM (SELECT flag, qty, CAST(count(*) AS BIGINT) AS n
                      FROM q GROUP BY 1, 2)) WHERE r = 1)
              SELECT m.flag AS l_returnflag, m.median_qty,
                     o.mode_qty, o.mode_n
              FROM med m JOIN md o ON m.flag = o.flag
              ORDER BY l_returnflag"""),
      (s, d) => {
        val q = lineitem(s, d).select(col("l_returnflag").as("flag"),
          col("l_quantity").cast("long").as("qty"))
        // ONE full-data shuffle: the (flag, qty) histogram, partially
        // aggregated map-side. Median AND mode both derive from it
        // (the shared subtree reuses the exchange); every window below
        // runs over ≤ |flags|·|qty domain| histogram rows, never the
        // table — see Relational.groupedMedianFromCounts
        val hist = q.groupBy("flag", "qty").agg(count(lit(1)).as("n"))
        val med = Relational
          .groupedMedianFromCounts(hist, "flag", "qty", "n")
          .select(col("flag"), col("median").as("median_qty"))
        val md = hist
          .withColumn("r", row_number().over(
            Window.partitionBy("flag").orderBy(col("n").desc, col("qty"))))
          .where(col("r") === 1)
          .select(col("flag"), col("qty").as("mode_qty"),
            col("n").as("mode_n"))
        med.join(md, "flag")
          .select(col("flag").as("l_returnflag"), col("median_qty"),
            col("mode_qty"), col("mode_n"))
          .orderBy("l_returnflag")
      }),

    // robust outlier screen: per-group median, median absolute
    // deviation (MAD), and the count of |x - med| > 3*MAD rows — the
    // outlier rule that survives heavy tails where mean/stddev break.
    // Entirely integer-exact (quantities are integer-valued): two
    // stacked histogram-median picks, then one keyed count —
    // engine-identical discrete choices throughout. The oracle keeps
    // the row_number formulation (same element, different plan)
    QueryDef("q_mad_outliers",
      Some("""WITH q AS (SELECT l_returnflag AS flag,
                  CAST(l_quantity AS BIGINT) AS qty
                FROM lineitem),
              med AS (SELECT flag, qty AS med_qty FROM (
                SELECT flag, qty,
                  row_number() OVER (PARTITION BY flag ORDER BY qty) AS rn,
                  count(*) OVER (PARTITION BY flag) AS n
                FROM q) WHERE rn = (n + 1) // 2),
              dev AS (SELECT q.flag, abs(q.qty - m.med_qty) AS ad
                FROM q JOIN med m ON q.flag = m.flag),
              mad AS (SELECT flag, ad AS mad_qty FROM (
                SELECT flag, ad,
                  row_number() OVER (PARTITION BY flag ORDER BY ad) AS rn,
                  count(*) OVER (PARTITION BY flag) AS n
                FROM dev) WHERE rn = (n + 1) // 2)
              SELECT m.flag AS l_returnflag, m.med_qty, d.mad_qty,
                CAST(sum(CASE WHEN v.ad > 3 * d.mad_qty THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_outliers
              FROM med m JOIN mad d ON m.flag = d.flag
                JOIN dev v ON v.flag = m.flag
              GROUP BY 1, 2, 3 ORDER BY l_returnflag"""),
      (s, d) => {
        val q = lineitem(s, d).select(col("l_returnflag").as("flag"),
          col("l_quantity").cast("long").as("qty"))
        // ONE full-data shuffle: the (flag, qty) histogram. Both
        // stacked medians — and the deviation histogram between them —
        // are computed on histogram-sized frames (≤ |flags|·|domain|
        // rows, broadcast joins), so the double-median shape costs no
        // more than a single groupBy at 100 TB. See
        // Relational.groupedMedianFromCounts for why the naive
        // row_number window formulation is 3 single-threaded sorts
        val hist = q.groupBy("flag", "qty").agg(count(lit(1)).as("cnt"))
        val med = Relational
          .groupedMedianFromCounts(hist, "flag", "qty", "cnt")
          .select(col("flag"), col("median").as("med_qty"))
        val devHist = hist.join(med, "flag")
          .select(col("flag"), abs(col("qty") - col("med_qty")).as("ad"),
            col("cnt"))
          .groupBy("flag", "ad").agg(sum(col("cnt")).as("cnt"))
        val mad = Relational
          .groupedMedianFromCounts(devHist, "flag", "ad", "cnt")
          .select(col("flag"), col("median").as("mad_qty"))
        med.join(mad, "flag").join(devHist, "flag")
          .groupBy("flag", "med_qty", "mad_qty")
          .agg(sum(when(col("ad") > lit(3) * col("mad_qty"), col("cnt"))
            .otherwise(0L)).as("n_outliers"))
          .select(col("flag").as("l_returnflag"), col("med_qty"),
            col("mad_qty"), col("n_outliers"))
          .orderBy("l_returnflag")
      }),

    // A3: group sum (reference `scorecard.py:60-61`); quantities are
    // integer-valued doubles -> order-independent exact sums; prices
    // rounded on both sides
    QueryDef("q_group_sum",
      Some("""SELECT l_returnflag AS rflag, sum(l_quantity) AS sum_qty,
                     round(sum(l_extendedprice), 2) AS sum_price
              FROM lineitem GROUP BY 1 ORDER BY rflag"""),
      (s, d) => lineitem(s, d)
        .groupBy(col("l_returnflag").as("rflag"))
        .agg(sum("l_quantity").as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy("rflag")),

    // write_excel column_totals sink parity (reference `mm2.py:87-127`:
    // the Excel sink appends a grand-total row under each numeric
    // column). Modeled as ROLLUP — ONE scan computes the per-group rows
    // and the totals row as grouping sets (vs the naive agg UNION ALL
    // grand-agg, which scans twice); the null rollup group is relabeled
    // 'TOTAL' and ordered last, which is exactly the sink's layout.
    QueryDef("q_column_totals",
      // GROUPING() (not coalesce-on-null) labels the totals row, so a
      // genuine NULL group value could never collide with the label
      Some("""SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'TOTAL'
                          ELSE l_returnflag END AS rflag,
                     sum(l_quantity) AS sum_qty,
                     CAST(count(*) AS BIGINT) AS n_rows
              FROM lineitem GROUP BY ROLLUP (l_returnflag)
              ORDER BY GROUPING(l_returnflag), rflag"""),
      (s, d) => lineitem(s, d)
        .rollup(col("l_returnflag"))
        .agg(sum("l_quantity").as("sum_qty"),
          count(lit(1)).as("n_rows"),
          grouping(col("l_returnflag")).as("__g"))
        .select(when(col("__g") === 1, "TOTAL")
            .otherwise(col("l_returnflag")).as("rflag"),
          col("sum_qty"), col("n_rows"), col("__g"))
        .orderBy(col("__g"), col("rflag"))
        .drop("__g")),

    // A4: collect-to-list agg (reference `awarxe_cleanup.py:264-265`);
    // sorted + string-joined so the comparison is order-insensitive
    QueryDef("q_collect_list",
      Some("""SELECT o_custkey AS ckey,
                     array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys
              FROM orders GROUP BY 1 ORDER BY ckey"""),
      (s, d) => orders(s, d)
        .groupBy(col("o_custkey").as("ckey"))
        .agg(array_join(sort_array(collect_list("o_orderkey")), ",").as("order_keys"))
        .orderBy("ckey")),

    // A5: value_counts sorted (reference `unreg_presc.py:165`)
    QueryDef("q_value_counts",
      Some("""SELECT o_orderpriority, count(*) AS count FROM orders
              GROUP BY 1 ORDER BY count DESC, o_orderpriority"""),
      (s, d) => Relational.valueCounts(orders(s, d), "o_orderpriority")),

    // A7: argmax-by-count selection (reference `error_pharmacies.py:43`)
    QueryDef("q_argmax_count",
      Some("""WITH counted AS (
                SELECT o_custkey AS ckey, count(*) AS count FROM orders GROUP BY 1)
              SELECT * FROM counted
              WHERE count = (SELECT max(count) FROM counted)
              ORDER BY ckey"""),
      (s, d) => Relational.argmaxCount(
        orders(s, d).withColumnRenamed("o_custkey", "ckey"), Seq("ckey"))
        .orderBy("ckey")),

    // A8: descriptive stats (reference `techs.py:56-57` describe())
    QueryDef("q_summary",
      Some("""SELECT count(l_quantity) AS n,
                     round(avg(l_quantity), 6) AS mean,
                     round(stddev_samp(l_quantity), 6) AS std,
                     min(l_quantity) AS min_v, max(l_quantity) AS max_v
              FROM lineitem"""),
      (s, d) => lineitem(s, d).agg(
        count("l_quantity").as("n"),
        round(avg("l_quantity"), 6).as("mean"),
        round(stddev_samp(col("l_quantity")), 6).as("std"),
        min("l_quantity").as("min_v"), max("l_quantity").as("max_v"))),

    // A9: distinct count (reference `mm2.py:52`)
    QueryDef("q_count_distinct",
      Some("""SELECT l_returnflag AS rflag,
                     count(DISTINCT l_suppkey) AS n_supp,
                     count(DISTINCT l_partkey) AS n_part
              FROM lineitem GROUP BY 1 ORDER BY rflag"""),
      (s, d) => lineitem(s, d)
        .groupBy(col("l_returnflag").as("rflag"))
        .agg(countDistinct("l_suppkey").as("n_supp"),
          countDistinct("l_partkey").as("n_part"))
        .orderBy("rflag")),

    // W1: count over partition (reference `awarxe_cleanup.py:216-219`)
    QueryDef("q_window_count",
      Some("""SELECT o_orderkey AS okey, o_custkey AS ckey,
                     count(*) OVER (PARTITION BY o_custkey) AS orders_per_cust
              FROM orders ORDER BY okey"""),
      (s, d) => orders(s, d).select(
        col("o_orderkey").as("okey"), col("o_custkey").as("ckey"),
        count(lit(1)).over(Window.partitionBy("o_custkey")).as("orders_per_cust"))
        .orderBy("okey")),

    // O1/O3: multi-col sort + top-k -> TakeOrderedAndProject
    // (reference `mu_extras.py:99-100`, TOP_PRESCRIBERS=40)
    QueryDef("q_topk",
      Some("""SELECT o_orderkey AS okey, o_totalprice AS price FROM orders
              ORDER BY price DESC, okey LIMIT 40"""),
      (s, d) => Relational.topK(
        orders(s, d).select(col("o_orderkey").as("okey"),
          col("o_totalprice").as("price")),
        40, col("price").desc, col("okey").asc)),

    // A10: scalar extraction + re-injection — the reference's `.item()`
    // idiom (`check_masked.py:60` dr_count, `error_pharmacies.py:38`):
    // pull ONE scalar to the driver (here: the most common order
    // priority), then use it as a literal in the follow-on query. The
    // collect is a 1-row model parameter, not a data move.
    QueryDef("q_scalar_reinject",
      Some("""WITH top AS (
                SELECT o_orderpriority FROM orders
                GROUP BY 1 ORDER BY count(*) DESC, o_orderpriority LIMIT 1)
              SELECT year(o_orderdate) AS y, count(*) AS n
              FROM orders WHERE o_orderpriority = (SELECT * FROM top)
              GROUP BY 1 ORDER BY y"""),
      (s, d) => {
        val o = orders(s, d)
        val top = o.groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("o_orderpriority"))
          .first().getString(0)
        o.filter(col("o_orderpriority") === top)
          .groupBy(year(col("o_orderdate")).as("y"))
          .agg(count(lit(1)).as("n"))
          .orderBy("y")
      }),

    // O2: sort by expression (reference `awarxe_cleanup.py:139`)
    QueryDef("q_sort_expr",
      Some("""SELECT p_partkey AS pkey, p_name AS pname FROM part
              ORDER BY length(p_name) DESC, pkey LIMIT 100"""),
      (s, d) => part(s, d)
        .select(col("p_partkey").as("pkey"), col("p_name").as("pname"))
        .orderBy(length(col("pname")).desc, col("pkey").asc)
        .limit(100))
  )
}
