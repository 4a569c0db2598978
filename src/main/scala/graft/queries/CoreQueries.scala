package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Normalize, Relational}

/** Projection / filter / scalar-transform operators (SURVEY.md §2.2). */
object CoreQueries {
  import Tables._

  val defs: Seq[QueryDef] = Seq(

    // P1/P2: select with rename + derived column
    // (reference `activity_request.py:236-280` relabeling projections)
    // net price emitted as integer cents (floor(x*100+0.5)) — pure IEEE
    // double ops, bit-identical across engines, unlike round(double, 2)
    // whose scaled-multiply differs at representational boundaries
    QueryDef("q_select_rename",
      Some("""SELECT l_orderkey AS okey, l_linenumber AS line,
              CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
                AS net_cents,
              round(l_extendedprice, 2) AS price_r
              FROM lineitem ORDER BY okey, line"""),
      (s, d) => lineitem(s, d).select(
        col("l_orderkey").as("okey"),
        col("l_linenumber").as("line"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .as("net_cents"),
        round(col("l_extendedprice"), 2).as("price_r")
      ).orderBy("okey", "line")),

    // P4/P5/P6: conjunctive filter + boolean algebra + null checks
    // (reference `delinquent_data_submitters.py:51-54,84-86`)
    QueryDef("q_filter_conj",
      Some("""SELECT l_orderkey AS okey, l_linenumber AS line, l_quantity AS qty
              FROM lineitem
              WHERE l_quantity > 30 AND l_discount <= 0.05
                AND l_returnflag <> 'A' AND l_shipdate IS NOT NULL
              ORDER BY okey, line"""),
      (s, d) => lineitem(s, d)
        .filter(col("l_quantity") > 30 && col("l_discount") <= 0.05 &&
          col("l_returnflag") =!= "A" && col("l_shipdate").isNotNull)
        .select(col("l_orderkey").as("okey"), col("l_linenumber").as("line"),
          col("l_quantity").as("qty"))
        .orderBy("okey", "line")),

    // P8/P9/P13: chained when/otherwise + literals + value remap
    // (reference `pharmacy_deas_not_in_mp.py:31-39`, `unreg_pharmacists.py:120-121`)
    QueryDef("q_when_case",
      Some("""SELECT c_custkey AS ckey,
              CASE WHEN c_mktsegment = 'BUILDING' THEN 'B'
                   WHEN c_mktsegment = 'AUTOMOBILE' THEN 'A'
                   ELSE 'OTHER' END AS seg_code,
              CASE WHEN c_acctbal < 0 THEN 'YES' ELSE 'NO' END AS overdrawn,
              'az' AS state
              FROM customer ORDER BY ckey"""),
      (s, d) => customer(s, d).select(
        col("c_custkey").as("ckey"),
        when(col("c_mktsegment") === "BUILDING", "B")
          .when(col("c_mktsegment") === "AUTOMOBILE", "A")
          .otherwise("OTHER").as("seg_code"),
        when(col("c_acctbal") < 0, "YES").otherwise("NO").as("overdrawn"),
        lit("az").as("state")
      ).orderBy("ckey")),

    // P13 strict: replace_strict with the raise-on-unmapped contract
    // (reference `unreg_pharmacists.py:120-121` — Polars replace_strict
    // aborts when a value has no mapping). The oracle covers the
    // all-mapped happy path (CASE chain, provably identical here since
    // c_mktsegment's domain is the 5 TPC-H segments); the raising path
    // is pinned in NormalizeSpec (the in-plan raise_error fires naming
    // the offending key).
    QueryDef("q_replace_strict",
      Some("""SELECT c_custkey AS ckey,
              CASE WHEN c_mktsegment = 'BUILDING' THEN 'bld'
                   WHEN c_mktsegment = 'AUTOMOBILE' THEN 'auto'
                   WHEN c_mktsegment = 'MACHINERY' THEN 'mach'
                   WHEN c_mktsegment = 'HOUSEHOLD' THEN 'hh'
                   WHEN c_mktsegment = 'FURNITURE' THEN 'furn'
                   END AS seg
              FROM customer ORDER BY ckey"""),
      (s, d) => customer(s, d).select(
        col("c_custkey").as("ckey"),
        Normalize.replaceStrict(col("c_mktsegment"), Seq(
          "BUILDING" -> "bld", "AUTOMOBILE" -> "auto",
          "MACHINERY" -> "mach", "HOUSEHOLD" -> "hh",
          "FURNITURE" -> "furn")).as("seg")
      ).orderBy("ckey")),

    // P10/P11: casts + fill_null/coalesce
    // (reference `mm2.py:33,52`, `mm1.py:25`, `threshold.py:51`)
    QueryDef("q_cast_fill",
      Some("""SELECT o_orderkey AS okey,
              CAST(trunc(o_totalprice) AS BIGINT) AS price_int,
              CAST(o_orderkey AS VARCHAR) AS okey_str,
              coalesce(nullif(o_orderpriority, '1-URGENT'), 'WAS_URGENT') AS prio
              FROM orders ORDER BY okey"""),
      // sort-first (r16, guide §1.2; see q_mask_tokens)
      (s, d) => orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy("o_orderkey")
        .select(
          col("o_orderkey").as("okey"),
          col("o_totalprice").cast("bigint").as("price_int"),
          col("o_orderkey").cast("string").as("okey_str"),
          coalesce(nullif(col("o_orderpriority"), lit("1-URGENT")),
            lit("WAS_URGENT")).as("prio"))),

    // P12: whole-row distinct (reference `delinquent_data_submitters.py:67`)
    QueryDef("q_distinct",
      Some("""SELECT DISTINCT l_returnflag AS rflag, l_linestatus AS lstatus
              FROM lineitem ORDER BY rflag, lstatus"""),
      (s, d) => lineitem(s, d)
        .select(col("l_returnflag").as("rflag"), col("l_linestatus").as("lstatus"))
        .distinct()
        .orderBy("rflag", "lstatus")),

    // P12/W2: keyed keep-first dedup with priority order
    // (reference `mm2.py:37-38` sort + unique(keep='first'))
    QueryDef("q_keepfirst",
      Some("""SELECT l_orderkey AS okey, l_linenumber AS line,
                     l_extendedprice AS price
              FROM lineitem
              QUALIFY row_number() OVER (PARTITION BY l_orderkey
                ORDER BY l_extendedprice DESC, l_linenumber) = 1
              ORDER BY okey"""),
      (s, d) => Relational.keepFirst(
        lineitem(s, d), Seq("l_orderkey"),
        Seq(col("l_extendedprice").desc, col("l_linenumber").asc))
        .select(col("l_orderkey").as("okey"), col("l_linenumber").as("line"),
          col("l_extendedprice").as("price"))
        .orderBy("okey")),

    // P7: membership by literal list (reference `is_in`)
    QueryDef("q_isin",
      Some("""SELECT o_orderkey AS okey, o_orderpriority AS prio FROM orders
              WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
              ORDER BY okey"""),
      (s, d) => orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_orderkey").as("okey"), col("o_orderpriority").as("prio"))
        .orderBy("okey")),

    // P14: ordinal() as a pure Column expr (reference `mu_extras.py:140`)
    QueryDef("q_ordinal",
      Some("""SELECT l_orderkey AS okey, l_linenumber AS line,
              CAST(l_linenumber AS VARCHAR) ||
                (CASE WHEN l_linenumber % 100 BETWEEN 11 AND 13 THEN 'th'
                      WHEN l_linenumber % 10 = 1 THEN 'st'
                      WHEN l_linenumber % 10 = 2 THEN 'nd'
                      WHEN l_linenumber % 10 = 3 THEN 'rd'
                      ELSE 'th' END) AS line_ord
              FROM lineitem ORDER BY okey, line"""),
      // sort-first (r16, guide §1.2; see q_mask_tokens): projection
      // above the sort so the ORDER BY's sampling job re-executes only
      // the two-column scan, not the ordinal expression
      (s, d) => lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy("l_orderkey", "l_linenumber")
        .select(
          col("l_orderkey").as("okey"),
          col("l_linenumber").as("line"),
          Normalize.ordinal(col("l_linenumber")).as("line_ord"))),

    // P15: deterministic exact-n sample (reference `check_masked.py:73`).
    // The sample orders by PORTABLE md5(concat_ws('|', seed)) — DuckDB
    // computes the identical digests, so the same 20 rows fall out and
    // the query is fully hash-checkable (closing the round-5 no_oracle
    // gap). Final ORDER BY ckey makes row order total on both sides.
    QueryDef("q_sample",
      Some("""SELECT ckey, name FROM (
                SELECT c_custkey AS ckey, c_name AS name FROM customer
                ORDER BY md5(concat_ws('|', CAST(c_custkey AS VARCHAR))),
                  c_custkey
                LIMIT 20)
              ORDER BY ckey"""),
      (s, d) => Relational.sampleN(customer(s, d), 20, Seq("c_custkey"))
        .select(col("c_custkey").as("ckey"), col("c_name").as("name"))
        .orderBy("ckey"))
  )
}
