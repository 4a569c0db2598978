package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{Checksums, DateFormats}

/** Date/time + math surface (SURVEY.md §2.9/2.10), including the
  * chrono→JDK format translation and the DEA/NPI checksum expressions.
  */
object DateMathQueries {
  import Tables._

  private val mdY = DateFormats.chronoToJdk("%m/%d/%Y") // "MM/dd/yyyy"
  private val long = DateFormats.chronoToJdk("%B %d, %Y") // "MMMM dd, yyyy"

  val defs: Seq[QueryDef] = Seq(

    // D1/D3: format (strftime) then re-parse (strptime) through the
    // chrono-pattern translation table (reference formats `%m/%d/%Y`,
    // `%B %d, %Y` at `od.py:27`, `activity_request.py:189`)
    QueryDef("q_date_roundtrip",
      Some("""SELECT o_orderkey AS okey,
                     strftime(o_orderdate, '%m/%d/%Y') AS mdy,
                     strftime(o_orderdate, '%B %d, %Y') AS longfmt,
                     CAST(strptime(strftime(o_orderdate, '%m/%d/%Y'), '%m/%d/%Y')
                       AS DATE) AS reparsed
              FROM orders ORDER BY okey"""),
      // sort-first (r16, guide §1.2; see q_mask_tokens): the global
      // ORDER BY's range-sampling job re-executes its child, so the
      // format/parse projection sits ABOVE the sort and runs once —
      // same rows, order and values (the sort key is the raw source
      // column the alias renames). Applies to every scan→project→sort
      // query in this batch.
      (s, d) => orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"))
        .orderBy("o_orderkey")
        .select(
          col("o_orderkey").as("okey"),
          date_format(col("o_orderdate"), mdY).as("mdy"),
          date_format(col("o_orderdate"), long).as("longfmt"),
          to_date(date_format(col("o_orderdate"), mdY), mdY).as("reparsed"))),

    // D2: 12-hour clock with no-pad hour + AM/PM through the chrono
    // translation (reference `activity_request.py:128`
    // `%-m/%-d/%Y %-l:%M:%S %p`) — format then re-parse on both
    // engines; the no-fraction format makes the round-trip
    // engine-exact even though the source has sub-second precision
    QueryDef("q_datetime_12h",
      Some("""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
              SELECT event_id,
                     strftime(ts, '%-m/%-d/%Y %-I:%M:%S %p') AS s12,
                     CAST(strptime(strftime(ts, '%-m/%-d/%Y %-I:%M:%S %p'),
                       '%-m/%-d/%Y %-I:%M:%S %p') AS VARCHAR) AS reparsed
              FROM e ORDER BY event_id"""),
      (s, d) => {
        val fmt12 = DateFormats.chronoToJdk("%-m/%-d/%Y %-l:%M:%S %p") // M/d/yyyy h:mm:ss a
        // sort-first (r16): see q_date_roundtrip
        events(s, d)
          .select(col("event_id"), col("ts"))
          .orderBy("event_id")
          .select(
            col("event_id"),
            date_format(col("ts"), fmt12).as("s12"),
            to_timestamp(date_format(col("ts"), fmt12), fmt12)
              .cast("string").as("reparsed"))
      }),

    // D4/D5/D6: date_add, datediff, month/year extract, between
    // (reference `delinquent_data_submitters.py:96,127`, `techs.py:40-45`)
    QueryDef("q_date_arith",
      Some("""SELECT o_orderkey AS okey,
                     CAST(o_orderdate AS DATE) + 1 AS next_day,
                     datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                       AS days_since,
                     month(o_orderdate) AS m, year(o_orderdate) AS y
              FROM orders
              WHERE CAST(o_orderdate AS DATE)
                    BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
              ORDER BY okey"""),
      (s, d) => orders(s, d)
        .filter(to_date(col("o_orderdate"))
          .between(lit("1995-01-01"), lit("1996-12-31")))
        .select(
          col("o_orderkey").as("okey"),
          date_add(to_date(col("o_orderdate")), 1).as("next_day"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .as("days_since"),
          month(col("o_orderdate")).as("m"),
          year(col("o_orderdate")).as("y"))
        .orderBy("okey")),

    // M1/M2/M3: column arithmetic, floor-div, modulo, comparisons, round
    // (reference `awarxe_cleanup.py:66-67`, `mm2.py:75-81`)
    QueryDef("q_math_kit",
      Some("""SELECT l_orderkey AS okey, l_linenumber AS line,
                     l_partkey % 7 AS pk_mod,
                     CAST(floor(l_extendedprice / 100) AS BIGINT) AS price_cent,
                     CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)
                       AS discount_cents,
                     l_quantity >= 20 AS big_qty
              FROM lineitem ORDER BY okey, line"""),
      // sort-first (r16): see q_date_roundtrip
      (s, d) => lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_extendedprice"), col("l_discount"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")
        .select(
          col("l_orderkey").as("okey"), col("l_linenumber").as("line"),
          (col("l_partkey") % 7).as("pk_mod"),
          floor(col("l_extendedprice") / 100).as("price_cent"),
          floor(col("l_extendedprice") * col("l_discount") * 100 + 0.5)
            .as("discount_cents"),
          (col("l_quantity") >= 20).as("big_qty"))),

    // M4: DEA mod-10 checksum over synthesized registration numbers
    // (reference `awarxe_cleanup.py:57-69`)
    QueryDef("q_dea_checksum",
      Some("""WITH t AS (SELECT o_orderkey,
                'AB' || lpad(CAST(o_orderkey % 10000000 AS VARCHAR), 7, '0') AS dea
              FROM orders)
              SELECT o_orderkey AS okey, dea,
                (regexp_matches(dea, '^[ABCFGHMPR][A-Z][0-9]{7}$')
                 AND substr(dea, 3, 7) <> '0000000'
                 AND (CAST(substr(dea,3,1) AS INT) + CAST(substr(dea,5,1) AS INT)
                    + CAST(substr(dea,7,1) AS INT)
                    + 2 * (CAST(substr(dea,4,1) AS INT) + CAST(substr(dea,6,1) AS INT)
                         + CAST(substr(dea,8,1) AS INT))) % 10
                     = CAST(substr(dea,9,1) AS INT)) AS dea_ok
              FROM t ORDER BY okey"""),
      // sort-first (r16): see q_date_roundtrip — and the sort now
      // carries ONE long per row instead of the synthesized strings
      (s, d) => {
        val dea = concat(lit("AB"),
          lpad((col("o_orderkey") % 10000000).cast("string"), 7, "0"))
        orders(s, d)
          .select(col("o_orderkey"))
          .orderBy("o_orderkey")
          .select(
            col("o_orderkey").as("okey"), dea.as("dea"),
            Checksums.deaValid(dea).as("dea_ok"))
      }),

    // M5: NPI Luhn checksum (reference `awarxe_cleanup.py:183-199`)
    QueryDef("q_npi_checksum",
      Some("""WITH t AS (SELECT o_orderkey,
                lpad(CAST((o_orderkey * 7919) % 10000000000 AS VARCHAR), 10, '0') AS npi
              FROM orders)
              SELECT o_orderkey AS okey, npi,
                (regexp_matches(npi, '^[0-9]{10}$')
                 AND (list_sum(list_transform(range(1, 10), i ->
                        CASE WHEN i % 2 = 1 THEN
                          CASE WHEN 2 * CAST(substr(npi, CAST(i AS INT), 1) AS INT) > 9
                               THEN 2 * CAST(substr(npi, CAST(i AS INT), 1) AS INT) - 9
                               ELSE 2 * CAST(substr(npi, CAST(i AS INT), 1) AS INT) END
                        ELSE CAST(substr(npi, CAST(i AS INT), 1) AS INT) END))
                      + 24 + CAST(substr(npi, 10, 1) AS INT)) % 10 = 0) AS npi_ok
              FROM t ORDER BY okey"""),
      // sort-first (r16): see q_date_roundtrip
      (s, d) => {
        val npi = lpad(((col("o_orderkey") * 7919) % 10000000000L).cast("string"),
          10, "0")
        orders(s, d)
          .select(col("o_orderkey"))
          .orderBy("o_orderkey")
          .select(
            col("o_orderkey").as("okey"), npi.as("npi"),
            Checksums.npiValid(npi).as("npi_ok"))
      }),

    // D7 (frame-scale form): business-day deadline per row via the
    // closed-form BusinessCalendar.addBusinessDaysCol — no UDF, no
    // iteration (reference `delinquent_data_submitters.py:407,432`:
    // add_business_days deadline stamped onto every row). The oracle
    // replays the same roll-forward + whole-weeks + remainder
    // arithmetic; DuckDB's dayofweek is 0=Sun..6=Sat vs Spark's
    // 1=Sun..7=Sat, both normalized to Monday-0-based first.
    QueryDef("q_deadline",
      Some("""WITH t AS (
                SELECT o_orderkey AS okey, CAST(o_orderdate AS DATE) AS d,
                       (dayofweek(CAST(o_orderdate AS DATE)) + 6) % 7 AS mon0
                FROM orders),
              r AS (
                SELECT okey, d,
                  d + CASE WHEN mon0 = 5 THEN 2 WHEN mon0 = 6 THEN 1 ELSE 0 END
                    AS rolled,
                  CASE WHEN mon0 >= 5 THEN 0 ELSE mon0 END AS wd
                FROM t)
              SELECT okey, d AS odate,
                rolled + CAST(((wd + 5) // 5) * 7 + ((wd + 5) % 5) - wd AS INT)
                  AS deadline5,
                rolled + CAST(((wd + 10) // 5) * 7 + ((wd + 10) % 5) - wd AS INT)
                  AS deadline10
              FROM r ORDER BY okey"""),
      // sort-first (r16): see q_date_roundtrip
      (s, d) => {
        val od = to_date(col("o_orderdate"))
        orders(s, d)
          .select(col("o_orderkey"), col("o_orderdate"))
          .orderBy("o_orderkey")
          .select(
            col("o_orderkey").as("okey"), od.as("odate"),
            graft.time.BusinessCalendar.addBusinessDaysCol(od, 5).as("deadline5"),
            graft.time.BusinessCalendar.addBusinessDaysCol(od, 10).as("deadline10"))
      })
  )
}
