package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.CsvSources

/** CSV source/sink round-trips (SURVEY.md §2.1 S1/S2/S9). Each query
  * materializes a CSV copy of a fixture table under /tmp inside the
  * query (sink), re-reads it all-string (scan), casts explicitly, and
  * must reproduce the parquet content exactly — the oracle reads the
  * original parquet, so any loss in the CSV round-trip (quoting,
  * separators, null handling, type casts) fails the hash match.
  */
object CsvQueries {
  import Tables._

  /** The re-read side of q_orc_roundtrip — exposed so PlanSpec can pin
    * the pushed predicate on the inner scan (the registered query's
    * outer plan is the deferred SinkThenScan leaf).
    */
  private[graft] def orcReread(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    s.read.orc(dir)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey").as("okey"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").as("price"),
        col("o_orderdate").cast("string").as("odate"))
      .orderBy("okey")

  val defs: Seq[QueryDef] = Seq(

    // S1 + S9: all-string comma CSV round-trip with explicit casts
    QueryDef("q_csv_roundtrip",
      Some("""SELECT c_custkey AS ckey, c_name AS cname,
                     c_nationkey AS nkey, c_acctbal AS bal
              FROM customer ORDER BY ckey"""),
      (s, d) => {
        val dir = s"/tmp/graft_csv/roundtrip_${Tables.tmpKey(d)}"
        CsvSources.writeCsv(customer(s, d), dir)
        CsvSources.scanCsv(s, dir).select(
          col("c_custkey").cast("bigint").as("ckey"),
          col("c_name").as("cname"),
          col("c_nationkey").cast("int").as("nkey"),
          col("c_acctbal").cast("double").as("bal")
        ).orderBy("ckey")
      }),

    // S4: header-offset read round-trip (reference
    // permit_inspection_licenses.py:19, header_row=4): write a
    // banner-prefixed CSV of the nation table with an RFC-4180-quoted
    // comma-bearing field, read it back through scanCsvSkipRows, and
    // reproduce the parquet content. The file build collects nation —
    // 25 rows, the "small manual input" the reference hand-feeds.
    QueryDef("q_csv_skiprows",
      Some("""SELECT n_nationkey AS nkey, n_name AS nname,
                     n_name || ', r' || CAST(n_regionkey AS VARCHAR) AS tag
              FROM nation ORDER BY nkey"""),
      (s, d) => {
        import java.nio.file.{Files, Paths}
        val rows = nation(s, d)
          .select(col("n_nationkey"), col("n_name"),
            concat(col("n_name"), lit(", r"), col("n_regionkey")).as("tag"))
          .orderBy("n_nationkey").collect()
        def quote(v: String) = "\"" + v.replace("\"", "\"\"") + "\""
        val content = (Seq("Permit Inspection Report", "Generated: fixture",
          "nkey,nname,tag") ++
          rows.map(r => s"${r.get(0)},${quote(r.getString(1))},${quote(r.getString(2))}"))
          .mkString("\n")
        Files.createDirectories(Paths.get("/tmp/graft_csv"))
        val f = s"/tmp/graft_csv/skiprows_${Tables.tmpKey(d)}.csv"
        Files.writeString(Paths.get(f), content)
        CsvSources.scanCsvSkipRows(s, f, skipRows = 2)
          .select(col("nkey").cast("int").as("nkey"),
            col("nname"), col("tag"))
          .orderBy("nkey")
      }),

    // extension: JSON-lines round-trip (corpus interchange format) —
    // write documents as JSONL, re-read with the EXPLICIT parquet
    // schema, reproduce the parquet content exactly (escaping of
    // quotes/newlines in text plus long/string types all survive)
    QueryDef("q_jsonl_roundtrip",
      Some("""SELECT doc_id, text, lang, source, n_chars
              FROM documents ORDER BY doc_id"""),
      (s, d) => {
        val dir = s"/tmp/graft_jsonl/docs_${Tables.tmpKey(d)}"
        val docs = documents(s, d)
        graft.sources.JsonSources.writeJsonl(docs, dir)
        graft.sources.JsonSources.scanJsonl(s, dir, docs.schema)
          .select("doc_id", "text", "lang", "source", "n_chars")
          .orderBy("doc_id")
      }),

    // extension: ORC round-trip (columnar interchange beyond parquet —
    // Spark's NATIVE orc datasource, zero extra deps). Write orders
    // typed to ORC, re-read, filter + project: the re-read filter must
    // reach the ORC scan as a pushed predicate (PlanSpec pins
    // PushedFilters on the orc relation — at 100 TB the format hop is
    // only acceptable if stripe-level pruning still works on the far
    // side), and long/string/double/timestamp must all survive the
    // format change exactly or the hash fails.
    QueryDef("q_orc_roundtrip",
      Some("""SELECT o_orderkey AS okey, o_orderstatus AS status,
                     o_totalprice AS price,
                     CAST(o_orderdate AS VARCHAR) AS odate
              FROM orders WHERE o_totalprice > 400000 ORDER BY okey"""),
      (s, d) => {
        val dir = s"/tmp/graft_orc/orders_${Tables.tmpKey(d)}"
        // DEFERRED sink: the ORC write used to run eagerly at
        // plan-build time, billing whatever phase built the plan
        // (Lint/Explain/Bench's untimed setup). SinkThenScan defers it
        // to first action, so Bench times the write inside this
        // query's own measurement and a plan-only build writes
        // nothing. PlanSpec pins the pushed filter on the INNER
        // re-read plan (orcReread below).
        graft.plans.SinkThenScan.roundTrip(s,
          org.apache.spark.sql.types.StructType.fromDDL(
            "okey BIGINT, status STRING, price DOUBLE, odate STRING"),
          sp => orders(sp, d).write.mode("overwrite").orc(dir),
          sp => orcReread(sp, dir))
      }),

    // S2: pipe-separated extract round-trip (reference scorecard.py:32)
    QueryDef("q_csv_pipe",
      Some("""SELECT s_suppkey AS skey, s_name AS sname,
                     s_acctbal AS bal
              FROM supplier ORDER BY skey"""),
      (s, d) => {
        val dir = s"/tmp/graft_csv/pipe_${Tables.tmpKey(d)}"
        CsvSources.writeCsv(supplier(s, d), dir, sep = "|")
        CsvSources.scanCsv(s, dir, sep = "|").select(
          col("s_suppkey").cast("bigint").as("skey"),
          col("s_name").as("sname"),
          col("s_acctbal").cast("double").as("bal")
        ).orderBy("skey")
      })
  )
}
