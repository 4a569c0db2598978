package graft.queries

import org.apache.spark.sql.functions._

import graft.text.Importance

/** Data-selection operators: scoring raw corpus documents against a
  * target distribution to decide what goes into the training mix.
  */
object SelectionQueries {
  import Tables._

  /** The DuckDB spelling of `poly_hash(g) % b`: the same `acc*31+cp`
    * char fold PolyHash codegens, as a list_reduce over the string's
    * characters.
    */
  private def polyHashSql(g: String, b: Int): String =
    s"""(list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(1, length($g)+1),
            i2 -> CAST(ascii(substr($g, CAST(i2 AS INT), 1)) AS BIGINT))),
          (acc, c) -> (acc * 31 + c) % 1000000007) % $b)"""

  val defs: Seq[QueryDef] = Seq(

    // DSIR-shaped importance scoring: hashed-bigram target-vs-raw rate
    // ratios (integer ppm), mean per document. Target = lang 'en'.
    // Scale shape: one bucket-keyed shuffle (<=1024 keys) for stats,
    // broadcast score probe, one id-keyed mean — the corpus text
    // explodes once and never crosses the wire as strings
    QueryDef("q_importance",
      Some(s"""WITH t AS (SELECT doc_id, lang = 'en' AS tgt,
                  string_split_regex(trim(text), '\\s+') AS toks
                FROM documents),
              bg AS (SELECT doc_id, tgt, unnest(
                  CASE WHEN len(toks) >= 2 THEN
                    list_transform(range(1, len(toks)), i ->
                      toks[CAST(i AS INT)] || ' ' || toks[CAST(i+1 AS INT)])
                  ELSE [] END) AS g
                FROM t),
              bk AS (SELECT doc_id, tgt, ${polyHashSql("g", 1024)} AS bucket
                FROM bg),
              s AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cnt_r,
                  CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t
                FROM bk GROUP BY 1),
              tot AS (SELECT CAST(sum(cnt_r) AS BIGINT) AS r_tot,
                  CAST(sum(cnt_t) AS BIGINT) AS t_tot FROM s),
              sc AS (SELECT bucket,
                  CAST((CAST(1000000 AS HUGEINT) * (cnt_t + 1) * (r_tot + 1024))
                    // ((cnt_r + 1) * (t_tot + 1024)) AS BIGINT) AS score_ppm
                FROM s, tot),
              d AS (SELECT bk.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                  CAST(sum(score_ppm) // count(*) AS BIGINT) AS imp_ppm
                FROM bk JOIN sc USING (bucket) GROUP BY 1)
              SELECT t.doc_id,
                COALESCE(d.n_grams, CAST(0 AS BIGINT)) AS n_grams,
                COALESCE(d.imp_ppm, CAST(0 AS BIGINT)) AS imp_ppm
              FROM t LEFT JOIN d ON t.doc_id = d.doc_id
              ORDER BY t.doc_id"""),
      (s, d) => Importance.importanceScores(documents(s, d), "doc_id",
          "text", col("lang") === "en", buckets = 1024)
        .orderBy("doc_id")),

    // weight-proportional systematic sampling (RNG-free): one pick per
    // ~500 tokens of cumulative weight per source, deterministic
    // midpoint anchor. One stratum-keyed window shuffle — never a
    // global single-partition cumsum
    QueryDef("q_systematic",
      Some("""WITH t AS (SELECT doc_id, source,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                    AS n_tok
                FROM documents),
              c AS (SELECT doc_id, source, n_tok,
                  sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) AS cum
                FROM t)
              SELECT doc_id, source, n_tok,
                CAST((cum - 250 + 500) // 500
                  - (cum - n_tok - 250 + 500) // 500 AS BIGINT) AS n_picks
              FROM c
              WHERE (cum - 250 + 500) // 500
                  - (cum - n_tok - 250 + 500) // 500 >= 1
              ORDER BY doc_id"""),
      (s, d) => graft.text.Sampling.systematicSample(
        documents(s, d).select(col("doc_id"), col("source"),
          size(graft.text.TextAnalysis.tokens(col("text")))
            .cast("long").as("n_tok")),
        Seq("source"), Seq(col("doc_id")), "n_tok", step = 500L)
        .orderBy("doc_id")),

    // padding-efficiency report: batch-of-8 padding waste per source,
    // length-sorted vs arrival order — the loader's batch-assembly
    // decision on one row. Batch stats aggregate over batches, not docs
    QueryDef("q_pad_waste",
      Some("""WITH t AS (SELECT doc_id, source,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                    AS n_tok
                FROM documents),
              sb AS (SELECT source, b, count(*) AS n, max(n_tok) AS mx,
                  sum(n_tok) AS sm
                FROM (SELECT source, n_tok,
                    CAST((row_number() OVER (PARTITION BY source
                      ORDER BY n_tok DESC, doc_id) - 1) // 8 AS BIGINT) AS b
                  FROM t) GROUP BY 1, 2),
              sg AS (SELECT source, CAST(sum(n*mx - sm) AS BIGINT) AS pad_s,
                  CAST(sum(n*mx) AS BIGINT) AS slots_s
                FROM sb GROUP BY 1),
              ab AS (SELECT source, b, count(*) AS n, max(n_tok) AS mx,
                  sum(n_tok) AS sm
                FROM (SELECT source, n_tok,
                    CAST((row_number() OVER (PARTITION BY source
                      ORDER BY doc_id) - 1) // 8 AS BIGINT) AS b
                  FROM t) GROUP BY 1, 2),
              ag AS (SELECT source, CAST(sum(n*mx - sm) AS BIGINT) AS pad_a,
                  CAST(sum(n*mx) AS BIGINT) AS slots_a
                FROM ab GROUP BY 1)
              SELECT sg.source,
                CAST((1000000 * pad_s) // slots_s AS BIGINT) AS pad_sorted_ppm,
                CAST((1000000 * pad_a) // slots_a AS BIGINT) AS pad_arrival_ppm
              FROM sg JOIN ag ON sg.source = ag.source
              ORDER BY sg.source"""),
      (s, d) => graft.text.Packing.paddingReport(
        documents(s, d).select(col("doc_id"), col("source"),
          size(graft.text.TextAnalysis.tokens(col("text")))
            .cast("long").as("n_tok")),
        Seq("source"), "doc_id", "n_tok", batchRows = 8)
        .orderBy("source"))
  )
}
