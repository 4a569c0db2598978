package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Normalize

/** String + array(list) function surface (SURVEY.md §2.8/2.11) — the
  * reference's "normalize → join" kit and the list pipelines behind the
  * checksum / multi-DEA flows. All built-ins, all codegen'd.
  */
object StringArrayQueries {
  import Tables._

  val defs: Seq[QueryDef] = Seq(

    // F1/F2/F3/F5/F6/F7/F12/F13: the normalize kit in one projection
    QueryDef("q_string_kit",
      Some("""SELECT p_partkey AS pkey,
                     upper(trim(p_name)) AS name_up,
                     lower(p_brand) AS brand_lo,
                     substr(p_name, 1, 5) AS name_head,
                     right(p_name, 3) AS name_tail,
                     length(p_name) AS name_len,
                     regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
                     CASE WHEN length(CAST(p_size AS VARCHAR)) >= 6
                          THEN CAST(p_size AS VARCHAR)
                          ELSE lpad(CAST(p_size AS VARCHAR), 6, '0') END AS size_z,
                     concat_ws('|', p_brand, p_type) AS brand_type,
                     starts_with(p_type, 'STANDARD') AS is_std,
                     contains(p_name, 'red') AS has_red
              FROM part ORDER BY pkey"""),
      // sort-first (r16, guide §1.2; see q_mask_tokens)
      (s, d) => part(s, d)
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          col("p_type"), col("p_size"))
        .orderBy("p_partkey")
        .select(
          col("p_partkey").as("pkey"),
          Normalize.cleanKey(col("p_name")).as("name_up"),
          lower(col("p_brand")).as("brand_lo"),
          substring(col("p_name"), 1, 5).as("name_head"),
          substring(col("p_name"), -3, 3).as("name_tail"),
          length(col("p_name")).as("name_len"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
          Normalize.zfill(col("p_size").cast("string"), 6).as("size_z"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          col("p_type").startsWith("STANDARD").as("is_std"),
          col("p_name").contains("red").as("has_red"))),

    // F4: strip one trailing suffix from a list, longest-first
    // (reference `mm1.py:35-56` degree stripping)
    QueryDef("q_strip_suffix",
      Some("""SELECT p_partkey AS pkey,
                     regexp_replace(p_type, '(?:POLISHED|BRUSHED|PLATED)$', '')
                       AS type_stripped
              FROM part ORDER BY pkey"""),
      (s, d) => part(s, d).select(
        col("p_partkey").as("pkey"),
        Normalize.stripSuffixes(col("p_type"),
          Seq("POLISHED", "BRUSHED", "PLATED")).as("type_stripped")
      ).orderBy("pkey")),

    // F9/F10: regex contains incl. alternation (reference
    // `awarxe_cleanup.py:49`, `unreg_presc.py:122` contains_any)
    QueryDef("q_rlike",
      Some("""SELECT p_partkey AS pkey, p_name AS pname,
                     contains(p_type, string_split(p_name, ' ')[1]) AS first_in_type
              FROM part
              WHERE regexp_matches(p_name, '(red|blue)')
                AND regexp_matches(p_type, '^[A-Z]+$')
              ORDER BY pkey"""),
      (s, d) => part(s, d)
        .filter(col("p_name").rlike("(red|blue)") && col("p_type").rlike("^[A-Z]+$"))
        .select(col("p_partkey").as("pkey"), col("p_name").as("pname"),
          // column-valued needle (reference `awarxe_cleanup.py:49`
          // contains(pl.col('first_name')) — pattern from another column)
          col("p_type").contains(element_at(split(col("p_name"), " "), 1))
            .as("first_in_type"))
        .orderBy("pkey")),

    // regexp_extract_all: the S8 regex surface (reference
    // `activity_request.py:81-116` extracts ALL `[A-Z]{2}\d{7}` DEA
    // hits from page text) — here all s-words per document, as an
    // array column reduced to count + joined string
    QueryDef("q_extract_all",
      // the word gate is an explicit delimiter class, NOT \b: Java's
      // \b is Unicode-aware (ß counts as a word char) while RE2's is
      // ASCII, so `\bs[a-z]+\b` extracts 'stra' from 'straße' in
      // DuckDB and nothing in Spark — the adversarial-fixture gate
      // caught it. `(?:^|[^A-Za-z0-9_])` + greedy [a-z]+ has one
      // reading in both engines on every input.
      Some("""SELECT doc_id,
                CAST(len(m) AS BIGINT) AS n_matches,
                COALESCE(array_to_string(m, ','), '') AS all_matches
              FROM (SELECT doc_id,
                      regexp_extract_all(text,
                        '(?:^|[^A-Za-z0-9_])(s[a-z]+)', 1) AS m
                    FROM documents)
              ORDER BY doc_id"""),
      // sort-first (r16, guide §1.2; see q_mask_tokens): the extract
      // regex sweep runs once, not twice
      (s, d) => documents(s, d)
        .select(col("doc_id"), col("text"))
        .orderBy("doc_id")
        .select(col("doc_id"),
          regexp_extract_all(col("text"),
            lit("(?:^|[^A-Za-z0-9_])(s[a-z]+)"), lit(1)).as("m"))
        .select(col("doc_id"), size(col("m")).cast("long").as("n_matches"),
          array_join(col("m"), ",").as("all_matches"))),

    // F8/L1: split -> explode (reference `unreg_pharmacists.py:113,118`)
    QueryDef("q_split_explode",
      Some("""SELECT p_partkey AS pkey, unnest(string_split(p_name, ' ')) AS word
              FROM part ORDER BY pkey, word"""),
      (s, d) => part(s, d).select(
        col("p_partkey").as("pkey"),
        explode(split(col("p_name"), " ")).as("word")
      ).orderBy("pkey", "word")),

    // L2-L9: array kit over split words — element_at (incl. negative),
    // size, distinct+join, higher-order filter/transform/aggregate
    // (reference `awarxe_cleanup.py:117-128,260-279`)
    QueryDef("q_array_kit",
      Some("""WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS ws FROM part)
              SELECT p_partkey AS pkey,
                     ws[1] AS first_word,
                     ws[-1] AS last_word,
                     len(ws) AS n_words,
                     array_to_string(list_sort(list_distinct(ws)), ',') AS uniq_words,
                     len(list_filter(ws, x -> length(x) > 4)) AS n_long,
                     array_to_string(list_transform(ws, x -> upper(x)), ' ') AS all_up,
                     CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT) AS total_chars
              FROM w ORDER BY pkey"""),
      // sort-first (r16, guide §1.2; see q_mask_tokens)
      (s, d) => part(s, d)
        .select(col("p_partkey"), col("p_name"))
        .orderBy("p_partkey")
        .withColumn("ws", split(col("p_name"), " "))
        .select(
          col("p_partkey").as("pkey"),
          element_at(col("ws"), 1).as("first_word"),
          element_at(col("ws"), -1).as("last_word"),
          // BIGINT on both sides: DuckDB len() is int64 and list_sum
          // widens to HUGEINT -> the driver's pandas hash sees float64
          // unless both engines agree on int64
          size(col("ws")).cast("long").as("n_words"),
          array_join(sort_array(array_distinct(col("ws"))), ",").as("uniq_words"),
          size(filter(col("ws"), x => length(x) > 4)).cast("long").as("n_long"),
          array_join(transform(col("ws"), x => upper(x)), " ").as("all_up"),
          aggregate(col("ws"), lit(0L), (acc, x) => acc + length(x)).as("total_chars"))),

    // L7: stride slicing gather_every(2, offset) via index-aware filter
    // (reference `awarxe_cleanup.py:66-67` — the checksum digit split)
    QueryDef("q_gather_every",
      Some("""WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS ws FROM part)
              SELECT p_partkey AS pkey,
                     array_to_string(list_filter(ws, (x, i) -> (i - 1) % 2 = 0), ',')
                       AS even_words,
                     array_to_string(list_filter(ws, (x, i) -> (i - 1) % 2 = 1), ',')
                       AS odd_words
              FROM w ORDER BY pkey"""),
      // sort-first (r16, guide §1.2; see q_mask_tokens)
      (s, d) => part(s, d)
        .select(col("p_partkey"), col("p_name"))
        .orderBy("p_partkey")
        .withColumn("ws", split(col("p_name"), " "))
        .select(
          col("p_partkey").as("pkey"),
          array_join(filter(col("ws"), (_, i) => i % 2 === 0), ",").as("even_words"),
          array_join(filter(col("ws"), (_, i) => i % 2 === 1), ",").as("odd_words"))),

    // F14: concat_list -> dedupe -> join (reference
    // `delinquent_data_submitters.py:99-100` email merge across sources)
    QueryDef("q_array_merge",
      Some("""SELECT c_custkey AS ckey,
                     array_to_string(list_sort(list_distinct(
                       [lower(c_name), lower(c_mktsegment), lower(c_name)])), ',')
                       AS merged
              FROM customer ORDER BY ckey"""),
      (s, d) => customer(s, d).select(
        col("c_custkey").as("ckey"),
        array_join(sort_array(array_distinct(array(
          lower(col("c_name")), lower(col("c_mktsegment")), lower(col("c_name"))
        ))), ",").as("merged")
      ).orderBy("ckey"))
  )
}
