package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.BucketedTables
import graft.text.{Sampling, TextAnalysis}

/** Round-3 scale kit: the storage-layout and corpus-management
  * operators a 100 TB training-data pipeline runs daily — bucketed
  * zero-shuffle joins, vocabulary building, incremental (snapshot-
  * over-snapshot) dedup, group-disjoint train/val splitting, and
  * per-domain quota sampling. All decisions key on md5 so the DuckDB
  * oracle draws bit-identical outcomes (see text.Sampling).
  */
object ScaleQueries {
  import Tables._

  val defs: Seq[QueryDef] = Seq(

    // bucketed-table join: both sides bucketed by the join key into
    // the same bucket count at ingest, so the join (and any downstream
    // agg on that key) runs with NO exchange — the shuffle is paid
    // once at write time, not per query. BucketedTablesSpec pins the
    // plan shape (zero ShuffleExchange with broadcast disabled); this
    // query pins the results
    QueryDef("q_bucketed_join",
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
                     CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS price_cents
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY 1 ORDER BY c_mktsegment"""),
      (s, d) => {
        val tag = d.replaceAll("[^0-9]", "")
        BucketedTables.writeBucketed(
          orders(s, d).select("o_custkey", "o_totalprice"),
          s"g_orders_b$tag", "o_custkey", 8, Seq("o_custkey"),
          Some(s"/tmp/graft_bucketed/$tag/orders"))
        BucketedTables.writeBucketed(
          customer(s, d).select("c_custkey", "c_mktsegment"),
          s"g_customer_b$tag", "c_custkey", 8, Seq("c_custkey"),
          Some(s"/tmp/graft_bucketed/$tag/customer"))
        s.table(s"g_orders_b$tag")
          .join(s.table(s"g_customer_b$tag"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long")
              .as("price_cents"))
          .orderBy("c_mktsegment")
      }),

    // vocabulary building (tokenizer training prep): corpus-frequency
    // and document-frequency of every token, top 50. One explode +
    // one partial-agg'd groupBy + TakeOrderedAndProject — the full
    // corpus streams through map-side combines, never a global sort
    QueryDef("q_vocab",
      Some("""SELECT tok, count(*) AS n, count(DISTINCT doc_id) AS df_docs
              FROM (SELECT doc_id,
                      unnest(string_split_regex(trim(text), '\s+')) AS tok
                    FROM documents)
              GROUP BY tok ORDER BY n DESC, tok LIMIT 50"""),
      (s, d) => documents(s, d)
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("n"), countDistinct("doc_id").as("df_docs"))
        .orderBy(desc("n"), asc("tok"))
        .limit(50)),

    // incremental dedup: admit only new-snapshot docs whose content
    // digest is absent from the existing corpus — the cross-snapshot
    // half of dedup (exact/minhash handle within-snapshot). Anti-join
    // carries 16-byte digests, never documents; at 100 TB the old
    // side is the pre-computed digest index of the corpus
    QueryDef("q_incremental_dedup",
      Some("""SELECT n.doc_id, n.lang, n.source
              FROM documents n
              WHERE n.doc_id % 2 = 1 AND NOT EXISTS (
                SELECT 1 FROM documents o
                WHERE o.doc_id % 2 = 0 AND md5(o.text) = md5(n.text))
              ORDER BY n.doc_id"""),
      (s, d) => {
        val docs = documents(s, d)
        val oldDigests = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
          .select(md5(col("text")).as("digest"))
        docs.filter(pmod(col("doc_id"), lit(2)) === 1)
          .withColumn("digest", md5(col("text")))
          .join(oldDigests, Seq("digest"), "left_anti")
          .select("doc_id", "lang", "source")
          .orderBy("doc_id")
      }),

    // group-disjoint train/val split: the gate hashes the GROUP key
    // (source domain), so every doc of a domain lands in the same
    // split — the leakage-safe split for near-duplicate-heavy corpora.
    // Pure map-side decision; reproducible across runs, partitionings,
    // and engines (md5 gate, threshold 0.75 -> first hex byte < 0xc0)
    QueryDef("q_group_split",
      Some("""SELECT CASE WHEN substring(md5(source), 1, 2) < 'c0'
                       THEN 'train' ELSE 'val' END AS split,
                     lang, count(*) AS n_docs,
                     CAST(sum(n_chars) AS BIGINT) AS chars
              FROM documents GROUP BY 1, 2 ORDER BY split, lang"""),
      (s, d) => documents(s, d)
        .withColumn("split",
          when(Sampling.hashGate(col("source"), 0.75), "train")
            .otherwise("val"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("chars"))
        .orderBy("split", "lang")),

    // per-domain quota: cap every source at K docs, chosen in
    // deterministic md5 order (domain balancing — no single crawl
    // domain may dominate the mix). Hash-partitioned window, no
    // global sort; ties broken by doc_id so both engines agree
    QueryDef("q_domain_quota",
      Some("""SELECT doc_id, source, rk FROM (
                SELECT doc_id, source,
                       row_number() OVER (PARTITION BY source
                         ORDER BY md5(text), doc_id) AS rk
                FROM documents)
              WHERE rk <= 5 ORDER BY source, doc_id"""),
      (s, d) => documents(s, d)
        .withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy(md5(col("text")), col("doc_id"))))
        .filter(col("rk") <= 5)
        .select("doc_id", "source", "rk")
        .orderBy("source", "doc_id"))
  )
}
