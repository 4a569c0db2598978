package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Normalize

/** Flagship pipeline: the delinquent-data-submitters core re-expressed
  * over the TPC-H-ish fixtures (reference
  * `delinquent_data_submitters.py:24-107`, SURVEY.md §7 "minimum
  * end-to-end slice"). Shape: three scans → per-source normalize/filter
  * → distinct → inner join → left join (broadcast dim) → anti join →
  * wide projection with date_add + array-distinct contact merge → sort
  * by parsed date. One declarative plan end-to-end: Catalyst pushes the
  * filters into the parquet scans and broadcasts the dimension joins.
  */
object Flagship {
  import Tables._

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_delinquent",
      Some("""WITH dds AS (
                SELECT l_orderkey AS okey,
                       sum(l_quantity) AS days_delinquent,
                       max(CAST(l_shipdate AS DATE)) AS last_compliant
                FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 50
              ), lr AS (
                SELECT DISTINCT o_orderkey, o_custkey, o_orderpriority
                FROM orders WHERE starts_with(o_orderstatus, 'O')
              ), mp AS (
                SELECT c_custkey, upper(trim(c_name)) AS contact_name,
                       lower(c_mktsegment) AS contact_seg
                FROM customer WHERE c_mktsegment <> 'MACHINERY'
              ), excluded AS (
                SELECT c_custkey FROM customer WHERE c_acctbal < 0
              )
              SELECT dds.okey, lr.o_custkey AS ckey, dds.days_delinquent,
                     dds.last_compliant + 1 AS deadline,
                     mp.contact_name,
                     array_to_string(list_sort(list_distinct(
                       [coalesce(mp.contact_seg, 'none'), lr.o_orderpriority,
                        coalesce(mp.contact_seg, 'none')])), ';') AS contacts
              FROM dds
              JOIN lr ON dds.okey = lr.o_orderkey
              LEFT JOIN mp ON lr.o_custkey = mp.c_custkey
              WHERE lr.o_custkey NOT IN (SELECT c_custkey FROM excluded)
              ORDER BY dds.last_compliant, dds.okey"""),
      (s, d) => {
        val dds = lineitem(s, d)
          .groupBy(col("l_orderkey").as("okey"))
          .agg(sum("l_quantity").as("days_delinquent"),
            max(to_date(col("l_shipdate"))).as("last_compliant"))
          .filter(col("days_delinquent") > 50)
        val lr = orders(s, d)
          .filter(col("o_orderstatus").startsWith("O"))
          .select("o_orderkey", "o_custkey", "o_orderpriority")
          .distinct()
        val mp = broadcast(customer(s, d)
          .filter(col("c_mktsegment") =!= "MACHINERY")
          .select(col("c_custkey"),
            Normalize.cleanKey(col("c_name")).as("contact_name"),
            lower(col("c_mktsegment")).as("contact_seg")))
        val excluded = broadcast(customer(s, d)
          .filter(col("c_acctbal") < 0).select("c_custkey"))
        dds
          .join(lr, col("okey") === col("o_orderkey"), "inner")
          .join(mp, lr("o_custkey") === mp("c_custkey"), "left")
          .join(excluded, lr("o_custkey") === excluded("c_custkey"), "left_anti")
          .select(
            col("okey"), col("o_custkey").as("ckey"), col("days_delinquent"),
            date_add(col("last_compliant"), 1).as("deadline"),
            col("contact_name"),
            array_join(sort_array(array_distinct(array(
              coalesce(col("contact_seg"), lit("none")), col("o_orderpriority"),
              coalesce(col("contact_seg"), lit("none"))))), ";").as("contacts"),
            col("last_compliant"))
          .orderBy("last_compliant", "okey")
          .drop("last_compliant")
      })
  )
}
