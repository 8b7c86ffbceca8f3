package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.5 — the TPC-H SUBQUERY-DECORRELATION shapes (Q4, Q11,
  * Q16, Q17, Q21, Q22 analogues on the fixture schema). Each is a
  * canonical correlated-subquery pattern re-expressed Spark-first as the
  * join the optimizer would decorrelate it into — semi joins for EXISTS,
  * anti joins for NOT EXISTS / NOT IN (null-free keys), broadcast
  * scalars for uncorrelated aggregates, groupBy + join-back for
  * correlated aggregates — while every DuckDB oracle keeps the
  * SUBQUERY formulation, proving the decorrelated plan computes the
  * same relation. partsupp is the deterministic synthesis in
  * `Tables.partsupp` (the fixture has none); "late" lineitems are
  * reshaped as shipdate > orderdate + 60 days (the fixture lacks
  * commit/receipt dates).
  *
  * Scale notes: every fact-sized join below shuffles on its natural key
  * (orderkey / partkey / custkey); dims and scalar aggregates ride
  * broadcasts; linear-growth tables (customer, supplier) carry NO
  * broadcast hints — AQE decides per scale (advisor r8).
  */
object TpchShapes extends QueryModule {

  private val LATE_DAYS = 60

  val queries: Map[String, Q] = Map(
    "q4_priority" -> ((s, dir) => {
      // Q4 shape — EXISTS correlated semi join: count orders per
      // priority having at least one late line. The semi join carries
      // the equi key plus the non-equi lateness predicate; nothing
      // after it sees lineitem, so the fact table contributes no rows
      // past the join — the decorrelation of EXISTS.
      val o = T.load(s, dir, "orders")
      val l = T.load(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
                col("l_shipdate").cast("date") >
                  date_add(col("o_orderdate").cast("date"), LATE_DAYS),
             "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    "q11_important_stock" -> ((s, dir) => {
      // Q11 shape — HAVING against an UNcorrelated scalar subquery:
      // per-part stock value vs a multiple of the MEAN part value (the
      // classic fixed fraction-of-total is scale-dependent — it empties
      // at any SF where parts outnumber 1/fraction; 1.3x the mean keeps
      // a selective-but-nonempty set at every SF). The scalar lands as
      // a broadcast single-row cross join; both aggs share the
      // decimal-quantized sum so the threshold compare is exact
      // cross-engine.
      val v = T.partsupp(s, dir)
        .groupBy("ps_partkey")
        .agg(T.d(sum(T.dec(col("ps_supplycost") * col("ps_availqty"))))
               .as("value"))
      val tot = v.agg((T.d(sum(T.dec(col("value")))) /
                        count(lit(1))).as("mean_value"))
      v.crossJoin(broadcast(tot))
        .filter(col("value") > col("mean_value") * 1.3)
        .select(col("ps_partkey"), col("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    }),

    "q16_supplier_cnt" -> ((s, dir) => {
      // Q16 shape — NOT IN over a null-free subquery + COUNT DISTINCT:
      // suppliers per part spec, excluding a computed supplier
      // blocklist (negative-ish balance stands in for the complaints
      // predicate). Null-free key → NOT IN plans as a plain anti join,
      // not the null-aware variant (filter_not_in_null covers that).
      val ps = T.partsupp(s, dir)
      val p = T.load(s, dir, "part")
        .filter(col("p_type") =!= "ECONOMY" &&
                col("p_size").isin(5, 10, 15, 20))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val bad = T.load(s, dir, "supplier")
        .filter(col("s_acctbal") < 500.0).select("s_suppkey")
      ps.join(broadcast(p), col("ps_partkey") === col("p_partkey"))
        .join(bad, col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc,
                 col("p_brand"), col("p_type"), col("p_size"))
    }),

    "q17_small_quantity" -> ((s, dir) => {
      // Q17 shape — CORRELATED scalar aggregate per outer row: lines
      // below half their part's average quantity. Decorrelates to a
      // groupBy(partkey) average joined back on the same key — the agg
      // and the join hash identically, so AQE reuses the exchange (the
      // q18/q2 pattern). The average is decimal-sum / count, exact in
      // both engines, then one IEEE multiply for the threshold.
      val l = T.load(s, dir, "lineitem")
      val p = T.load(s, dir, "part").filter(col("p_brand") === "Brand#7")
        .select("p_partkey")
      val avgQ = l.groupBy(col("l_partkey").as("aq_partkey"))
        .agg((T.d(sum(T.dec(col("l_quantity")))) /
               count(lit(1))).as("avg_qty"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(avgQ, col("l_partkey") === col("aq_partkey"))
        .filter(col("l_quantity") < col("avg_qty") * 0.5)
        .agg(count(lit(1)).as("n_lines"),
             T.d(sum(T.dec(col("l_extendedprice")))).as("sum_price"))
    }),

    "q21_waiting_supplier" -> ((s, dir) => {
      // Q21 shape — EXISTS + NOT EXISTS double correlation: suppliers
      // whose line was the ONLY late one on a multi-supplier order.
      // Decorrelation: one (orderkey, suppkey)-grain pre-agg, then a
      // semi join (some OTHER supplier on the order) and an anti join
      // (no OTHER supplier late) against the same grain — two hash
      // joins on orderkey instead of two correlated probes per row.
      val o = T.load(s, dir, "orders").select("o_orderkey", "o_orderdate")
      val g = T.load(s, dir, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .agg(max(col("l_shipdate").cast("date") >
               date_add(col("o_orderdate").cast("date"), LATE_DAYS))
             .as("late"))
      val late = g.filter(col("late"))
      val others = g.select(col("ok").as("ok2"), col("sk").as("sk2"),
                            col("late").as("late2"))
      late
        .join(others, col("ok") === col("ok2") && col("sk") =!= col("sk2"),
              "left_semi")
        .join(others.filter(col("late2")),
              col("ok") === col("ok2") && col("sk") =!= col("sk2"),
              "left_anti")
        .groupBy("sk").agg(count(lit(1)).as("n_waiting"))
        .join(T.load(s, dir, "supplier"), col("sk") === col("s_suppkey"))
        .select(col("s_name"), col("n_waiting"))
        .orderBy(col("n_waiting").desc, col("s_name"))
        .limit(20)
    }),

    "q22_idle_customers" -> ((s, dir) => {
      // Q22 shape — uncorrelated scalar (average positive balance) +
      // NOT EXISTS with a predicate (customers who never placed an
      // URGENT order — every fixture customer has SOME order, so the
      // bare no-orders form is vacuous): the scalar broadcasts, the
      // NOT EXISTS is an anti join on custkey over the filtered orders
      // side, and the report groups by segment. No fact-sized sort
      // anywhere.
      val c = T.load(s, dir, "customer")
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg((T.d(sum(T.dec(col("c_acctbal")))) /
               count(lit(1))).as("avg_bal"))
      c.join(T.load(s, dir, "orders")
               .filter(col("o_orderpriority") === "1-URGENT")
               .select("o_custkey"),
             col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
             T.d(sum(T.dec(col("c_acctbal")))).as("total_bal"))
        .orderBy("c_mktsegment")
    }),
  )

  private def dsum(inner: String) =
    s"CAST(CAST(sum(CAST($inner AS DECIMAL(38,6))) AS VARCHAR(64)) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
    "q4_priority" ->
      s"""SELECT o_orderpriority, count(*) AS n_orders
          FROM orders
          WHERE EXISTS (SELECT 1 FROM lineitem
                        WHERE l_orderkey = o_orderkey
                          AND CAST(l_shipdate AS DATE) >
                              CAST(o_orderdate AS DATE) + $LATE_DAYS)
          GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q11_important_stock" ->
      s"""WITH ps AS (${T.partsuppSql}),
              v AS (SELECT ps_partkey,
                           ${dsum("ps_supplycost * ps_availqty")} AS value
                    FROM ps GROUP BY ps_partkey)
          SELECT ps_partkey, value FROM v
          WHERE value > (SELECT ${dsum("value")} / count(*) FROM v) * 1.3
          ORDER BY value DESC, ps_partkey""",

    "q16_supplier_cnt" ->
      s"""WITH ps AS (${T.partsuppSql})
          SELECT p_brand, p_type, p_size,
                 count(DISTINCT ps_suppkey) AS supplier_cnt
          FROM ps JOIN part ON ps_partkey = p_partkey
          WHERE p_type <> 'ECONOMY' AND p_size IN (5, 10, 15, 20)
            AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                   WHERE s_acctbal < 500.0)
          GROUP BY p_brand, p_type, p_size
          ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

    "q17_small_quantity" ->
      s"""SELECT count(*) AS n_lines,
                 ${dsum("l_extendedprice")} AS sum_price
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#7'
            AND l_quantity < (SELECT ${dsum("l2.l_quantity")} / count(*)
                              FROM lineitem l2
                              WHERE l2.l_partkey = lineitem.l_partkey) * 0.5""",

    "q21_waiting_supplier" ->
      s"""WITH g AS (SELECT l_orderkey AS ok, l_suppkey AS sk,
                            max(CASE WHEN CAST(l_shipdate AS DATE) >
                                      CAST(o_orderdate AS DATE) + $LATE_DAYS
                                     THEN 1 ELSE 0 END) = 1 AS late
                     FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                     GROUP BY l_orderkey, l_suppkey)
          SELECT s_name, count(*) AS n_waiting
          FROM g g1 JOIN supplier ON g1.sk = s_suppkey
          WHERE g1.late
            AND EXISTS (SELECT 1 FROM g g2
                        WHERE g2.ok = g1.ok AND g2.sk <> g1.sk)
            AND NOT EXISTS (SELECT 1 FROM g g3
                            WHERE g3.ok = g1.ok AND g3.sk <> g1.sk
                              AND g3.late)
          GROUP BY s_name
          ORDER BY n_waiting DESC, s_name LIMIT 20""",

    "q22_idle_customers" ->
      s"""SELECT c_mktsegment, count(*) AS n_cust,
                 ${dsum("c_acctbal")} AS total_bal
          FROM customer
          WHERE c_acctbal > (SELECT ${dsum("c2.c_acctbal")} / count(*)
                             FROM customer c2 WHERE c2.c_acctbal > 0.0)
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderpriority = '1-URGENT')
          GROUP BY c_mktsegment ORDER BY c_mktsegment""",
  )
}
