package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.B (projection/filter/predicates), §2.F (sort/limit/top-k),
  * §2.G (set operations).
  *
  * Determinism: per-row double arithmetic is IEEE-identical across
  * engines, so projections stay in double; only aggregates need the
  * decimal route (§2.0). Every query ends in a total order.
  */
object Relational extends QueryModule {

  /** Subquery-family queries share one SQL text between Spark and DuckDB
    * (both parse the same ANSI subset), eliminating dialect drift. */
  private val inSubquerySql =
    """SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_custkey IN (SELECT c_custkey FROM customer
                           WHERE c_mktsegment = 'BUILDING')
       ORDER BY o_orderkey"""

  private val notInNullSql = // shared Spark/DuckDB text
    """SELECT o_orderkey, ck FROM (
         SELECT o_orderkey,
                CASE WHEN o_orderkey % 10 = 0 THEN NULL
                     ELSE o_custkey END AS ck
         FROM orders)
       WHERE ck NOT IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
       ORDER BY o_orderkey"""

  private val existsCorrSql =
    """SELECT c_custkey, c_name FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_totalprice > 400000.0)
       ORDER BY c_custkey"""

  private val scalarSubquerySql =
    """SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_totalprice * (SELECT count(*) FROM orders) >
             (SELECT CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS STRING) AS DOUBLE)
              FROM orders)
       ORDER BY o_orderkey"""

  val queries: Map[String, Q] = Map(
    "project_arith" -> ((s, dir) =>
      T.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
                (col("l_extendedprice") * (lit(1) - col("l_discount")) *
                 (lit(1) + col("l_tax"))).as("charge"),
                (col("l_quantity") * col("l_extendedprice")).as("gross"))
        .orderBy("l_orderkey", "l_linenumber")),

    "project_case" -> ((s, dir) =>
      T.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
                when(col("o_totalprice") < 100000, "small")
                  .when(col("o_totalprice") < 300000, "medium")
                  .otherwise("large").as("band"))
        .orderBy("o_orderkey")),

    "filter_pred" -> ((s, dir) =>
      T.load(s, dir, "part")
        .filter(col("p_type").like("PROMO%") &&
                col("p_size").isin(1, 5, 10, 15, 20, 25) &&
                col("p_retailprice").between(910.0, 990.0) &&
                !(col("p_brand") === "Brand#1"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
                col("p_size"), col("p_retailprice"))
        .orderBy("p_partkey")),

    "filter_null_semantics" -> ((s, dir) => {
      val o = T.load(s, dir, "orders")
      val c = T.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      o.join(c, o("o_custkey") === c("c_custkey"), "left")
        .filter(col("c_acctbal").isNull || col("c_acctbal") > 5000.0)
        .select(col("o_orderkey"), col("c_custkey"), col("c_acctbal"))
        .orderBy("o_orderkey")
    }),

    "filter_in_subquery" -> ((s, dir) => {
      T.views(s, dir, "orders", "customer")
      s.sql(inSubquerySql)
    }),

    "filter_exists_corr" -> ((s, dir) => {
      T.views(s, dir, "orders", "customer")
      s.sql(existsCorrSql)
    }),

    "filter_not_in_null" -> ((s, dir) => {
      // NOT IN with a NULLABLE probe — three-valued logic makes this a
      // DIFFERENT operator from the plain anti join (join_anti /
      // NOT EXISTS): a NULL probe compares UNKNOWN against every
      // subquery row, so it is filtered OUT, not kept. Spark plans the
      // null-aware anti join (NAAJ) as a broadcast hash join with
      // isNullAwareAntiJoin=true — only expressible broadcast-side, so
      // at 100 TB the subquery side must stay dimension-sized (here it
      // is) or the query belongs rewritten as NOT EXISTS. Every tenth
      // order's custkey is nulled to make the corner live.
      T.views(s, dir, "orders", "customer")
      s.sql(notInNullSql)
    }),

    "scalar_subquery" -> ((s, dir) => {
      T.views(s, dir, "orders")
      s.sql(scalarSubquerySql)
    }),

    // --- §2.F sorts / limits ---

    "sort_multi" -> ((s, dir) =>
      T.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
                col("l_quantity"))
        .orderBy(col("l_returnflag").desc, col("l_quantity").asc,
                 col("l_orderkey").asc, col("l_linenumber").asc)),

    "topk_global" -> ((s, dir) =>
      T.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
                 col("l_linenumber").asc)
        .limit(100)),

    "limit_offset" -> ((s, dir) =>
      T.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
        .offset(100).limit(50)),

    // --- §2.G set operations ---

    "set_union_all" -> ((s, dir) => {
      val o = T.load(s, dir, "orders")
      val a = o.filter(col("o_totalprice") < 50000.0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val b = o.filter(col("o_orderstatus") === "F" &&
                       col("o_totalprice") < 80000.0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      a.unionByName(b).orderBy("o_orderkey", "o_orderstatus")
    }),

    "set_union_distinct" -> ((s, dir) => {
      val o = T.load(s, dir, "orders")
      val a = o.filter(col("o_totalprice") < 50000.0).select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      a.union(b).distinct().orderBy("o_custkey")
    }),

    "set_intersect" -> ((s, dir) => {
      val c = T.load(s, dir, "customer").select(col("c_custkey").as("k"))
      val o = T.load(s, dir, "orders").select(col("o_custkey").as("k"))
      c.intersect(o).orderBy("k")
    }),

    "set_except" -> ((s, dir) => {
      // all customers MINUS big-order customers: the unfiltered version
      // is vacuously empty on the dense fixture (every customer orders)
      val c = T.load(s, dir, "customer").select(col("c_custkey").as("k"))
      val o = T.load(s, dir, "orders")
        .filter(col("o_totalprice") > 400000.0)
        .select(col("o_custkey").as("k"))
      c.except(o).orderBy("k")
    }),

    "set_intersect_all" -> ((s, dir) => {
      val o = T.load(s, dir, "orders")
      val a = o.filter(col("o_totalprice") < 200000.0).select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") =!= "P").select(col("o_custkey"))
      a.intersectAll(b).orderBy("o_custkey")
    }),

    "set_except_all" -> ((s, dir) => {
      val o = T.load(s, dir, "orders")
      val a = o.select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      a.exceptAll(b).orderBy("o_custkey")
    }),

    "set_union_byname" -> ((s, dir) => {
      // Schema-drift union — the ingest reality at 100 TB: two crawl
      // generations carry different column sets (the older has `lang`,
      // the newer `source`), and unionByName(allowMissingColumns=true)
      // aligns by NAME with NULL fill — a positional unionAll would
      // silently pair lang with source. Pure Expand/Project, no shuffle
      // before the final sort.
      val d = T.load(s, dir, "documents")
      val gen1 = d.filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val gen2 = d.filter(col("lang") =!= "en")
        .select(col("doc_id"), col("source"), col("n_chars"))
      gen1.unionByName(gen2, allowMissingColumns = true)
        .orderBy("doc_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "project_arith" ->
      """SELECT l_orderkey, l_linenumber,
                l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
                l_quantity * l_extendedprice AS gross
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "project_case" ->
      """SELECT o_orderkey, o_totalprice,
                CASE WHEN o_totalprice < 100000 THEN 'small'
                     WHEN o_totalprice < 300000 THEN 'medium'
                     ELSE 'large' END AS band
         FROM orders ORDER BY o_orderkey""",

    "filter_pred" ->
      """SELECT p_partkey, p_name, p_brand, p_size, p_retailprice FROM part
         WHERE p_type LIKE 'PROMO%' AND p_size IN (1, 5, 10, 15, 20, 25)
           AND p_retailprice BETWEEN 910.0 AND 990.0
           AND NOT (p_brand = 'Brand#1')
         ORDER BY p_partkey""",

    "filter_null_semantics" ->
      """SELECT o_orderkey, c_custkey, c_acctbal
         FROM orders LEFT JOIN
              (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
              ON o_custkey = c_custkey
         WHERE c_acctbal IS NULL OR c_acctbal > 5000.0
         ORDER BY o_orderkey""",

    "filter_in_subquery" -> inSubquerySql,
    "filter_exists_corr" -> existsCorrSql,
    "filter_not_in_null" -> notInNullSql,
    "scalar_subquery" -> scalarSubquerySql,

    "sort_multi" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
         FROM lineitem
         ORDER BY l_returnflag DESC, l_quantity ASC, l_orderkey, l_linenumber""",

    "topk_global" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""",

    "limit_offset" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_orderkey LIMIT 50 OFFSET 100""",

    "set_union_all" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice < 50000.0
         UNION ALL
         SELECT o_orderkey, o_orderstatus FROM orders
         WHERE o_orderstatus = 'F' AND o_totalprice < 80000.0
         ORDER BY o_orderkey, o_orderstatus""",

    "set_union_distinct" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice < 50000.0
         UNION
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         ORDER BY o_custkey""",

    "set_intersect" ->
      """SELECT c_custkey AS k FROM customer
         INTERSECT SELECT o_custkey FROM orders ORDER BY k""",

    "set_except" ->
      """SELECT c_custkey AS k FROM customer
         EXCEPT SELECT o_custkey FROM orders
                WHERE o_totalprice > 400000.0 ORDER BY k""",

    "set_intersect_all" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice < 200000.0
         INTERSECT ALL
         SELECT o_custkey FROM orders WHERE o_orderstatus <> 'P'
         ORDER BY o_custkey""",

    "set_except_all" ->
      """SELECT o_custkey FROM orders
         EXCEPT ALL
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         ORDER BY o_custkey""",

    "set_union_byname" ->
      """SELECT doc_id, lang, n_chars, NULL AS source
         FROM documents WHERE lang = 'en'
         UNION ALL
         SELECT doc_id, NULL AS lang, n_chars, source
         FROM documents WHERE lang <> 'en'
         ORDER BY doc_id""",
  )
}
