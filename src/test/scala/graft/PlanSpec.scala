package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions (SURVEY §4): the declarative plans must keep the
  * optimizations Catalyst gives for free — pushdown, pruning, broadcast,
  * partial aggregation — since those are what make the same code hold at
  * 100 TB. Guards against regressions that stay correct but stop scaling. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  val sf = SparkFixture.sf001

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("filter_pred pushes predicates into the parquet scan") {
    val p = plan("filter_pred")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("StringStartsWith(p_type,PROMO"), p)
  }

  test("project_arith prunes the scan to referenced columns only") {
    val p = plan("project_arith")
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_comment") && !p.contains("l_shipmode"),
           s"scan reads unreferenced columns:\n$p")
  }

  test("join_inner_bhj broadcasts the dimension side") {
    assert(plan("join_inner_bhj").contains("BroadcastHashJoin"))
  }

  test("join_inner_smj / shj honor their physical-strategy hints") {
    assert(plan("join_inner_smj").contains("SortMergeJoin"))
    assert(plan("join_inner_shj").contains("ShuffledHashJoin"))
  }

  test("join_multiway broadcasts both small dims (no dim-side shuffle)") {
    val p = plan("join_multiway")
    assert(p.sliding("BroadcastHashJoin".length)
            .count(_ == "BroadcastHashJoin") >= 2, p)
  }

  test("join_bucketed: storage-bucketed SMJ, no exchange below the join") {
    val p = plan("join_bucketed")
    assert(p.contains("SortMergeJoin"), p)
    // both scans read bucket-aligned splits; the ONLY hash exchange in the
    // whole plan is the post-join groupBy (join_inner_smj has three)
    assert(p.sliding("Exchange hashpartitioning".length)
            .count(_ == "Exchange hashpartitioning") == 1, p)
  }

  test("agg_groupby is partial+final (map-side combine before the shuffle)") {
    val p = plan("agg_groupby")
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2,
           p)
  }

  test("sim_topk: native cosine in plan, top-k pushed below the shuffle") {
    val p = plan("sim_topk")
    assert(p.contains("graft_cosine"), p)
    assert(!p.contains("CodegenFallback"), p)
    // Spark 4 plans rn<=k as a partial WindowGroupLimit before the
    // exchange — each partition ships only its local top-k.
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("topk_global plans as TakeOrderedAndProject (no full global sort)") {
    assert(plan("topk_global").contains("TakeOrderedAndProject"))
  }

  test("join_asof_native plans the custom AsOfJoinExec (strategy fired)") {
    val p = plan("join_asof_native")
    assert(p.contains("AsOfJoin"), p)
    // co-partitioned: exactly one exchange per side feeding the merge
    assert(p.sliding("Exchange hashpartitioning".length)
            .count(_ == "Exchange hashpartitioning") >= 2, p)
  }

  test("join_asof_native equals the composed window formulation") {
    val native = SparkEntry.queries("join_asof_native")(spark, sf).collect()
    val window = SparkEntry.queries("join_asof")(spark, sf).collect()
    assert(native.toSeq == window.toSeq)
  }
}
