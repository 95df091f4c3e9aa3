package graft

import org.scalatest.funsuite.AnyFunSuite

/** Automated guard of the scale-critical plan properties — the same
  * checks docs/PLANS.md records, asserted so a regression (lost
  * pushdown, un-broadcast dim, duplicated window sort) fails CI. */
class PlanAuditSpec extends AnyFunSuite with SharedSpark {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("filters and projection push down to the parquet scan") {
    val p = plan("q_select_filter")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(l_discount,0.05)"), p.take(800))
    assert(p.contains("ReadSchema") && !p.contains("l_comment"))
  }

  test("dimension joins broadcast") {
    val p = plan("q_lookup_join")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("mean-max durations share one window sort") {
    val p = plan("q_meanmax")
    // all four duration frames plan into Window operators over a single
    // exchange of the events scan — no per-duration re-shuffle
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected <=1 hash exchange, got $exchanges\n${p.take(1200)}")
  }

  test("group aggregation is partial (map-side combine)") {
    val p = plan("q_group_agg")
    assert(p.contains("HashAggregate") && p.contains("partial"), p.take(800))
  }

  test("whole-stage codegen covers the scan+filter+project stages") {
    // AQE shows the final (codegen'd) plan only after execution
    val df = SparkEntry.queries("q_derived")(spark, sf)
    df.collect() // executes THIS plan so AQE finalizes it
    val p = df.queryExecution.executedPlan.toString
    // codegen'd stages print as "*(n) Operator" in the compact plan
    assert(p.contains("*(1)"), p.take(800))
  }
}
