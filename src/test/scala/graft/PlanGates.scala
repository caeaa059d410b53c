package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
import org.apache.spark.sql.catalyst.expressions.NTile

/** The repo's structural scale disciplines as reusable plan predicates,
  * shared by the registry-wide gates (SparkEntrySpec) and the
  * loop-stage gates (LoopStageGateSpec) so the two suites can never
  * drift apart on what "clean" means.
  *
  * - an empty-partition Window serializes its input into ONE task, so
  *   it is only ever allowed over a table bounded by a query parameter;
  * - a global ntile is banned outright (Pack.positionalTiles is the
  *   distributed spelling);
  * - a condition-free Cross join must carry an EXPLICIT broadcast hint:
  *   since round 10 a statically-tiny side alone no longer passes —
  *   the hint is what pins the bounded side as the BUILD side, making
  *   the fact the probe side (a 100-row side crossed against a 10 B-row
  *   fact is fine exactly when the 100 rows broadcast; the hint is the
  *   declaration that they do). */
object PlanGates {

  /** Empty-partition (global) windows in the optimized plan. */
  def globalWindows(df: DataFrame): Seq[LWindow] =
    df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }

  /** True when any empty-partition window computes ntile. */
  def hasGlobalNtile(df: DataFrame): Boolean =
    globalWindows(df).exists(_.windowExpressions
      .exists(e => e.collect { case _: NTile => 1 }.nonEmpty))

  /** Condition-free Cross joins with NO explicit broadcast hint on
    * either side. The hint is required unconditionally — maxRows-tiny
    * sides must still be wrapped in broadcast() so the plan DECLARES
    * which side builds. */
  def wildCrossJoins(df: DataFrame): Seq[Join] =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == Cross && j.condition.isEmpty &&
        !(j.hint.leftHint.exists(_.strategy.isDefined) ||
          j.hint.rightHint.exists(_.strategy.isDefined)) => j
    }

  /** One-call battery for a single stage plan: no global window (unless
    * `allowGlobalWindow` documents a parameter-bounded input), no
    * global ntile ever, no unhinted condition-free cross join. */
  def assertCleanStage(name: String, df: DataFrame,
                       allowGlobalWindow: Boolean = false): Unit = {
    if (!allowGlobalWindow)
      assert(globalWindows(df).isEmpty,
        s"$name plans an empty-partition window — single-task at scale")
    assert(!hasGlobalNtile(df), s"$name plans a global ntile")
    assert(wildCrossJoins(df).isEmpty,
      s"$name plans a condition-free cross join without a broadcast hint")
  }
}
