package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rule engine ([EXT]) — the
  * "great-expectations" gate a production pipeline runs before
  * publishing a batch: a rule set evaluated over the fact, one
  * violation-count row per rule. The reference validates row counts
  * and nulls ad hoc (/root/reference/src/data_validate.py); this is
  * the general declarative form.
  *
  * Scale shape: ALL scan rules evaluate in ONE pass — each rule is a
  * conditional count inside a single global aggregate, so the plan is
  * Scan → partial HashAggregate → one-row Exchange → final aggregate,
  * regardless of how many rules are attached. Adding a rule adds one
  * codegen'd expression, not a scan. Per-rule results unpivot from
  * the single aggregate row via the struct-explode trick (bounded by
  * the rule count). Keyed rules (uniqueness) genuinely need a keyed
  * aggregate, so they run as their own bounded pass and union in.
  *
  * Null semantics are explicit per rule (the usual trap: `x > 50` is
  * NULL for null x, and a bare filter silently drops it): range /
  * regex / set rules treat NULL as NOT a violation — compose with
  * [[notNull]] to reject nulls, keeping the two failure modes
  * separately countable. [[check]] takes a violation predicate
  * verbatim and coalesces NULL to violation (an unevaluable custom
  * invariant is a defect, not a pass). */
object Quality {

  /** A named rule; `violation` is true on rows that BREAK it. */
  final case class Rule(name: String, violation: Column)

  def notNull(c: String): Rule = Rule(s"not_null:$c", col(c).isNull)

  /** Violation when the value lies outside [lo, hi]; NULL passes. */
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"range:$c", coalesce(col(c) < lo || col(c) > hi, lit(false)))

  /** Violation when the value does not match `regex`; NULL passes. */
  def matches(c: String, regex: String): Rule =
    Rule(s"regex:$c", coalesce(!col(c).rlike(regex), lit(false)))

  /** Violation when the value is outside the allowed set; NULL passes. */
  def inSet(c: String, allowed: Seq[String]): Rule =
    Rule(s"set:$c", coalesce(!col(c).isin(allowed: _*), lit(false)))

  /** Custom invariant: violation when `predicate` is false OR
    * unevaluable (NULL input to a cross-field comparison). */
  def check(name: String, predicate: Column): Rule =
    Rule(s"check:$name", coalesce(!predicate, lit(true)))

  /** Evaluate scan rules in one pass:
    * `(rule, n_violations, n_rows, violation_rate)`, one row per
    * rule, ordered by rule name. The rate is an unrounded IEEE
    * divide on two exact counts (bit-equal across engines). */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val counts = df.agg(
      count(lit(1)).as("__n"),
      rules.zipWithIndex.map { case (r, i) =>
        count(when(r.violation, lit(1))).as(s"__v$i")
      }: _*)
    val entries = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"__v$i").as("n_violations"))
    }
    counts.select(explode(array(entries: _*)).as("e"), col("__n"))
      .select(col("e.rule"), col("e.n_violations"), col("__n").as("n_rows"),
        (col("e.n_violations").cast("double") / col("__n")).as("violation_rate"))
      .orderBy(col("rule"))
  }

  /** Keyed uniqueness rule, same output contract as [[report]]:
    * violations = rows beyond the first per key
    * (`count(*) - count(DISTINCT keys)`). Runs as its own aggregate —
    * a distinct count is a keyed shuffle, not a scan expression — and
    * unions onto a [[report]] with `unionByName`. */
  def uniqueRule(df: DataFrame, keys: Seq[String]): DataFrame = {
    val name = s"unique:${keys.mkString(",")}"
    df.agg(count(lit(1)).as("__n"),
        count_distinct(struct(keys.map(col): _*)).as("__d"))
      .select(lit(name).as("rule"),
        (col("__n") - col("__d")).as("n_violations"),
        col("__n").as("n_rows"),
        ((col("__n") - col("__d")).cast("double") / col("__n")).as("violation_rate"))
  }
}
