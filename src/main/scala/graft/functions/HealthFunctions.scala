package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Catalyst-expression ports of the reference's inline scalar logic.
  *
  * The reference implements these as per-record JVM closures inside
  * `map`/`filter` (reference `IOTSparkStreaming.scala:119-139`); here they
  * are `Column` expressions so they stay inside whole-stage codegen and are
  * visible to the optimizer (pushdown, constant folding).
  */
object HealthFunctions {

  /** Half-up round to int — the reference's `(x + 0.5).toInt`
    * (reference `IOTSparkStreaming.scala:97,122`). `floor` first so the
    * int cast is exact on every engine (DuckDB would round, Spark truncates;
    * on an integral value they agree).
    */
  def roundHalfUp(c: Column): Column = floor(c + lit(0.5)).cast("int")

  /** Piecewise max-heart-rate formula
    * (reference `IOTSparkStreaming.scala:128-130`):
    * `if (age < 40) 220 - age else 208 - 0.75 * age`, computed in double.
    */
  def maxPulseLimit(age: Column): Column =
    when(age < 40, lit(220.0) - age).otherwise(lit(208.0) - lit(0.75) * age)

  /** Blood-pressure categories that escalate an alert to `critical`
    * (reference `IOTSparkStreaming.scala:134`).
    */
  val CriticalBpCats: Seq[String] = Seq("HYP_1", "HYP_2", "HYP_CR")

  /** Nested alert classifier (reference `IOTSparkStreaming.scala:132-137`).
    * Threshold is configurable because the variants disagree (0.95 in the
    * main class / workingTest vs 0.85 in test.scala — SURVEY.md §2.9.1);
    * canonical default 0.95. The escalation category set is a parameter so
    * every query routes through this single implementation.
    */
  def warning(pulse: Column, age: Column, bpCat: Column,
              threshold: Double = 0.95,
              criticalCats: Seq[String] = CriticalBpCats): Column =
    when(pulse >= lit(threshold) * maxPulseLimit(age),
      when(bpCat.isin(criticalCats: _*), lit("critical"))
        .otherwise(lit("simple")))
      .otherwise(lit("no-use"))
}
