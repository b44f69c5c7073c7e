package graft.plan

import scala.collection.mutable

/** One plan step (`framework.yaml` plan entries → `PlanStepConfig`): either a
  * SQL script template run on an engine adapter, or a Scala action (our DML is
  * API-based where the reference's was engine SQL). Both produce
  * `StatementResult`s that validations consume.
  */
case class Step(
    name: String,
    run: PlanContext => Seq[StatementResult],
    validations: Seq[Validation] = Nil,
    continueOnError: Boolean = false)

object Step {
  /** SQL step: rendered, split, executed on the adapter (H10's main path). */
  def sql(name: String, engine: EngineAdapter, script: String,
      validations: Seq[Validation] = Nil, continueOnError: Boolean = false): Step =
    Step(name, ctx => engine.runScript(script, ctx.vars), validations, continueOnError)

  /** Scala action step returning captured rows. */
  def action(name: String, fn: PlanContext => Seq[Map[String, Any]],
      validations: Seq[Validation] = Nil, continueOnError: Boolean = false): Step =
    Step(name, ctx => Seq(StatementResult(name, fn(ctx), None)), validations, continueOnError)
}

case class PlanContext(vars: Map[String, Any], state: mutable.Map[String, Any])

case class StepReport(name: String, status: String, error: Option[String],
    validations: Seq[ValidationResult])

/** Plan execution report with the reference's pass/fail/skip rollup
  * (`framework/runner.py:33-39`).
  */
case class PlanReport(plan: String, steps: Seq[StepReport]) {
  def status: String =
    if (steps.exists(_.status == "failed")) "failed"
    else if (steps.exists(_.status == "skipped")) "partial"
    else "passed"
}

/** H10 — the plan runner (`framework/runner.py:124-174`): execute steps in
  * order against a shared state map; a failed step fails the plan and skips
  * the remainder unless `continueOnError`.
  */
object PlanRunner {

  def run(planName: String, steps: Seq[Step],
      vars: Map[String, Any] = Map.empty): PlanReport = {
    val state = mutable.Map[String, Any]()
    val ctx = PlanContext(vars, state)
    val reports = mutable.ArrayBuffer[StepReport]()
    var skipRest = false
    steps.foreach { step =>
      if (skipRest) reports += StepReport(step.name, "skipped", None, Nil)
      else {
        try {
          val results = step.run(ctx)
          val vres = step.validations.map(v => Validators.apply(v, results, vars, state))
          if (vres.forall(_.passed)) reports += StepReport(step.name, "passed", None, vres)
          else {
            reports += StepReport(step.name, "failed", None, vres)
            if (!step.continueOnError) skipRest = true
          }
        } catch {
          case e: Throwable =>
            reports += StepReport(step.name, "failed",
              Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"), Nil)
            if (!step.continueOnError) skipRest = true
        }
      }
    }
    PlanReport(planName, reports.toSeq)
  }
}
