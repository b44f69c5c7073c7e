package graft.flow

import scala.collection.mutable

/** H15 — compensating workflow runner (saga), the analog of
  * `dam-automation/src/dam_automation/workflow.py:24-49`: steps run in order;
  * on the first failure, the compensators of every *completed* step run in
  * reverse order. Compensator failures are recorded, never rethrown (cleanup
  * must attempt every step).
  */
object Saga {

  case class SagaStep(name: String, action: () => Unit, compensate: () => Unit = () => ())

  case class StepStatus(name: String, status: String, error: Option[String] = None)

  case class SagaReport(steps: Seq[StepStatus], compensations: Seq[StepStatus]) {
    def succeeded: Boolean = steps.forall(_.status == "completed")
  }

  def run(steps: Seq[SagaStep]): SagaReport = {
    val done = mutable.ArrayBuffer[SagaStep]()
    val statuses = mutable.ArrayBuffer[StepStatus]()
    val compensations = mutable.ArrayBuffer[StepStatus]()
    var failed = false
    steps.foreach { step =>
      if (failed) statuses += StepStatus(step.name, "skipped")
      else {
        try { step.action(); done += step; statuses += StepStatus(step.name, "completed") }
        catch {
          case e: Throwable =>
            failed = true
            statuses += StepStatus(step.name, "failed",
              Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"))
        }
      }
    }
    if (failed) done.reverseIterator.foreach { step =>
      try { step.compensate(); compensations += StepStatus(step.name, "compensated") }
      catch {
        case e: Throwable =>
          compensations += StepStatus(step.name, "compensation-failed",
            Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"))
      }
    }
    SagaReport(statuses.toSeq, compensations.toSeq)
  }
}
