package graft.catalogsvc

import scala.collection.mutable

/** H14 — the REST API test executor analog
  * (`opencatalog/scripts/opencatalog_api_tester.py:24-46,111-173`): a list of
  * calls with expected-outcome classification — PASS (succeeded and success
  * expected), EXP (failed with an *expected* error, e.g. creating a duplicate
  * namespace), FAIL (anything else) — run sequentially with a shared context
  * that capture hooks write into (the reference's `__AUTO__` location
  * expansion, `:574-594,611-634`). No network: calls hit the in-process
  * `CatalogService`.
  */
object ApiTester {

  /** One call: `invoke` gets the context and returns a value to capture;
    * `expectError` marks calls whose failure is the expected outcome.
    */
  case class ApiTest(
      name: String,
      invoke: mutable.Map[String, Any] => Any,
      expectError: Boolean = false,
      captureAs: Option[String] = None)

  case class TestOutcome(name: String, status: String, detail: String)

  case class SuiteReport(outcomes: Seq[TestOutcome]) {
    def passed: Int = outcomes.count(_.status == "PASS")
    def expected: Int = outcomes.count(_.status == "EXP")
    def failed: Int = outcomes.count(_.status == "FAIL")
  }

  /** Sequential run with shared capture context (`TestSuite.run`, `:111-162`). */
  def run(tests: Seq[ApiTest]): SuiteReport = {
    val ctx = mutable.Map[String, Any]()
    val outcomes = tests.map { t =>
      try {
        val result = t.invoke(ctx)
        t.captureAs.foreach(ctx(_) = result)
        if (t.expectError)
          TestOutcome(t.name, "FAIL", "expected an error but the call succeeded")
        else TestOutcome(t.name, "PASS", "")
      } catch {
        case e: Throwable =>
          if (t.expectError) TestOutcome(t.name, "EXP", e.getClass.getSimpleName)
          else TestOutcome(t.name, "FAIL",
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    SuiteReport(outcomes)
  }
}
