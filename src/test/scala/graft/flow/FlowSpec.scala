package graft.flow

import graft.SparkSpec

class FlowSpec extends SparkSpec {

  test("saga compensates completed steps in reverse order, tolerates compensator failure (H15)") {
    val log = scala.collection.mutable.ArrayBuffer[String]()
    val r = Saga.run(Seq(
      Saga.SagaStep("a", () => log += "a", () => log += "-a"),
      Saga.SagaStep("b", () => log += "b", () => throw new RuntimeException("undo-broke")),
      Saga.SagaStep("c", () => throw new RuntimeException("boom"), () => log += "-c")))
    assert(!r.succeeded)
    assert(log.toSeq === Seq("a", "b", "-a"))
    assert(r.compensations.map(_.status) === Seq("compensation-failed", "compensated"))
  }

  test("state store round-trips and ensure is idempotent (H16)") {
    val root = scratchDir("state-")
    val store = new StateStore(root)
    var built = 0
    def go() = store.ensure("ns", "rec") { built += 1; Map("k" -> "v") }
    assert(go() === Map("k" -> "v"))
    assert(go() === Map("k" -> "v"))
    assert(built === 1)
    assert(store.get("ns", "rec").get("k") === "v")
    assert(store.list("ns") === Seq("rec"))
    intercept[IllegalArgumentException](store.put("../evil", "x", Map.empty))
  }
}
