package graft.plan

import graft.SparkSpec

class PlanRunnerSpec extends SparkSpec {

  test("render is strict on undefined variables (H1)") {
    intercept[IllegalArgumentException](Sql.render("{{ nope }}", Map.empty))
    assert(Sql.render("{{ a }}-{{ b + 2 }}", Map("a" -> "x", "b" -> 5)) === "x-7")
  }

  test("split respects quotes and comments (H2)") {
    val stmts = Sql.split("SELECT 'a;b'; -- c;d\nSELECT \"e;f\";;SELECT 1")
    assert(stmts === Seq("SELECT 'a;b'", "SELECT \"e;f\"", "SELECT 1"))
  }

  test("failed step skips the remainder unless continueOnError (H10)") {
    val boom = Step.action("boom", _ => throw new RuntimeException("x"))
    val after = Step.action("after", _ => Nil)
    val r1 = PlanRunner.run("p", Seq(boom, after))
    assert(r1.steps.map(_.status) === Seq("failed", "skipped"))
    assert(r1.status === "failed")
    val r2 = PlanRunner.run("p", Seq(boom.copy(continueOnError = true), after))
    assert(r2.steps.map(_.status) === Seq("failed", "passed"))
  }

  test("validators read state written by earlier steps (H5/H7)") {
    val steps = Seq(
      Step.action("write", _ => Seq(Map("row_count" -> 5L)), Seq(StoreRowcountAs("n"))),
      Step.action("check", _ => Seq(Map("row_count" -> 4L)),
        Seq(RowcountEquals("{{ state.n - 1 }}"))))
    assert(PlanRunner.run("p", steps).status === "passed")
  }

  test("rowcount derivation prefers count keys over row counting (H9)") {
    val r = StatementResult("s", Seq(Map("COUNT(1)" -> 9L), Map("COUNT(1)" -> 9L)), None)
    assert(Validators.deriveRowcount(r) === Some(9L))
    assert(Validators.deriveRowcount(StatementResult("s", Nil, Some(3L))) === Some(3L))
  }

  test("script resolution honors * wildcards at both levels (H11)") {
    val tc = TestCase("t", Map(
      "spark" -> Map("open" -> "a.sql", "*" -> "b.sql"),
      "trino" -> Map("unity" -> "u.sql"),
      "empty" -> Map.empty,
      "*" -> Map("open" -> "c.sql")))
    assert(tc.resolveScript("spark", "open") === "a.sql")
    assert(tc.resolveScript("spark", "glue") === "b.sql")
    assert(tc.resolveScript("snowflake", "open") === "c.sql")
    // an EMPTY engine map falls through to '*' (the reference's Python `or`)
    assert(tc.resolveScript("empty", "open") === "c.sql")
    // a non-empty engine map with no catalog match raises — no cross-engine fallback
    intercept[NoSuchElementException](tc.resolveScript("trino", "open"))
    intercept[NoSuchElementException](tc.resolveScript("snowflake", "unity"))
  }

  test("spark engine captures reads but not DDL/DML (H3/H4)") {
    val e = new SparkSqlEngine(spark)
    val res = e.runScript("SELECT 1 AS x; SET spark.sql.shuffle.partitions=4", Map.empty)
    assert(res.head.rows === Seq(Map("x" -> 1)))
    assert(res(1).rows.isEmpty)
  }
}
