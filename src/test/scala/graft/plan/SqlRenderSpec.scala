package graft.plan

import org.scalatest.funsuite.AnyFunSuite

/** F9/H1 — the Jinja subset the reference templates use
  * (ref create_sales_events.sql:7,13-26).
  */
class SqlRenderSpec extends AnyFunSuite {

  test("filters: upper, lower, join, default") {
    assert(Sql.render("{{ t | upper }}", Map("t" -> "string")) === "STRING")
    assert(Sql.render("{{ t | lower }}", Map("t" -> "StRiNg")) === "string")
    assert(Sql.render("{{ cols | join(', ') }}", Map("cols" -> Seq("a", "b"))) === "a, b")
    assert(Sql.render("{{ x | default('identity') }}", Map.empty) === "identity")
    assert(Sql.render("{{ x | default('identity') }}", Map("x" -> "bucket")) === "bucket")
    assert(Sql.render("{{ x | default(42) }}", Map.empty) === "42")
  }

  test("~ concatenation of quoted literals and variables") {
    assert(Sql.render("{{ 'DAY(' ~ c ~ ')' }}", Map("c" -> "ts")) === "DAY(ts)")
    assert(Sql.render("{{ a ~ '_' ~ b }}", Map("a" -> 1, "b" -> 2)) === "1_2")
    assert(Sql.render("{{ \"x\" ~ 'y' }}", Map.empty) === "xy")
  }

  test("filter chains and undefined propagation (StrictUndefined unless default)") {
    assert(Sql.render("{{ t | default('x') | upper }}", Map.empty) === "X")
    intercept[IllegalArgumentException](Sql.render("{{ missing | upper }}", Map.empty))
    intercept[IllegalArgumentException](Sql.render("{{ a ~ missing }}", Map("a" -> "x")))
    assert(Sql.render("{{ a ~ missing | default('f') }}", Map("a" -> "x")) === "f")
    intercept[IllegalArgumentException](Sql.render("{{ t | nonsense }}", Map("t" -> "v")))
  }

  test("integer arithmetic and plain substitution keep working") {
    assert(Sql.render("{{ rows - 1 }}/{{ rows + 2 }}", Map("rows" -> 8)) === "7/10")
    assert(Sql.render("SELECT * FROM {{ ns }}.t", Map("ns" -> "demo")) === "SELECT * FROM demo.t")
    intercept[IllegalArgumentException](Sql.render("{{ nope }}", Map.empty))
  }
}
