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

  test("for blocks iterate with loop metadata (F9 blocks)") {
    assert(Sql.render(
      "{% for x in xs %}{{ x }}{% if not loop.last %},{% endif %}{% endfor %}",
      Map("xs" -> Seq("a", "b", "c"))) === "a,b,c")
    assert(Sql.render(
      "{% for x in xs %}{{ loop.index }}:{{ x }} {% endfor %}",
      Map("xs" -> Seq("p", "q"))) === "1:p 2:q ")
    assert(Sql.render("{% for x in xs %}never{% endfor %}", Map("xs" -> Nil)) === "")
  }

  test("if/elif/else with comparisons; undefined is falsy in conditions") {
    val t = "{% if v == 'days' %}DAY{% elif v == 'bucket' %}B{% else %}I{% endif %}"
    assert(Sql.render(t, Map("v" -> "days")) === "DAY")
    assert(Sql.render(t, Map("v" -> "bucket")) === "B")
    assert(Sql.render(t, Map("v" -> "x")) === "I")
    assert(Sql.render("{% if missing %}y{% else %}n{% endif %}", Map.empty) === "n")
    assert(Sql.render("{% if a and not b %}y{% else %}n{% endif %}",
      Map("a" -> true, "b" -> false)) === "y")
  }

  test("set, dotted map access, and whitespace control") {
    assert(Sql.render("{%- set e = 'DAY(' ~ p.column ~ ')' -%} {{ e }}",
      Map("p" -> Map("column" -> "ts"))) === "DAY(ts)")
    assert(Sql.render("a   {{- 'b' -}}   c", Map.empty) === "abc")
    intercept[IllegalArgumentException](Sql.render("{% for x in xs %}no end", Map("xs" -> Seq(1))))
  }

  test("integer arithmetic and plain substitution keep working") {
    assert(Sql.render("{{ rows - 1 }}/{{ rows + 2 }}", Map("rows" -> 8)) === "7/10")
    assert(Sql.render("SELECT * FROM {{ ns }}.t", Map("ns" -> "demo")) === "SELECT * FROM demo.t")
    intercept[IllegalArgumentException](Sql.render("{{ nope }}", Map.empty))
  }
}
