package graft.plan

/** SQL-script plumbing, the Scala analog of the reference's template +
  * statement-split layer (`iceberg-tests/framework/sql.py:10-28`, H1/H2).
  */
object Sql {

  /** H1 — strict template render: `{{ name }}` placeholders with optional
    * `+ n` / `- n` integer arithmetic (the subset the reference's plans use,
    * e.g. `{{ dataset.rows - 1 }}`, framework.yaml:434-437). Unknown
    * variables throw, like Jinja2 StrictUndefined.
    */
  def render(template: String, vars: Map[String, Any]): String = {
    val Placeholder = raw"\{\{\s*([A-Za-z0-9_.]+)\s*(?:([+-])\s*(\d+)\s*)?\}\}".r
    Placeholder.replaceAllIn(template, m => {
      val name = m.group(1)
      val base = vars.getOrElse(name,
        throw new IllegalArgumentException(s"undefined template variable: $name"))
      val value = (Option(m.group(2)), Option(m.group(3))) match {
        case (Some(op), Some(n)) =>
          val b = base.toString.toLong
          if (op == "+") (b + n.toLong).toString else (b - n.toLong).toString
        case _ => base.toString
      }
      java.util.regex.Matcher.quoteReplacement(value)
    })
  }

  /** H2 — split a script into trimmed statements on `;`, respecting single
    * and double quotes and line comments (`--`).
    */
  def split(script: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var i = 0
    var inSingle = false
    var inDouble = false
    var inComment = false
    while (i < script.length) {
      val c = script.charAt(i)
      if (inComment) {
        if (c == '\n') { inComment = false; cur += c }
      } else if (inSingle) {
        cur += c; if (c == '\'') inSingle = false
      } else if (inDouble) {
        cur += c; if (c == '"') inDouble = false
      } else c match {
        case '\'' => inSingle = true; cur += c
        case '"' => inDouble = true; cur += c
        case '-' if i + 1 < script.length && script.charAt(i + 1) == '-' =>
          inComment = true; i += 1
        case ';' => out += cur.toString; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** H3 — statements whose first keyword means "no result rows to capture"
    * (`framework/engines/spark.py:13-29`).
    */
  private val NonCapturing = Set(
    "INSERT", "UPDATE", "DELETE", "MERGE", "CREATE", "DROP", "ALTER",
    "OPTIMIZE", "VACUUM", "TRUNCATE", "USE", "SET", "CALL", "CACHE", "UNCACHE")

  def capturesRows(statement: String): Boolean = {
    val first = statement.trim.split("\\s+").headOption.map(_.toUpperCase).getOrElse("")
    !NonCapturing.contains(first)
  }
}
