package graft.plan

/** SQL-script plumbing, the Scala analog of the reference's template +
  * statement-split layer (`iceberg-tests/framework/sql.py:10-28`, H1/H2).
  */
object Sql {

  /** H1/F9 — strict template render over the Jinja subset the reference's
    * templates actually use (ref create_sales_events.sql:7,13-26,
    * framework.yaml:434-437): `{{ var }}` substitution with dotted names,
    * integer `+ n` / `- n` arithmetic, `~` string concatenation of variables
    * and quoted literals, and the filters `upper`, `lower`, `join(sep)`,
    * `default(value)`. Unknown variables throw (Jinja2 StrictUndefined)
    * unless a `default` filter supplies a value.
    */
  def render(template: String, vars: Map[String, Any]): String = {
    val Placeholder = raw"\{\{(.+?)\}\}".r
    Placeholder.replaceAllIn(template, m =>
      java.util.regex.Matcher.quoteReplacement(evalPlaceholder(m.group(1).trim, vars)))
  }

  /** Split on a separator outside quoted string literals. */
  private def splitTop(s: String, sep: Char): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    val cur = new StringBuilder
    var quote: Char = 0
    s.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"') { quote = c; cur += c }
      else if (c == sep) { out += cur.toString; cur.clear() }
      else cur += c
    }
    out += cur.toString
    out.toList
  }

  private val Arith = raw"([A-Za-z0-9_.]+)\s*([+-])\s*(\d+)".r
  private val Ident = raw"[A-Za-z_][A-Za-z0-9_.]*".r
  private val IntLit = raw"-?\d+".r

  /** A term evaluates to Some(value), or None for an undefined variable —
    * Jinja undefined propagates through `~` and filters until a `default`
    * rescues it or the placeholder errors out.
    */
  private def evalTerm(term: String, vars: Map[String, Any]): Option[Any] = term match {
    case q if q.length >= 2 && (q.head == '\'' || q.head == '"') && q.last == q.head =>
      Some(q.substring(1, q.length - 1))
    case Arith(name, op, n) =>
      vars.get(name).map { base =>
        val b = base.toString.toLong
        if (op == "+") b + n.toLong else b - n.toLong
      }
    case IntLit() => Some(term.toLong)
    case Ident() => vars.get(term)
    case other => throw new IllegalArgumentException(s"unsupported template expression: $other")
  }

  private val FilterCall = raw"([a-z_]+)(?:\(\s*(?:'([^']*)'|\"([^\"]*)\"|(-?\d+))\s*\))?".r

  private def applyFilter(value: Option[Any], filter: String): Option[Any] = filter match {
    case FilterCall(name, sq, dq, num) =>
      val arg: Option[Any] = Option(sq).orElse(Option(dq)).orElse(Option(num).map(_.toLong))
      name match {
        case "default" => value.orElse(arg)
        case "upper" => value.map(_.toString.toUpperCase)
        case "lower" => value.map(_.toString.toLowerCase)
        case "join" =>
          val s = arg.map(_.toString).getOrElse("")
          value.map {
            case it: Iterable[_] => it.mkString(s)
            case arr: Array[_] => arr.mkString(s)
            case other => other.toString
          }
        case other => throw new IllegalArgumentException(s"unsupported template filter: $other")
      }
    case other => throw new IllegalArgumentException(s"unsupported template filter: $other")
  }

  private def evalPlaceholder(expr: String, vars: Map[String, Any]): String = {
    val pipeline = splitTop(expr, '|').map(_.trim)
    val terms = splitTop(pipeline.head, '~').map(_.trim).filter(_.nonEmpty)
    require(terms.nonEmpty, s"empty template expression in: $expr")
    val values = terms.map(t => evalTerm(t, vars))
    val base: Option[Any] =
      if (values.exists(_.isEmpty)) None
      else if (values.size == 1) values.head
      else Some(values.flatten.map(_.toString).mkString)
    pipeline.tail.foldLeft(base)(applyFilter)
      .getOrElse(throw new IllegalArgumentException(s"undefined template variable: $expr"))
      .toString
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
