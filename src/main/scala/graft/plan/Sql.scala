package graft.plan

/** SQL-script plumbing, the Scala analog of the reference's template +
  * statement-split layer (`iceberg-tests/framework/sql.py:10-28`, H1/H2).
  */
object Sql {

  /** H1/F9 — strict template render over the Jinja subset the reference's
    * templates actually use (ref create_sales_events.sql:5-30,
    * framework.yaml:434-437):
    *
    *  - `{{ expr }}` output with dotted names (map traversal), integer
    *    `+`/`-` arithmetic, `~` concatenation, `==`/`!=` comparison,
    *    `and`/`or`/`not`, and the filters `upper`, `lower`, `join(sep)`,
    *    `default(value)`;
    *  - `{% for x in xs %} ... {% endfor %}` with `loop.index` (1-based),
    *    `loop.first`, `loop.last`;
    *  - `{% if %}` / `{% elif %}` / `{% else %}` / `{% endif %}`;
    *  - `{% set name = expr %}`;
    *  - whitespace control `{%- ... -%}` / `{{- ... -}}` (strips adjacent
    *    whitespace, Jinja semantics).
    *
    * Outputting an unknown variable throws (Jinja2 StrictUndefined) unless a
    * `default` filter supplies a value; in `if` conditions undefined is
    * simply falsy, matching Jinja.
    */
  def render(template: String, vars: Map[String, Any]): String = {
    val (nodes, rest) = parseNodes(tokenize(template), Nil)
    require(rest.isEmpty, s"unexpected ${rest.head} without an opening block")
    val out = new StringBuilder
    evalNodes(nodes, scala.collection.mutable.Map[String, Any](vars.toSeq: _*), out)
    out.toString
  }

  // ---- template tokenization (text / {{ output }} / {% tag %}) ----

  private sealed trait TTok
  private case class Text(s: String) extends TTok
  private case class OutputTok(expr: String) extends TTok
  private case class TagTok(body: String) extends TTok

  private val TokRe = raw"\{\{(-?)\s*(.+?)\s*(-?)\}\}|\{%(-?)\s*(.+?)\s*(-?)%\}".r

  private def tokenize(template: String): List[TTok] = {
    val out = scala.collection.mutable.ListBuffer[TTok]()
    var pos = 0
    var trimNext = false
    def emitText(upTo: Int, trimBefore: Boolean): Unit = {
      var s = template.substring(pos, upTo)
      if (trimNext) s = s.replaceFirst("^\\s+", "")
      if (trimBefore) s = s.replaceFirst("\\s+$", "")
      if (s.nonEmpty) out += Text(s)
    }
    for (m <- TokRe.findAllMatchIn(template)) {
      val isOutput = m.group(2) != null
      val (lt, body, rt) =
        if (isOutput) (m.group(1), m.group(2), m.group(3))
        else (m.group(4), m.group(5), m.group(6))
      emitText(m.start, lt == "-")
      out += (if (isOutput) OutputTok(body) else TagTok(body))
      trimNext = rt == "-"
      pos = m.end
    }
    emitText(template.length, trimBefore = false)
    out.toList
  }

  // ---- block parsing ----

  private sealed trait Node
  private case class TextNode(s: String) extends Node
  private case class OutputNode(expr: String) extends Node
  private case class ForNode(v: String, listExpr: String, body: List[Node]) extends Node
  private case class IfNode(branches: List[(String, List[Node])], orElse: List[Node]) extends Node
  private case class SetNode(name: String, expr: String) extends Node

  private val ForRe = raw"for\s+([A-Za-z_]\w*)\s+in\s+(.+)".r
  private val SetRe = raw"set\s+([A-Za-z_]\w*)\s*=\s*(.+)".r
  private val IfRe = raw"if\s+(.+)".r
  private val ElifRe = raw"elif\s+(.+)".r

  /** Parse until a block-closing tag (endfor/elif/else/endif), which is left
    * in the returned remainder for the caller to consume.
    */
  private def parseNodes(toks: List[TTok], acc: List[Node]): (List[Node], List[TTok]) =
    toks match {
      case Nil => (acc.reverse, Nil)
      case Text(s) :: rest => parseNodes(rest, TextNode(s) :: acc)
      case OutputTok(e) :: rest => parseNodes(rest, OutputNode(e) :: acc)
      case TagTok(body) :: rest => body match {
        case ForRe(v, listExpr) =>
          val (inner, rem) = parseNodes(rest, Nil)
          rem match {
            case TagTok("endfor") :: tail =>
              parseNodes(tail, ForNode(v, listExpr, inner) :: acc)
            case _ => throw new IllegalArgumentException(s"unclosed {% for $v in ... %}")
          }
        case IfRe(cond) =>
          var branches = List.empty[(String, List[Node])]
          var orElse = List.empty[Node]
          var cur = cond
          var toksLeft = rest
          var done = false
          while (!done) {
            val (inner, rem) = parseNodes(toksLeft, Nil)
            rem match {
              case TagTok(ElifRe(c2)) :: tail =>
                branches :+= (cur, inner); cur = c2; toksLeft = tail
              case TagTok("else") :: tail =>
                branches :+= (cur, inner)
                val (elseBody, rem2) = parseNodes(tail, Nil)
                rem2 match {
                  case TagTok("endif") :: tail2 =>
                    orElse = elseBody; toksLeft = tail2; done = true
                  case _ => throw new IllegalArgumentException("unclosed {% else %}")
                }
              case TagTok("endif") :: tail =>
                branches :+= (cur, inner); toksLeft = tail; done = true
              case _ => throw new IllegalArgumentException("unclosed {% if %}")
            }
          }
          parseNodes(toksLeft, IfNode(branches, orElse) :: acc)
        case SetRe(name, expr) => parseNodes(rest, SetNode(name, expr) :: acc)
        case "endfor" | "endif" | "else" => (acc.reverse, toks)
        case ElifRe(_) => (acc.reverse, toks)
        case other => throw new IllegalArgumentException(s"unsupported template tag: {% $other %}")
      }
    }

  // ---- evaluation ----

  private def evalNodes(nodes: List[Node], env: scala.collection.mutable.Map[String, Any],
      out: StringBuilder): Unit =
    nodes.foreach {
      case TextNode(s) => out ++= s
      case OutputNode(e) =>
        out ++= evalPipeline(e, env).getOrElse(
          throw new IllegalArgumentException(s"undefined template variable: $e")).toString
      case SetNode(name, e) => env(name) = evalPipeline(e, env).orNull
      case IfNode(branches, orElse) =>
        branches.find { case (c, _) => truthy(evalPipeline(c, env)) } match {
          case Some((_, body)) => evalNodes(body, env, out)
          case None => evalNodes(orElse, env, out)
        }
      case ForNode(v, listExpr, body) =>
        val items = evalPipeline(listExpr, env).getOrElse(
          throw new IllegalArgumentException(s"undefined loop collection: $listExpr")) match {
          case it: Iterable[_] => it.toSeq
          case arr: Array[_] => arr.toSeq
          case other => throw new IllegalArgumentException(s"cannot iterate over: $other")
        }
        val saved = List(v, "loop.index", "loop.first", "loop.last").map(k => k -> env.get(k))
        items.zipWithIndex.foreach { case (item, i) =>
          env(v) = item
          env("loop.index") = (i + 1).toLong
          env("loop.first") = i == 0
          env("loop.last") = i == items.size - 1
          evalNodes(body, env, out)
        }
        saved.foreach { case (k, prev) =>
          prev match { case Some(x) => env(k) = x; case None => env.remove(k) }
        }
    }

  private def truthy(v: Option[Any]): Boolean = v match {
    case None | Some(null) => false
    case Some(b: Boolean) => b
    case Some(s: String) => s.nonEmpty
    case Some(it: Iterable[_]) => it.nonEmpty
    case Some(n: Long) => n != 0L
    case Some(n: Int) => n != 0
    case Some(_) => true
  }

  // ---- expression pipeline: expr (| filter)* ----

  private def evalPipeline(expr: String, env: scala.collection.Map[String, Any]): Option[Any] = {
    val pipeline = splitTop(expr, '|').map(_.trim)
    require(pipeline.head.nonEmpty, s"empty template expression in: $expr")
    pipeline.tail.foldLeft(evalExpr(pipeline.head, env))(applyFilter)
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

  // ---- expression parser (precedence: or < and < not < ==/!= < ~ < +/-) ----

  private sealed trait ETok
  private case class EStr(s: String) extends ETok
  private case class ENum(n: Long) extends ETok
  private case class EIdent(name: String) extends ETok
  private case class EOp(op: String) extends ETok

  private def exprTokens(s: String): List[ETok] = {
    val out = scala.collection.mutable.ListBuffer[ETok]()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val end = s.indexOf(c, i + 1)
        require(end > 0, s"unterminated string literal in: $s")
        out += EStr(s.substring(i + 1, end)); i = end + 1
      } else if (c.isDigit) {
        val j = s.indexWhere(!_.isDigit, i)
        val end = if (j < 0) s.length else j
        out += ENum(s.substring(i, end).toLong); i = end
      } else if (c.isLetter || c == '_') {
        val j = s.indexWhere(ch => !(ch.isLetterOrDigit || ch == '_' || ch == '.'), i)
        val end = if (j < 0) s.length else j
        val word = s.substring(i, end)
        out += (if (Set("and", "or", "not").contains(word)) EOp(word) else EIdent(word))
        i = end
      } else if (s.startsWith("==", i)) { out += EOp("=="); i += 2 }
      else if (s.startsWith("!=", i)) { out += EOp("!="); i += 2 }
      else if ("~+-()".contains(c)) { out += EOp(c.toString); i += 1 }
      else throw new IllegalArgumentException(s"unsupported character '$c' in template expression: $s")
    }
    out.toList
  }

  /** Values are Option[Any]: None = Jinja undefined (falsy; propagates through
    * operators; errors only if it reaches output without a `default`).
    */
  private def evalExpr(s: String, env: scala.collection.Map[String, Any]): Option[Any] = {
    var toks = exprTokens(s)
    def peek: Option[ETok] = toks.headOption
    def pop(): ETok = { val h = toks.head; toks = toks.tail; h }

    def primary(): Option[Any] = pop() match {
      case EStr(v) => Some(v)
      case ENum(n) => Some(n)
      case EIdent(name) => lookup(name, env)
      case EOp("(") =>
        val v = orExpr()
        require(peek.contains(EOp(")")), s"missing ')' in: $s"); pop(); v
      case t => throw new IllegalArgumentException(s"unexpected $t in template expression: $s")
    }
    def additive(): Option[Any] = {
      var v = primary()
      while (peek.contains(EOp("+")) || peek.contains(EOp("-"))) {
        val EOp(op) = pop(): @unchecked
        val r = primary()
        v = for (a <- v; b <- r) yield {
          val (x, y) = (a.toString.toLong, b.toString.toLong)
          if (op == "+") x + y else x - y
        }
      }
      v
    }
    def concat(): Option[Any] = {
      var v = additive()
      while (peek.contains(EOp("~"))) {
        pop()
        val r = additive()
        v = for (a <- v; b <- r) yield a.toString + b.toString
      }
      v
    }
    def cmp(): Option[Any] = {
      val v = concat()
      if (peek.contains(EOp("==")) || peek.contains(EOp("!="))) {
        val EOp(op) = pop(): @unchecked
        val r = concat()
        // undefined == anything is false (Jinja), != is true
        val eq = (v, r) match {
          case (Some(a), Some(b)) => a == b || a.toString == b.toString
          case _ => false
        }
        Some(if (op == "==") eq else !eq)
      } else v
    }
    def notExpr(): Option[Any] =
      if (peek.contains(EOp("not"))) { pop(); Some(!truthy(notExpr())) } else cmp()
    def andExpr(): Option[Any] = {
      var v = notExpr()
      while (peek.contains(EOp("and"))) { pop(); val r = notExpr(); v = Some(truthy(v) && truthy(r)) }
      v
    }
    def orExpr(): Option[Any] = {
      var v = andExpr()
      while (peek.contains(EOp("or"))) { pop(); val r = andExpr(); v = Some(truthy(v) || truthy(r)) }
      v
    }
    val result = orExpr()
    require(toks.isEmpty, s"trailing tokens in template expression: $s")
    result
  }

  /** Dotted lookup: exact key first (loop.index lives flat), then map
    * traversal (`partition.column` → env("partition")("column")).
    */
  private def lookup(name: String, env: scala.collection.Map[String, Any]): Option[Any] =
    env.get(name).orElse {
      val parts = name.split('.')
      parts.tail.foldLeft(env.get(parts.head)) {
        case (Some(m: scala.collection.Map[_, _]), k) =>
          m.asInstanceOf[scala.collection.Map[String, Any]].get(k)
        case _ => None
      }
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
