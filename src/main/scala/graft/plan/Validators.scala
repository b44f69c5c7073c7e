package graft.plan

/** Validation operators applied to a step's captured results against a shared
  * cross-step state map — the reference's primary correctness mechanism
  * (`framework/validators.py:37-124`, H5-H9).
  */
sealed trait Validation
/** H5 — derived rowcount == rendered expected (supports `{{ state.x }}` refs). */
case class RowcountEquals(expected: String) extends Validation
/** H6 — derived rowcount >= rendered threshold. */
case class RowcountAtLeast(threshold: String) extends Validation
/** H7 — stash the captured row set into state under `key`. */
case class StoreRowsAs(key: String) extends Validation
/** H7 — stash the derived rowcount into state under `key`. */
case class StoreRowcountAs(key: String) extends Validation
/** H8 — row-set equality vs a previously stored state entry. */
case class CompareRowsWithState(key: String) extends Validation

case class ValidationResult(validation: String, passed: Boolean, detail: String)

object Validators {

  /** H9 — rowcount derivation ladder (`framework/validators.py:88-124`):
    * 1. a first-row key named row_count/count/count(1)/count(*) (case-insens);
    * 2. single-row single-column numeric value;
    * 3. the number of captured rows;
    * 4. the engine-reported rowcount.
    */
  def deriveRowcount(result: StatementResult): Option[Long] = {
    val countKeys = Set("row_count", "count", "count(1)", "count(*)")
    result.rows.headOption.flatMap { row =>
      row.collectFirst {
        case (k, v) if countKeys.contains(k.toLowerCase) && v != null => toLong(v)
      }
    }.orElse {
      result.rows match {
        case Seq(single) if single.size == 1 && isNumeric(single.values.head) =>
          Some(toLong(single.values.head))
        case rows if rows.nonEmpty => Some(rows.size.toLong)
        case _ => result.rowcount
      }
    }
  }

  private def isNumeric(v: Any): Boolean = v match {
    case _: Long | _: Int | _: Short | _: Byte | _: java.math.BigDecimal => true
    case _ => false
  }
  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case d: java.math.BigDecimal => d.longValueExact()
    case other => other.toString.toLong
  }

  /** Render `expected` with `state.` variables visible (the reference exposes
    * plan vars and state to the Jinja context; we expose state + vars).
    */
  private def renderExpected(expr: String, vars: Map[String, Any],
      state: scala.collection.Map[String, Any]): Long = {
    val scope = vars ++ state.map { case (k, v) => s"state.$k" -> v }
    Sql.render(expr, scope).trim.toLong
  }

  /** Apply one validation to the last captured result (the reference applies
    * validations to the final statement's output, `validators.py:40-45`).
    */
  def apply(v: Validation, results: Seq[StatementResult], vars: Map[String, Any],
      state: scala.collection.mutable.Map[String, Any]): ValidationResult = {
    val last = results.lastOption.getOrElse(StatementResult("", Nil, None))
    v match {
      case RowcountEquals(expected) =>
        val exp = renderExpected(expected, vars, state)
        val got = deriveRowcount(last)
        ValidationResult(s"rowcount_equals($expected)", got.contains(exp),
          s"expected=$exp derived=${got.getOrElse("none")}")
      case RowcountAtLeast(threshold) =>
        val thr = renderExpected(threshold, vars, state)
        val got = deriveRowcount(last)
        ValidationResult(s"rowcount_at_least($threshold)", got.exists(_ >= thr),
          s"threshold=$thr derived=${got.getOrElse("none")}")
      case StoreRowsAs(key) =>
        state(key) = last.rows
        ValidationResult(s"store_rows_as($key)", passed = true, s"stored ${last.rows.size} rows")
      case StoreRowcountAs(key) =>
        val got = deriveRowcount(last)
        got.foreach(state(key) = _)
        ValidationResult(s"store_rowcount_as($key)", got.isDefined,
          s"stored=${got.getOrElse("none")}")
      case CompareRowsWithState(key) =>
        val stored = state.get(key).collect { case r: Seq[_] => r }.getOrElse(Nil)
        val same = stored == last.rows
        ValidationResult(s"compare_rows_with_state($key)", same,
          s"stored=${stored.size} rows, captured=${last.rows.size} rows")
    }
  }
}
