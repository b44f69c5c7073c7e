package graft.plan

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Between, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, SubqueryAlias}

/** One executed statement's captured output (H4; the reference's
  * `StatementResult`, `framework/engines/base.py:16-20`): row-oriented maps,
  * capped at `maxResultRows` like the reference's `df.take(200)`.
  */
case class StatementResult(
    statement: String,
    rows: Seq[Map[String, Any]],
    rowcount: Option[Long])

/** Engine adapter boundary (H12): render → split → execute. */
trait EngineAdapter {
  def name: String
  def runScript(template: String, vars: Map[String, Any]): Seq[StatementResult] = {
    Sql.split(Sql.render(template, vars)).map(execute)
  }
  def execute(statement: String): StatementResult
}

/** Spark SQL adapter (`framework/engines/spark.py:59-73`): capture take(200)
  * for reads; collect() non-capturing statements to force their effects.
  */
class SparkSqlEngine(spark: SparkSession, maxResultRows: Int = 200) extends EngineAdapter {
  override val name = "spark"

  /** Snapshot tables whose SQL reads get stats-based file pruning (the
    * readBetween path surfaced into the engine, VERDICT r7 #8): before each
    * statement runs, a conjunctive range predicate over one of these views
    * shrinks the scan's file list through `GraftTable.planBetween` — the
    * statement's own WHERE clause still applies the exact predicate over the
    * surviving files, so an unrecognized statement shape (joins, subqueries,
    * expressions over the column) just falls back to the full view: never
    * wrong rows, only fewer skipped files.
    */
  private val graftViews = scala.collection.mutable.Map[String, graft.table.GraftTable]()

  /** Namespace remembered from the last `USE`-family statement naming one
    * the registered catalog has; unqualified CREATE TABLE / CTAS resolve
    * against it (the notebook replay flow — openspark.ipynb issues
    * `use namespace x` then bare `create table t (...)`).
    */
  private var currentNamespace: Option[String] = None

  /** Last (files scanned, files total) per view touched by a pruned read —
    * the observable skipping proof for specs and driver entries.
    */
  val lastPrune = scala.collection.mutable.Map[String, (Int, Int)]()

  /** The snapshot each registered view is currently bound to. A re-register
    * whose table head is UNCHANGED skips the temp-view rebuild (DataFrame
    * construction is ~25 ms — it dominated ms-scale metadata statements and
    * was the long-carried "statement-routing constant"): the existing view
    * already reads exactly this snapshot. Pruned registrations bind a
    * file-SHRUNK view of the same snapshot id, so they must clear the entry
    * (pruneGraftViews does) — head equality alone must never skip past one.
    * Equality is eq-then-== : the snapshot-log load cache returns the same
    * parsed instance for an unchanged log, so the hot path is a pointer
    * compare.
    */
  private val boundSnapshots =
    scala.collection.mutable.Map[String, (String, graft.table.Snapshot)]()

  /** Register `t` as temp view `viewName` with pruned SQL reads. The view is
    * re-resolved to the table's LATEST snapshot before every statement.
    * The bound key carries the TABLE DIR as well as the snapshot: two
    * different tables can hold structurally equal heads (freshly created,
    * same schema, same-millisecond commit), and skipping the rebind on
    * content equality alone would leave the view reading the OLD table's
    * files while graftViews points at the new one.
    */
  def registerGraftTable(viewName: String, t: graft.table.GraftTable): Unit = {
    val vn = viewName.toLowerCase
    graftViews(vn) = t
    val cur = t.latest
    val unchanged = boundSnapshots.get(vn).exists { case (dir, b) =>
      dir == t.tableDir && ((b eq cur) || b == cur)
    }
    if (!unchanged) {
      t.readSnapshot(cur).createOrReplaceTempView(viewName)
      boundSnapshots(vn) = (t.tableDir, cur)
    }
  }

  private var catalogOpt: Option[graft.catalogsvc.CatalogService] = None

  /** Attach a catalog so SQL DDL (CREATE NAMESPACE / CREATE TABLE / ALTER
    * WRITE ORDERED BY) routes to it; tables created via SQL auto-register
    * as views for the rest of the script.
    */
  def registerCatalog(cat: graft.catalogsvc.CatalogService): Unit =
    catalogOpt = Some(cat)

  /** Statement-time clock for Snowflake `AT(OFFSET => -s)` resolution
    * (tests pin it; `readOffsetAsOf`'s nowMillis surfaced into SQL).
    */
  var clock: () => Long = () => System.currentTimeMillis()

  override def execute(rawStatement: String): StatementResult = {
    // Snowflake-dialect text (postfix casts, AT travel clauses) translates
    // to Spark grammar BEFORE parsing — the reference's snowflake.sql
    // statements then run verbatim through the same routes as Spark SQL.
    val statement = SqlDml.rewriteSnowflakeDialect(rawStatement, clock)
    // SQL DML over a registered snapshot table routes to the table layer's
    // copy-on-write DML (UPDATE/DELETE/MERGE are not executable over temp
    // views); whole-table COUNT(*) answers from snapshot metadata; VERSION /
    // TIMESTAMP AS OF rewrites to snapshot-pinned views.
    def capture(df: org.apache.spark.sql.DataFrame): StatementResult =
      if (Sql.capturesRows(statement)) {
        val rows = df.take(maxResultRows).map(r =>
          r.schema.fieldNames.zipWithIndex.map { case (f, i) => f -> r.get(i) }.toMap)
        StatementResult(statement, rows.toSeq, None)
      } else {
        df.collect()
        StatementResult(statement, Nil, None)
      }
    // Every route that READS a registered view resets it to the table's
    // latest full snapshot first. A prior statement's pruned registration
    // (file-shrunk view) or pre-commit registration must never leak — a DML
    // whose source subquery reads a registered view would otherwise silently
    // commit rows computed from a stale or file-pruned view (the read path
    // alone resetting was not enough). The metadata-only routes (DDL,
    // COUNT(*) pushdown) answer without touching any view and skip the
    // refresh — metadata must keep answering even when data files are gone.
    SqlDml.tryDdl(spark, statement, catalogOpt, registerGraftTable,
        graftViews.toMap, vn => {
          graftViews.remove(vn)
          boundSnapshots.remove(vn)
          spark.catalog.dropTempView(vn)
        }, () => refreshGraftViews(),
        defaultNamespace = currentNamespace,
        setNamespace = ns => currentNamespace = Some(ns))
      .orElse(SqlDml.tryMetaAgg(statement, spark, graftViews.toMap, catalogOpt))
      .orElse {
        refreshGraftViews()
        SqlDml.tryExecute(spark, statement, graftViews.toMap, catalogOpt).map { r =>
          // the DML committed a new snapshot: re-register immediately so
          // even out-of-band spark.sql readers (not routed through execute)
          // see it
          refreshGraftViews(); r
        }
      }
      .orElse {
        pruneGraftViews(statement)
        SqlDml.tryReadRewrites(spark, statement, graftViews.toMap, catalogOpt).map(capture)
      }
      .getOrElse(capture(spark.sql(statement)))
  }

  /** Reset every registered view to its table's latest full snapshot
    * (no-op per view when the bound head is already current).
    */
  private def refreshGraftViews(): Unit =
    graftViews.foreach { case (n, t) => registerGraftTable(n, t) }

  /** Parse (never execute) `statement`; for each Filter sitting on a
    * registered view, intersect the per-column range bounds into a pruned
    * file list and swap the temp view before execution.
    */
  private def pruneGraftViews(statement: String): Unit = {
    if (graftViews.isEmpty) return
    // views were reset to the full latest snapshot by execute's
    // refreshGraftViews() before any route ran; this pass only narrows
    val parsed =
      try spark.sessionState.sqlParser.parsePlan(statement)
      catch { case _: Throwable => return }
    parsed.foreach {
      case f: Filter =>
        for (viewName <- viewBelow(f.child); t <- graftViews.get(viewName)) {
          val snap = t.latest
          val cols = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
            .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
          var files: Seq[graft.table.FileEntry] = snap.files
          boundsOf(f.condition).foreach { case (colName, (lo, hi)) =>
            if (cols.contains(colName) && (lo.isDefined || hi.isDefined)) {
              val (sel, _) = t.planBetween(snap.copy(files = files.toList),
                colName, lo.orNull, hi.orNull)
              files = sel
            }
          }
          // IN-lists prune per VALUE (union of point passes — the shape
          // where bucket-transform partition pruning bites in plain SQL)
          inListsOf(f.condition).foreach { case (colName, vs) =>
            if (cols.contains(colName)) {
              val (sel, _) = t.planPoints(snap.copy(files = files.toList), colName, vs)
              files = sel
            }
          }
          lastPrune(viewName) = (files.size, snap.files.size)
          if (files.size < snap.files.size) {
            t.readSnapshot(snap.copy(files = files.toList)).createOrReplaceTempView(viewName)
            // the view now reads a file-SHRUNK copy of this snapshot: head
            // equality must not let the next refresh skip the full rebind
            boundSnapshots.remove(viewName)
          }
        }
      case _ =>
    }
  }

  /** The single registered view under a Filter's child (through aliases);
    * None for joins/subqueries — those shapes fall back to the full view.
    * A catalog-qualified `ns.t` maps to its registered view (same table
    * directory) so qualified reads prune exactly like bare ones — the read
    * rewrite later resolves the qualified name to that same (pruned) view.
    */
  private def viewBelow(p: LogicalPlan): Option[String] = p match {
    case r: UnresolvedRelation if r.multipartIdentifier.size == 1 =>
      Some(r.multipartIdentifier.head.toLowerCase)
    case r: UnresolvedRelation if r.multipartIdentifier.size == 2 =>
      val Seq(ns, tn) = r.multipartIdentifier.toSeq
      for {
        cat <- catalogOpt
        if cat.tableExists(ns, tn)
        dir = cat.loadTable(ns, tn).tableDir
        vn <- graftViews.collectFirst { case (n, t) if t.tableDir == dir => n }
      } yield vn
    case s: SubqueryAlias => viewBelow(s.child)
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Conjunctive `col IN (literals)` lists (bounded — past 32 values the
    * per-point passes stop paying for themselves, matching Dml's ceiling).
    */
  private def inListsOf(cond: Expression): Map[String, Seq[Any]] =
    conjuncts(cond).collect {
      case org.apache.spark.sql.catalyst.expressions.In(a, vs)
          if attrName(a).isDefined && vs.nonEmpty && vs.size <= 32 &&
            vs.forall(v => litValue(v).isDefined) =>
        attrName(a).get -> vs.flatMap(litValue)
    }.toMap

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute if a.nameParts.size == 1 => Some(a.nameParts.head)
    case _ => None
  }

  private def litValue(e: Expression): Option[Any] = e match {
    case l: Literal => Option(l.value).map {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case v => v
    }
    case _ => None
  }

  /** column -> (lo, hi) from conjunctive attr-vs-literal comparisons, both
    * operand orders. Strict bounds are widened to inclusive — sound for
    * pruning (a superset of files survives); the statement's own predicate
    * stays exact. Conflicting repeated bounds keep the later one — also
    * sound: matching rows satisfy EVERY conjunct, so any single conjunct's
    * bound over-approximates the matching set.
    */
  private def boundsOf(cond: Expression): Map[String, (Option[Any], Option[Any])] = {
    val m = scala.collection.mutable.LinkedHashMap[String, (Option[Any], Option[Any])]()
    def put(c: String, lo: Option[Any], hi: Option[Any]): Unit = {
      val (l0, h0) = m.getOrElse(c, (None, None))
      m(c) = (lo.orElse(l0), hi.orElse(h0))
    }
    // attr-vs-lit applies `direct`; lit-vs-attr applies `flipped`
    def sides(x: Expression, y: Expression)(direct: (String, Any) => Unit)(
        flipped: (String, Any) => Unit): Unit =
      (attrName(x), litValue(y), attrName(y), litValue(x)) match {
        case (Some(c), Some(v), _, _) => direct(c, v)
        case (_, _, Some(c), Some(v)) => flipped(c, v)
        case _ =>
      }
    conjuncts(cond).foreach {
      case GreaterThanOrEqual(x, y) =>
        sides(x, y)((c, v) => put(c, Some(v), None))((c, v) => put(c, None, Some(v)))
      case GreaterThan(x, y) =>
        sides(x, y)((c, v) => put(c, Some(v), None))((c, v) => put(c, None, Some(v)))
      case LessThanOrEqual(x, y) =>
        sides(x, y)((c, v) => put(c, None, Some(v)))((c, v) => put(c, Some(v), None))
      case LessThan(x, y) =>
        sides(x, y)((c, v) => put(c, None, Some(v)))((c, v) => put(c, Some(v), None))
      case EqualTo(x, y) =>
        sides(x, y)((c, v) => put(c, Some(v), Some(v)))((c, v) => put(c, Some(v), Some(v)))
      case b: Between => // resolved form
        for (c <- attrName(b.input); lo <- litValue(b.lower); hi <- litValue(b.upper))
          put(c, Some(lo), Some(hi))
      // the parser leaves `x BETWEEN lo AND hi` as unresolved 'between(x,lo,hi)
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.map(_.toLowerCase) == Seq("between") && f.arguments.size == 3 =>
        for (c <- attrName(f.arguments(0)); lo <- litValue(f.arguments(1));
             hi <- litValue(f.arguments(2)))
          put(c, Some(lo), Some(hi))
      case _ =>
    }
    m.toMap
  }
}

/** H12 — per-(engine, catalog) adapter cache (`framework/engines/base.py:81-124`). */
class EngineFactory(spark: SparkSession) {
  private val cache = scala.collection.mutable.Map[(String, String), EngineAdapter]()
  def get(engine: String, catalog: String): EngineAdapter = synchronized {
    cache.getOrElseUpdate((engine, catalog), engine match {
      case "spark" => new SparkSqlEngine(spark)
      case other => throw new IllegalArgumentException(s"unknown engine: $other")
    })
  }
  def size: Int = cache.size
}
