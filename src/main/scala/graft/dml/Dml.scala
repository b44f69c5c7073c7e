package graft.dml

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.table.{FileEntry, GraftTable, Snapshot, SnapshotLog}

/** Row-level DML over `GraftTable`, copy-on-write at file granularity
  * (SURVEY.md §2.8, D1-D3/J1-J2).
  *
  * Algorithm (the Iceberg COW shape): plan which data files actually contain
  * matching rows (one filtered scan collecting `input_file_name()` — the
  * collect is a *file-name list*, bounded by file count, never data), rewrite
  * only those files, and commit a snapshot that keeps every untouched file by
  * reference. At 100 TB a selective UPDATE rewrites a handful of files; the
  * filtered planning scan itself benefits from partition pruning and parquet
  * min/max skipping because `pred` is pushed into the scan.
  */
object Dml {

  /** Map fully-qualified `input_file_name()` URIs back to table-relative
    * paths, once, into a Set — so matching the snapshot's file entries is
    * O(1) per entry. (The previous `endsWith` scan per entry was
    * O(files × touched) string suffix comparisons on the driver: ~10^11 at
    * the 100 TB ≈ 800k-file design point.)
    */
  private def toRelative(t: GraftTable, fullPaths: Iterable[String]): Set[String] = {
    val conf = t.spark.sessionState.newHadoopConf()
    val fs = SnapshotLog.fs(conf, t.tableDir)
    val root = fs.makeQualified(SnapshotLog.dataPath(t.tableDir)).toUri.getPath + "/"
    fullPaths.iterator.map { p =>
      val abs = new HPath(p).toUri.getPath
      require(abs.startsWith(root), s"scanned file $abs outside table data root $root")
      abs.stripPrefix(root)
    }.toSet
  }

  /** 100 TB guard: COW planning holds the touched-file name list on the
    * driver — bounded by file count (fine at the ~800k-file design point),
    * but a predicate touching tens of millions of files signals a full-table
    * rewrite that should be `overwrite()` instead of per-file COW. Returns
    * the warning it logs so the bound is unit-testable.
    */
  private[dml] def plannedFilesWarning(touched: Long, ceiling: Long = 1000000L): Option[String] =
    if (touched > ceiling)
      Some(s"DML planning touched $touched files (ceiling $ceiling): the driver-side " +
        "file list is at risk at this scale — use a coarser predicate per operation " +
        "or a full overwrite() instead of copy-on-write planning")
    else None

  private def warnCeiling(touched: Int): Unit =
    plannedFilesWarning(touched.toLong).foreach(w => System.err.println(s"[graft.dml] $w"))

  /** Conjunctive per-column range bounds extracted from a DML predicate's
    * expression tree — the metadata-pruning hook for COW planning. Only
    * top-level AND conjuncts comparing a bare column to a literal
    * contribute; anything else (OR, NOT, computed expressions, null
    * literals, null-safe equality — whose null matches no min/max range)
    * contributes nothing, which is CONSERVATIVE: missing bounds mean more
    * candidate files, never fewer. Literal values are Catalyst-internal
    * (UTF8String, epoch-micros/days), which is exactly `planBetween`'s
    * physical comparison domain.
    */
  private[dml] def predicateBounds(t: GraftTable, planned: Snapshot,
      pred: Column): Map[String, (Option[Any], Option[Any])] = {
    import org.apache.spark.sql.catalyst.expressions._
    // Column no longer exposes its expression directly (Spark 4 split the
    // Column API from Catalyst); analyzing a filter over an EMPTY relation
    // with the table schema resolves the predicate without touching data.
    val schema = org.apache.spark.sql.types.DataType.fromJson(planned.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val empty = t.spark.createDataFrame(
      t.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val resolved: Seq[Expression] = empty.filter(pred).queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }
    if (resolved.isEmpty) return Map.empty
    // the analyzer wraps literals in implicit casts (110 → cast(110 as
    // bigint)); any foldable subtree evaluates to its internal constant
    def lit(e: Expression): Option[Any] = e match {
      case e if e.foldable && !e.exists(_.isInstanceOf[AttributeReference]) =>
        Option(e.eval(null)).map {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => other
        }
      case _ => None
    }
    def attr(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case Cast(a: AttributeReference, _, _, _) => None // cast changes the domain
      case _ => None
    }
    def walk(e: Expression): Seq[(String, Option[Any], Option[Any])] = e match {
      case And(l, r) => walk(l) ++ walk(r)
      case EqualTo(a, v) => (for (n <- attr(a); x <- lit(v)) yield (n, Some(x), Some(x))).toSeq ++
        (for (n <- attr(v); x <- lit(a)) yield (n, Some(x), Some(x))).toSeq
      case GreaterThan(a, v) => (for (n <- attr(a); x <- lit(v)) yield (n, Some(x), None)).toSeq ++
        (for (n <- attr(v); x <- lit(a)) yield (n, None, Some(x))).toSeq
      case GreaterThanOrEqual(a, v) => (for (n <- attr(a); x <- lit(v)) yield (n, Some(x), None)).toSeq ++
        (for (n <- attr(v); x <- lit(a)) yield (n, None, Some(x))).toSeq
      case LessThan(a, v) => (for (n <- attr(a); x <- lit(v)) yield (n, None, Some(x))).toSeq ++
        (for (n <- attr(v); x <- lit(a)) yield (n, Some(x), None)).toSeq
      case LessThanOrEqual(a, v) => (for (n <- attr(a); x <- lit(v)) yield (n, None, Some(x))).toSeq ++
        (for (n <- attr(v); x <- lit(a)) yield (n, Some(x), None)).toSeq
      case _ => Nil
    }
    resolved.flatMap(walk).groupBy(_._1).map { case (c, bs) =>
      // Any ONE conjunct bound per side is a sound superset range (all
      // conjuncts hold simultaneously, so each alone keeps at least the
      // matching files); picking the first avoids comparing Any-typed
      // literals here. Multiple conjuncts on one column are rare enough
      // that the lost tightness doesn't matter.
      val los = bs.flatMap(_._2)
      val his = bs.flatMap(_._3)
      c -> (los.headOption, his.headOption)
    }
  }

  /** IN-list ceiling for point-per-value file pruning: beyond this many
    * literals the per-value metadata passes stop paying for themselves and
    * the predicate plans conservatively (all candidate files kept).
    */
  private val InListPruneCeiling = 32

  /** Minimum target file count for MERGE's source key-range planning agg —
    * below it the extra source scan costs more than the pruning saves.
    */
  private[dml] val RangePruneMinFiles = 8

  /** Conjunctive `col IN (v1, ..., vN)` lists from a DML predicate (each
    * value a foldable literal; N ≤ `InListPruneCeiling`). A small key list —
    * the CDC-style `DELETE WHERE k IN (...)` shape — prunes files per VALUE,
    * which is far tighter than a [min, max] envelope when the keys are
    * sparse over a clustered table.
    */
  private[dml] def predicateInLists(t: GraftTable, planned: Snapshot,
      pred: Column): Map[String, Seq[Any]] = {
    import org.apache.spark.sql.catalyst.expressions._
    val schema = org.apache.spark.sql.types.DataType.fromJson(planned.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val empty = t.spark.createDataFrame(
      t.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val resolved: Seq[Expression] = empty.filter(pred).queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }
    def lit(e: Expression): Option[Any] = e match {
      case e if e.foldable && !e.exists(_.isInstanceOf[AttributeReference]) =>
        Option(e.eval(null)).map {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => other
        }
      case _ => None
    }
    def walk(e: Expression): Seq[(String, Seq[Any])] = e match {
      case And(l, r) => walk(l) ++ walk(r)
      case In(a: AttributeReference, vs) if vs.size <= InListPruneCeiling =>
        val lits = vs.map(lit)
        if (lits.forall(_.isDefined)) Seq(a.name -> lits.flatten) else Nil
      case _ => Nil
    }
    resolved.flatMap(walk).toMap
  }

  /** Conjunctive IS NULL / IS NOT NULL facts from a DML predicate — the
    * null-count pruning hook (`GraftTable.planNullability`). Only top-level
    * AND conjuncts over a bare column contribute; a contradiction (both
    * polarities on one column) keeps one side, which is still a sound
    * superset since the predicate then matches nothing.
    */
  private[dml] def predicateNullability(t: GraftTable, planned: Snapshot,
      pred: Column): Map[String, Boolean] = {
    import org.apache.spark.sql.catalyst.expressions._
    val schema = org.apache.spark.sql.types.DataType.fromJson(planned.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val empty = t.spark.createDataFrame(
      t.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val resolved: Seq[Expression] = empty.filter(pred).queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }
    def walk(e: Expression): Seq[(String, Boolean)] = e match {
      case And(l, r) => walk(l) ++ walk(r)
      case IsNull(a: AttributeReference) => Seq(a.name -> true)
      case IsNotNull(a: AttributeReference) => Seq(a.name -> false)
      case _ => Nil
    }
    resolved.flatMap(walk).toMap
  }

  /** The files a DML predicate could possibly touch, pre-shrunk by snapshot
    * metadata (stats + partition-value + null-count pruning) BEFORE any
    * data file is opened. At 100 TB this is the difference between a
    * planning scan over every file and one over the handful whose bounds
    * intersect the predicate. Always a superset of the truly-matching files.
    */
  private[dml] def planningCandidates(t: GraftTable, planned: Snapshot,
      pred: Column): (Seq[FileEntry], Int) = {
    val total = planned.files.size
    val bounds = scala.util.Try(predicateBounds(t, planned, pred))
      .getOrElse(Map.empty[String, (Option[Any], Option[Any])])
    val ranged = bounds.foldLeft(planned.files: Seq[FileEntry]) {
      case (files, (c, (lo, hi))) =>
        if (lo.isEmpty && hi.isEmpty) files
        else scala.util.Try(
          t.planBetween(planned.copy(files = files.toList), c, lo.orNull, hi.orNull)._1
        ).getOrElse(files) // unknown column / unexpected literal: keep all
    }
    val nullability = scala.util.Try(predicateNullability(t, planned, pred))
      .getOrElse(Map.empty[String, Boolean])
    val nulled = nullability.foldLeft(ranged) {
      case (files, (c, isNull)) => scala.util.Try(
        t.planNullability(planned.copy(files = files.toList), c, isNull)._1
      ).getOrElse(files)
    }
    // IN-lists prune per VALUE: a file survives iff at least one listed key
    // could live in it — the union of the per-point planBetween passes,
    // which is also where bucket-transform partition pruning composes in.
    val inLists = scala.util.Try(predicateInLists(t, planned, pred))
      .getOrElse(Map.empty[String, Seq[Any]])
    val candidates = inLists.foldLeft(nulled) {
      case (files, (c, vs)) => scala.util.Try(
        t.planPoints(planned.copy(files = files.toList), c, vs)._1
      ).getOrElse(files)
    }
    (candidates, total)
  }

  /** Split a snapshot's files into (files containing rows matching pred,
    * files provably untouched), remembering the snapshot the plan is based
    * on — commitRewrite validates nothing advanced past it. The planning
    * scan itself runs only over metadata-pruned candidate files; files the
    * snapshot's stats exclude are untouched without being opened.
    */
  private[graft] def planFiles(t: GraftTable, pred: Column): (Seq[FileEntry], Seq[FileEntry], Snapshot) = {
    val planned = t.latest
    val (candidates, _) = planningCandidates(t, planned, pred)
    // tagged at the scan: plain input_file_name() over the read is ambiguous
    // once merge-on-read deletes add their own file sources to the plan
    val withFile = t.readSnapshotTagged(
      planned.copy(files = candidates.toList), "_file")
    val touched = toRelative(t,
      withFile.filter(pred).select("_file").distinct().collect().map(_.getString(0)))
    warnCeiling(touched.size)
    val (m, u) = planned.files.partition(e => touched.contains(e.path))
    (m, u, planned)
  }

  /** Plan the source-keys side of MERGE's matched-file semi-join. Broadcast
    * is a *hint gated on Catalyst's size estimate* (default gate:
    * `spark.sql.autoBroadcastJoinThreshold`), never unconditional: the spec's
    * merge mix (ICEBERG-Interoperability-Test-Spec.md:72, 75% inserts) at
    * 100 TB implies sources with millions–billions of distinct keys, and a
    * forced broadcast of those would override AQE and OOM the driver. Above
    * the gate the join stays a shuffled left-semi equi-join — AQE may still
    * convert it to broadcast at runtime if the *actual* key set turns out
    * small, which is exactly the decision order we want (estimate → hint;
    * runtime size → AQE).
    */
  private[graft] def planKeys(source: DataFrame, key: String,
      thresholdBytes: Option[Long] = None): DataFrame = {
    val keys = source.select(col(key)).distinct()
    val gate = thresholdBytes.getOrElse(
      source.sparkSession.sessionState.conf.autoBroadcastJoinThreshold)
    if (gate > 0 && keys.queryExecution.optimizedPlan.stats.sizeInBytes <= gate)
      broadcast(keys)
    else keys
  }

  /** D1 — `UPDATE t SET ... WHERE pred` (ref update_sales_events.sql:3-5). */
  def update(t: GraftTable, pred: Column, assignments: Map[String, Column]): Snapshot = {
    val (matched, untouched, planned) = planFiles(t, pred)
    if (matched.isEmpty) return t.latest
    val rewritten = assignments.foldLeft(t.readFiles(matched, planned)) { case (df, (c, e)) =>
      df.withColumn(c, when(pred, e).otherwise(col(c)))
    }
    t.commitRewrite(rewritten, untouched, "update", basedOn = Some(planned))
  }

  /** D2 — `DELETE FROM t WHERE pred` (ref delete_sales_events.sql:3-4). */
  def delete(t: GraftTable, pred: Column): Snapshot = {
    val (matched, untouched, planned) = planFiles(t, pred)
    if (matched.isEmpty) return t.latest
    val rewritten = t.readFiles(matched, planned).filter(!pred)
    t.commitRewrite(rewritten, untouched, "delete", basedOn = Some(planned))
  }

  /** `write.delete.representation` routing for merge-on-read DML:
    * `equality` (default) keys on identifier columns, `positional` writes
    * delete vectors. Any other value is refused loudly — a typo silently
    * falling back to equality would change DML semantics on a non-unique
    * key.
    */
  def positionalRepresentation(t: GraftTable): Boolean =
    t.properties.get(GraftTable.DeleteRepresentationProp)
      .map(_.toLowerCase) match {
      case Some("positional") => true
      case Some("equality") | None => false
      case Some(other) => throw new UnsupportedOperationException(
        s"${GraftTable.DeleteRepresentationProp}='$other' (equality or positional)")
    }

  private def morMode(t: GraftTable, prop: String): Boolean =
    t.properties.get(prop).map(_.toLowerCase).contains("merge-on-read")

  private def identifierCols(t: GraftTable, modeProp: String): Seq[String] =
    t.properties.get(GraftTable.IdentifierColumnsProp)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(
        s"$modeProp=merge-on-read needs ${GraftTable.IdentifierColumnsProp} on " +
          s"${t.tableDir} (or ${GraftTable.DeleteRepresentationProp}=positional)"))

  /** DELETE routed by the table's `write.delete.mode` /
    * `write.delete.representation` properties — the single entry point every
    * SQL route (pre-router and Spark catalog alike) goes through, so a
    * table declared merge-on-read gets its O(matched) read-only plan from
    * any door, never a silent COW rewrite.
    */
  def deleteAuto(t: GraftTable, pred: Column): Snapshot =
    if (!morMode(t, GraftTable.DeleteModeProp)) delete(t, pred)
    else if (positionalRepresentation(t)) deleteMorPositional(t, pred)
    else deleteMor(t, pred, identifierCols(t, GraftTable.DeleteModeProp))

  /** UPDATE routed by `write.update.mode` — see [[deleteAuto]]. */
  def updateAuto(t: GraftTable, pred: Column,
      assignments: Map[String, Column]): Snapshot =
    if (!morMode(t, GraftTable.UpdateModeProp)) update(t, pred, assignments)
    else if (positionalRepresentation(t)) updateMorPositional(t, pred, assignments)
    else updateMor(t, pred, assignments, identifierCols(t, GraftTable.UpdateModeProp))

  /** Merge-on-read DELETE by explicit keys (the Iceberg v2 equality-delete
    * write, the Flink-CDC delete shape): `keys`' columns name table columns;
    * each tuple deletes every live row equal on all of them (null-safe).
    * Writes ONE small delete file + a metadata commit — no data file is
    * opened, read, or rewritten, so cost is O(batch) regardless of how many
    * of the table's files hold matching rows. Reads reconcile via a
    * broadcast anti-join until `Maintenance.materializeDeletes` folds the
    * deletes in. Composes with concurrent appends (the delete is the later
    * commit and applies to them).
    */
  def deleteMorKeys(t: GraftTable, keys: DataFrame): Snapshot =
    t.commitMorDelta(keys, None, "delete-mor")

  /** Merge-on-read `DELETE FROM t WHERE pred`: enumerate the distinct
    * `keyCols` tuples of matching rows (one pushed-down scan — read-only,
    * unlike COW's rewrite), then commit them as an equality-delete file.
    * `keyCols` must functionally identify the rows to delete: every live row
    * sharing a matching row's key tuple is deleted with it (choose a unique
    * key, or exactly the predicate columns). Serializable like COW delete:
    * aborts if a commit lands between planning and publish.
    */
  def deleteMor(t: GraftTable, pred: Column, keyCols: Seq[String]): Snapshot = {
    val planned = t.latest
    val keys = t.readSnapshot(planned).filter(pred)
      .select(keyCols.map(col): _*).distinct()
    t.commitMorDelta(keys, None, "delete-mor", basedOn = Some(planned))
  }

  /** Positional merge-on-read `DELETE FROM t WHERE pred` (the Iceberg v3
    * deletion-vector shape, and what Iceberg-Spark itself writes for MOR
    * DML): ONE metadata-pruned, read-only scan of candidate files addresses
    * the matched rows as (part-file name, row position) tuples, committed as
    * a delete VECTOR — zero data files rewritten, no identifier columns
    * trusted, and a non-unique key can never over-delete: the vector names
    * exactly the rows the predicate matched. Reads reconcile with a single
    * broadcast anti-join on the row address (cheaper than equality: no
    * per-group key comparison, no applicability bound).
    */
  def deleteMorPositional(t: GraftTable, pred: Column): Snapshot = {
    val planned = t.latest
    val (candidates, _) = planningCandidates(t, planned, pred)
    if (candidates.isEmpty) return planned
    val dv = t.readSnapshotTagged(planned.copy(files = candidates.toList),
        "_gf_uri", GraftTable.PosCol)
      .filter(pred)
      .select(element_at(split(col("_gf_uri"), "/"), -1).as(GraftTable.WrittenAtCol),
        col(GraftTable.PosCol))
    if (dv.limit(1).isEmpty) return planned
    t.commitDvDelta(dv, None, "delete-dv", basedOn = Some(planned))
  }

  /** Positional merge-on-read `UPDATE t SET ... WHERE pred`: ONE delete
    * vector + append commit — the matched rows' addresses delete, their
    * updated versions append, ZERO data files rewrite. Unlike [[updateMor]]
    * this needs NO identifier-column declaration and cannot over-delete on a
    * non-unique key: positions name exactly the matched rows.
    */
  def updateMorPositional(t: GraftTable, pred: Column,
      assignments: Map[String, Column]): Snapshot = {
    val planned = t.latest
    val (candidates, _) = planningCandidates(t, planned, pred)
    if (candidates.isEmpty) return planned
    val tagged = t.readSnapshotTagged(planned.copy(files = candidates.toList),
      "_gf_uri", GraftTable.PosCol).filter(pred)
    val dv = tagged
      .select(element_at(split(col("_gf_uri"), "/"), -1).as(GraftTable.WrittenAtCol),
        col(GraftTable.PosCol))
    if (dv.limit(1).isEmpty) return planned
    val updated0 = assignments.foldLeft(
      tagged.drop("_gf_uri", GraftTable.PosCol)) { case (df, (c, e)) =>
      df.withColumn(c, e)
    }
    // assigned expressions cast to the column's declared type (the same
    // explicit coercion the COW path gets implicitly from when/otherwise)
    val updated = updated0.select(t.schema.fields.map { f =>
      if (assignments.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)
    t.commitDvDelta(dv, Some(updated), "update-dv", basedOn = Some(planned))
  }

  /** Merge-on-read UPSERT (the Flink-CDC / Iceberg upsert-mode write): ONE
    * commit that equality-deletes `source`'s key tuples and appends
    * `source`'s rows. Existing rows with a source key disappear (their files
    * predate the commit), the new versions land as ordinary data files —
    * MERGE semantics at O(batch) write cost, deferring reconciliation to
    * reads. A duplicated source key raises (the MERGE cardinality guard:
    * two versions of the same key in one batch have no defined winner).
    */
  def upsertMor(t: GraftTable, source: DataFrame, keyCols: Seq[String],
      operation: String = "upsert-mor",
      basedOn: Option[Snapshot] = None): Snapshot = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCols.map(col): _*)
    val guarded = source.withColumn("_src_cnt", count(lit(1)).over(w))
      .select(source.columns.map { c =>
        // the guard rides the first key column — always in the output, so
        // Catalyst cannot prune it; the window reuses the write's clustering
        if (c == keyCols.head)
          when(col("_src_cnt") <= 1, col(c)).otherwise(raise_error(concat(
            lit("UPSERT cardinality violation: source has multiple rows for key "),
            col(c).cast("string")))).as(c)
        else col(c)
      }.toSeq: _*)
    t.commitMorDelta(guarded.select(keyCols.map(col): _*), Some(guarded), operation,
      basedOn = basedOn)
  }

  /** Merge-on-read `UPDATE t SET ... WHERE pred` (Iceberg's
    * `write.update.mode=merge-on-read`): ONE equality-delete + append commit
    * replacing the matched rows with their updated versions — the matched
    * scan is metadata-pruned and read-only, and ZERO data files rewrite (at
    * 100 TB a predicate UPDATE that rewrites files when a delete+append
    * would do is the expensive plan). `keyCols` are the table's declared
    * identifier columns and are TRUSTED unique (the identifier-field
    * contract, same trust as CDC upsert): a non-matched live row sharing a
    * matched row's key tuple would be deleted without replacement.
    * Duplicate tuples inside the matched set itself raise via the upsert
    * cardinality guard.
    */
  def updateMor(t: GraftTable, pred: Column, assignments: Map[String, Column],
      keyCols: Seq[String]): Snapshot = {
    val (matched, _, planned) = planFiles(t, pred)
    if (matched.isEmpty) return t.latest
    val updated = assignments.foldLeft(
      t.readFiles(matched, planned).filter(pred)) { case (df, (c, e)) =>
      df.withColumn(c, e)
    }
    upsertMor(t, updated, keyCols, "update-mor", basedOn = Some(planned))
  }

  /** Merge-on-read MERGE (Iceberg's `write.merge.mode=merge-on-read`): the
    * same matched/not-matched semantics as [[merge]] committed as ONE
    * equality-delete + append — matched keys delete, updated versions and
    * not-matched inserts append, ZERO data files rewrite. Safe without an
    * identifier-column declaration: the delete key IS the merge key, and
    * every live row holding a matched key is by definition matched (joined),
    * so delete-by-key is exactly "delete the matched rows". The matched scan
    * is an inner join of live rows to the source — read-only, O(matched)
    * moved rows. The COW cardinality guard carries over (a duplicated source
    * key raises, including when all duplicates are delete-marked).
    */
  def mergeMor(t: GraftTable, source: DataFrame, key: String,
      updateSet: Map[String, Column], insertNotMatched: Boolean,
      deleteWhen: Option[Column] = None): Snapshot = {
    val planned = t.latest
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
    val src = source.withColumn("_src_cnt", count(lit(1)).over(w)).alias("src")
    val tgt = t.readSnapshot(planned).alias("tgt")
    val joined = tgt.join(src, col(s"tgt.$key") === col(s"src.$key"), "inner")
    val cardinalityOk = col("src._src_cnt") <= 1
    val cardErr = raise_error(concat(
      lit("MERGE cardinality violation: source has multiple rows for key "),
      col(s"src.$key").cast("string")))
    // guard INSIDE the delete filter, like merge: dup-key sources whose
    // duplicates are all delete-marked must raise, not silently delete
    val survivors = deleteWhen match {
      case Some(d) => joined.filter(
        when(!cardinalityOk, cardErr.cast("boolean"))
          .otherwise(!coalesce(d, lit(false))))
      case None => joined
    }
    // explicit cast to the table field type: the COW path's
    // when(hasMatch, e).otherwise(tgt.c) coerces source-typed expressions
    // implicitly (e.g. a VALUES INT source into a BIGINT column); without
    // the otherwise-branch the cast must be spelled
    val updatedCols = t.schema.fields.map { f =>
      val base = updateSet.get(f.name) match {
        case Some(e) => e.cast(f.dataType)
        case None => col(s"tgt.${f.name}")
      }
      if (f.name == key) when(cardinalityOk, base).otherwise(cardErr).as(f.name)
      else base.as(f.name)
    }
    val updated = survivors.select(updatedCols.toSeq: _*)
    // every matched key equality-deletes (updated AND delete-marked rows);
    // matchedKeys is also exactly "source keys present in the target", so
    // the insert anti-join probes this small set, not the table
    val matchedKeys = joined.select(col(s"tgt.$key").as(key)).distinct()
    val appended =
      if (!insertNotMatched) updated
      else {
        val srcInsertable = deleteWhen match {
          case Some(d) => src.filter(!coalesce(d, lit(false)))
          case None => src
        }
        val inserts = srcInsertable.join(matchedKeys, Seq(key), "left_anti")
          .select(t.schema.fields.map(f =>
            col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
        updated.unionByName(inserts)
      }
    t.commitMorDelta(matchedKeys, Some(appended), "merge-mor",
      basedOn = Some(planned))
  }

  /** Positional merge-on-read MERGE: the same matched/not-matched semantics
    * as [[mergeMor]] committed as ONE delete VECTOR + append — every matched
    * target row's (file, position) address deletes (updated and delete-
    * marked alike), updated versions and not-matched inserts append, ZERO
    * data files rewrite. Unlike the equality path this also composes with
    * live rows that merely SHARE a matched key value in pathological data:
    * the vector names the joined rows themselves. The COW cardinality guard
    * rides the vector's file column, so a duplicated source key raises
    * before anything commits.
    */
  def mergeMorPositional(t: GraftTable, source: DataFrame, key: String,
      updateSet: Map[String, Column], insertNotMatched: Boolean,
      deleteWhen: Option[Column] = None): Snapshot = {
    val planned = t.latest
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
    val src = source.withColumn("_src_cnt", count(lit(1)).over(w)).alias("src")
    val tgt = t.readSnapshotTagged(planned, "_gf_uri", GraftTable.PosCol).alias("tgt")
    val joined = tgt.join(src, col(s"tgt.$key") === col(s"src.$key"), "inner")
    val cardinalityOk = col("src._src_cnt") <= 1
    val cardErr = raise_error(concat(
      lit("MERGE cardinality violation: source has multiple rows for key "),
      col(s"src.$key").cast("string")))
    val dv = joined.select(
      when(cardinalityOk, element_at(split(col("tgt._gf_uri"), "/"), -1))
        .otherwise(cardErr).as(GraftTable.WrittenAtCol),
      col(s"tgt.${GraftTable.PosCol}").as(GraftTable.PosCol))
    val survivors = deleteWhen match {
      case Some(d) => joined.filter(
        when(!cardinalityOk, cardErr.cast("boolean"))
          .otherwise(!coalesce(d, lit(false))))
      case None => joined
    }
    val updatedCols = t.schema.fields.map { f =>
      val base = updateSet.get(f.name) match {
        case Some(e) => e.cast(f.dataType)
        case None => col(s"tgt.${f.name}")
      }
      if (f.name == key) when(cardinalityOk, base).otherwise(cardErr).as(f.name)
      else base.as(f.name)
    }
    val updated = survivors.select(updatedCols.toSeq: _*)
    val matchedKeys = joined.select(col(s"tgt.$key").as(key)).distinct()
    val appended =
      if (!insertNotMatched) updated
      else {
        val srcInsertable = deleteWhen match {
          case Some(d) => src.filter(!coalesce(d, lit(false)))
          case None => src
        }
        val inserts = srcInsertable.join(matchedKeys, Seq(key), "left_anti")
          .select(t.schema.fields.map(f =>
            col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
        updated.unionByName(inserts)
      }
    t.commitDvDelta(dv, Some(appended), "merge-dv", basedOn = Some(planned))
  }

  /** D3/J1/J2 — `MERGE INTO t USING source ON t.key = source.key`
    * (ref merge_sales_events.sql:4-21, mixed-op spec
    * ICEBERG-Interoperability-Test-Spec.md:72 "20% updates, 5% deletes,
    * 75% inserts").
    *
    * `updateSet` maps target columns to expressions over the joined row
    * (reference source columns as `src.<col>`); rows with no match insert the
    * full source row when `insertNotMatched` (WHEN NOT MATCHED THEN INSERT).
    * `deleteWhen` is WHEN MATCHED AND <cond> THEN DELETE — it must reference
    * SOURCE columns (as `src.<col>`), since it also excludes delete-marked
    * source rows from the insert branch. Matched rows in untouched files are
    * impossible by construction: every file containing a key present in
    * `source` is rewritten.
    */
  def merge(t: GraftTable, source: DataFrame, key: String,
      updateSet: Map[String, Column], insertNotMatched: Boolean,
      deleteWhen: Option[Column] = None,
      broadcastKeyThresholdBytes: Option[Long] = None): Snapshot = {
    // MERGE cardinality guard (Spark/Iceberg MERGE raises on multiple source
    // matches per target row; ref merge_sales_events.sql:4-21 assumes a
    // unique-key source): a duplicated source key would silently multiply
    // every matched target row through the left join below. The per-key count
    // rides the source as a window over the merge key — on the shuffled-join
    // path the window reuses the hash partitioning the rewrite join needs
    // anyway (a broadcast-sized source pays one small extra exchange). The
    // guard fires per matched row during the rewrite, BEFORE the delete
    // branch filters anything (see kept/updatedCols) — engines raise the
    // multiple-source-rows error for delete actions too. Not-matched
    // duplicates insert once each, matching engine MERGE semantics.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
    val src = source.withColumn("_src_cnt", count(lit(1)).over(w)).alias("src")
    // Plan matched files via a semi-join against the source keys — the source
    // never collects to the driver (a VALUES-sized source broadcasts via the
    // size-gated hint; a large source shuffles its key column only).
    val planned = t.latest
    val srcKeys = planKeys(source, key, broadcastKeyThresholdBytes)
    // Metadata-prune the matched-file planning scan by the SOURCE's key
    // range: files whose key bounds miss [min(src), max(src)] cannot hold a
    // matched row and go straight to untouched without being opened. One
    // tiny 2-value agg over the source buys O(candidate files) planning for
    // clustered targets (e.g. a CDC batch of recent keys against a
    // key-ordered table). Sound: pruning only narrows the MATCHED side.
    // Gated on target FILE COUNT: below the gate the candidate scan is
    // already a handful of files and the agg is a whole extra source scan
    // that cannot pay for itself (it showed up as the r8 bench drift on
    // t_merge_large_source's single-file target); at the 100 TB design
    // point file counts dwarf the gate and the agg always runs.
    val keyRange =
      if (planned.files.size < RangePruneMinFiles) (None, None)
      else scala.util.Try {
        val r = source.agg(min(col(key)), max(col(key))).collect()(0)
        (Option(r.get(0)), Option(r.get(1)))
      }.getOrElse((None, None))
    val candidates = keyRange match {
      case (Some(lo), Some(hi)) =>
        scala.util.Try(t.planBetween(planned, key, lo, hi)._1).getOrElse(planned.files)
      case _ => planned.files
    }
    val withFile = t.readSnapshotTagged(planned.copy(files = candidates.toList), "_file")
    val touched = toRelative(t,
      withFile.join(srcKeys, Seq(key), "left_semi")
        .select("_file").distinct().collect().map(_.getString(0)))
    warnCeiling(touched.size)
    val (matched, untouched) = planned.files.partition(e => touched.contains(e.path))
    // Rewrite matched files: left-join to source, drop matched rows the
    // delete condition selects, apply updates where joined.
    val tgt = t.readFiles(matched, planned).alias("tgt")
    val joined = tgt.join(src, col(s"tgt.$key") === col(s"src.$key"), "left")
    val hasMatch = col(s"src.$key").isNotNull
    val cardinalityOk = coalesce(col("src._src_cnt"), lit(1L)) <= 1
    val cardErr = raise_error(concat(
      lit("MERGE cardinality violation: source has multiple rows for key "),
      col(s"src.$key").cast("string")))
    // The guard is evaluated INSIDE the delete filter, before any row is
    // discarded: a dup-key source whose duplicates are all delete-marked must
    // raise, not silently delete (filtering first would hide those rows from
    // the updatedCols check below).
    val kept = deleteWhen match {
      case Some(d) => joined.filter(
        when(hasMatch && !cardinalityOk, cardErr.cast("boolean"))
          .otherwise(!(hasMatch && coalesce(d, lit(false)))))
      case None => joined
    }
    // Cardinality violation also surfaces on the key column of every matched
    // row that survives the delete branch (the key is always in the output,
    // so Catalyst cannot prune the check): a matched row whose source key
    // appears >1 times raises instead of writing multiplied rows.
    val updatedCols = t.schema.fieldNames.map { c =>
      val base = updateSet.get(c) match {
        case Some(e) => when(hasMatch, e).otherwise(col(s"tgt.$c"))
        case None => col(s"tgt.$c")
      }
      if (c == key) when(cardinalityOk, base).otherwise(cardErr).as(c)
      else base.as(c)
    }
    val rewritten = kept.select(updatedCols.toSeq: _*)
    // WHEN NOT MATCHED THEN INSERT. Keys present anywhere in the target are
    // present in a matched file by construction (any file holding a source
    // key was planned as matched), so anti-joining against just the matched
    // files' keys is equivalent to anti-joining the whole table — and reads
    // only files already being rewritten, halving merge read I/O.
    val result =
      if (!insertNotMatched) rewritten
      else {
        val srcInsertable = deleteWhen match {
          case Some(d) => src.filter(!coalesce(d, lit(false)))
          case None => src
        }
        val matchedKeys = t.readFiles(matched, planned).select(key)
        val inserts = srcInsertable.join(matchedKeys, Seq(key), "left_anti")
          .select(t.schema.fieldNames.map(col).toSeq: _*)
        rewritten.unionByName(inserts)
      }
    t.commitRewrite(result, untouched, "merge", basedOn = Some(planned))
  }
}
