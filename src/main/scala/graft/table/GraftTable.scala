package graft.table

import java.util.concurrent.ThreadLocalRandom

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** A snapshot-versioned parquet table: immutable data files + the
  * `SnapshotLog` metadata log. This is the engine's analog of an Iceberg v2
  * table (SURVEY.md §7.1.3): every mutation — append, copy-on-write DML,
  * schema evolution, compaction — is a new snapshot that references immutable
  * files; reads resolve a snapshot (latest, by id, or by timestamp) to a file
  * list and never see in-flight writers.
  *
  * Layout: parquet part-files under `<dir>/data/` in ONE shared hive layout
  * (partition dirs common to every commit; part-file names are unique per
  * write job, and each commit stages under a temp dir then renames into
  * place), JSON snapshot docs under `<dir>/_graft_log/`. A shared layout is
  * what lets a read spanning many commits be a single partition-discovery-
  * clean parquet scan.
  *
  * Scale design:
  *  - commits are metadata-only for untouched files (append = parent list +
  *    new entries; DML rewrites only files that contain matching rows);
  *  - reads hand Spark the resolved file list under a `basePath`, so
  *    partition values come from directory structure and Catalyst prunes
  *    partitions statically before any file is opened;
  *  - per-file rowCount/size feed maintenance policies (compaction picks
  *    small files without opening them).
  *
  * Schema evolution (SURVEY §7.4.1): each file entry records the snapshot that
  * wrote it (`writtenAt`); a read at snapshot T groups files by write-time
  * schema and replays the evolution ops committed in (writtenAt, T] — so old
  * snapshots read with their *own* schema and evolved reads see renamed /
  * added / widened columns without rewriting data.
  */
class GraftTable(val spark: SparkSession, val tableDir: String) {
  import GraftTable._

  private def conf = spark.sessionState.newHadoopConf()
  private def hfs = SnapshotLog.fs(conf, tableDir)

  def snapshotsList: Seq[Snapshot] = SnapshotLog.load(conf, tableDir)

  def latest: Snapshot = {
    val s = snapshotsList
    require(s.nonEmpty, s"table $tableDir has no snapshots")
    s.last
  }

  def schema: StructType = DataType.fromJson(latest.schemaJson).asInstanceOf[StructType]

  /** Sum of per-file row counts, or None when any file's count is the -1
    * unknown sentinel — summing the sentinel in would silently corrupt the
    * total; a null row count is the honest answer.
    */
  private def knownRowTotal(fs: Seq[FileEntry]): Option[Long] =
    if (fs.exists(_.rowCount < 0)) None else Some(fs.map(_.rowCount).sum)

  /** S8/S9 — the snapshots metadata table as a DataFrame. */
  def snapshots(): DataFrame = {
    import spark.implicits._
    snapshotsList.map(s => (s.snapshotId, s.parentId, new java.sql.Timestamp(s.committedAt),
      s.operation, s.files.size.toLong, knownRowTotal(s.files)))
      .toDF("snapshot_id", "parent_id", "committed_at", "operation", "n_files", "total_rows")
  }

  /** S9 — file-listing metadata table (ref snowflake.sql:364-378). */
  def files(): DataFrame = filesOf(latest)

  /** File listing as of a wall-clock time — the Snowflake
    * `INFORMATION_SCHEMA.ICEBERG_TABLE_FILES(TABLE_NAME => …, AT => ts)`
    * TVF shape (ref snowflake.sql:364-370): the newest snapshot committed
    * at or before `tsMillis`, same resolution rule as `readTimestampAsOf`.
    */
  def filesAsOf(tsMillis: Long): DataFrame = {
    val candidates = snapshotsList.filter(_.committedAt <= tsMillis)
    require(candidates.nonEmpty, s"no snapshot at or before $tsMillis in $tableDir")
    filesOf(candidates.last)
  }

  private def filesOf(snap: Snapshot): DataFrame = {
    import spark.implicits._
    snap.files.map(f => (f.path, f.rowCount, f.sizeBytes, f.writtenAt))
      .toDF("file_path", "row_count", "size_bytes", "written_at_snapshot")
  }

  /** Equality-delete-file listing metadata table (the `.deletes` analog of
    * Iceberg's metadata tables; empty when the table carries no
    * merge-on-read deletes).
    */
  def deleteFiles(): DataFrame = {
    import spark.implicits._
    latest.deletes.map(d => (d.path, d.keyCols.mkString(","), d.rowCount, d.sizeBytes, d.appliedAt))
      .toDF("file_path", "key_cols", "row_count", "size_bytes", "applied_at_snapshot")
  }

  /** Partition-level metadata table (the Iceberg `.partitions` analog):
    * per-partition file and row counts plus total bytes, computed from
    * snapshot METADATA alone — no data file is opened, so it stays O(files)
    * driver work at any data scale. A partition holding any file with an
    * unknown (-1) row count reports a NULL total_rows rather than silently
    * summing the sentinel in.
    */
  def partitions(): DataFrame = {
    import spark.implicits._
    val snap = latest
    snap.files.groupBy(_.partitionValues).toSeq
      .map { case (pv, fs) =>
        val key = snap.partitionCols.map(c => s"$c=${pv.getOrElse(c, "__HIVE_DEFAULT_PARTITION__")}")
          .mkString("/")
        (key, fs.size.toLong, knownRowTotal(fs), fs.map(_.sizeBytes).sum)
      }
      .sortBy(_._1)
      .toDF("partition", "n_files", "total_rows", "total_bytes")
  }

  /** Ref listing (the Iceberg `.refs` analog): tags and branches with the
    * snapshot each points at (a branch row carries its BASE main snapshot).
    */
  def refs(): DataFrame = {
    import spark.implicits._
    val tagRows = tags.toSeq.map { case (n, id) => (n, "tag", id) }
    val branchRows = branches.toSeq.map { case (n, base) => (n, "branch", base) }
    (tagRows ++ branchRows).sortBy(r => (r._2, r._1))
      .toDF("name", "type", "snapshot_id")
  }

  /** Table-properties metadata table (the Iceberg `.properties` analog). */
  def propertiesTable(): DataFrame = {
    import spark.implicits._
    properties.toSeq.sortBy(_._1).toDF("key", "value")
  }

  /** Metadata-log table (the Iceberg `.metadata_log_entries` analog): one
    * row per live document in the snapshot log directory — the physical
    * metadata a debugger or a manifest-consolidation policy reasons about.
    */
  def metadataLogTable(): DataFrame = {
    import spark.implicits._
    val dir = SnapshotLog.logPath(tableDir)
    val fs = hfs
    val rows =
      if (!fs.exists(dir)) Nil
      else {
        val it = fs.listStatus(dir).toSeq
        it.filter(_.isFile).map { st =>
          val name = st.getPath.getName
          val kind =
            if (name.startsWith("manifest-")) "manifest"
            else if (name.startsWith("v") && name.endsWith(".json")) "snapshot"
            else if (name.startsWith("tag-")) "tag"
            else if (name.startsWith("branch-")) "branch"
            else if (name.startsWith("props-")) "properties"
            else "other"
          (name, kind, st.getLen)
        }.sortBy(_._1)
      }
    rows.toDF("file", "kind", "size_bytes")
  }

  /** Every file referenced by ANY live snapshot (the Iceberg `.all_files`
    * analog), with the referencing snapshot — metadata-only, one row per
    * (snapshot, file) reference, so maintenance and debugging can see which
    * commits still pin a file without opening anything.
    */
  def allFiles(): DataFrame = {
    import spark.implicits._
    snapshotsList.flatMap(s => s.files.map(f =>
      (s.snapshotId, f.path, f.rowCount, f.sizeBytes, f.writtenAt)))
      .toDF("snapshot_id", "file_path", "row_count", "size_bytes", "written_at_snapshot")
  }

  /** Commit history metadata table (the Iceberg `.history` analog). */
  def history(): DataFrame = {
    import spark.implicits._
    snapshotsList.map(s => (new java.sql.Timestamp(s.committedAt), s.snapshotId,
      s.parentId, s.operation))
      .toDF("made_current_at", "snapshot_id", "parent_id", "operation")
  }

  def readLatest(): DataFrame = readSnapshot(latest)

  /** T1 — `VERSION AS OF <id>` (ref time_travel_validate.sql:6-12). */
  def readVersionAsOf(snapshotId: Long): DataFrame = {
    val snap = snapshotsList.find(_.snapshotId == snapshotId)
      .getOrElse(throw new IllegalArgumentException(s"no snapshot $snapshotId in $tableDir"))
    readSnapshot(snap)
  }

  /** T2 — timestamp travel: newest snapshot committed at or before `tsMillis`
    * (ref snowflake.sql:359-361 `AT(TIMESTAMP => ...)`).
    */
  def readTimestampAsOf(tsMillis: Long): DataFrame = {
    val candidates = snapshotsList.filter(_.committedAt <= tsMillis)
    require(candidates.nonEmpty, s"no snapshot at or before $tsMillis in $tableDir")
    readSnapshot(candidates.last)
  }

  /** T2b — offset travel: Snowflake `AT(OFFSET => -seconds)` relative to
    * "now" (ref snowflake.sql:359-361). `nowMillis` is caller-supplied so the
    * query is deterministic under a pinned clock.
    */
  def readOffsetAsOf(offsetSeconds: Long, nowMillis: Long): DataFrame = {
    require(offsetSeconds <= 0, s"offset must be a non-positive number of seconds, got $offsetSeconds")
    readTimestampAsOf(nowMillis + offsetSeconds * 1000L)
  }

  /** Resolve a snapshot to a DataFrame: group files by evolution EPOCH (the
    * greatest chain step ≤ `writtenAt`), read each group with its write-time
    * physical schema, replay evolution ops up to the target snapshot, union.
    *
    * Epoch grouping, not per-`writtenAt` grouping, keeps the plan
    * O(evolution commits): physical schema and replay ops are constant
    * between two evolution commits, so a never-evolved table reads as ONE
    * parquet scan no matter how many append commits produced its files
    * (per-commit grouping grew the plan — an N-way union of N scans — with
    * every append).
    */
  def readSnapshot(snap: Snapshot): DataFrame = readSnapshotImpl(snap, None)

  /** Read with each row's originating file path attached as `fileCol`,
    * evaluated AT THE SCAN — `input_file_name()` over the result would be
    * ambiguous once merge-on-read deletes add their own file sources to the
    * plan (Spark rejects multi-source `input_file_name`), so DML planning
    * uses this instead.
    */
  private[graft] def readSnapshotTagged(snap: Snapshot, fileCol: String): DataFrame =
    readSnapshotImpl(snap, Some(fileCol), None)

  /** Tagged read that ALSO attaches each row's position within its part file
    * (parquet `_metadata.row_index`, captured at the scan) — the planning
    * read for positional merge-on-read DML: `fileCol` names the file,
    * `posCol` the row inside it, together a stable row address (files are
    * immutable). Existing deletes are reconciled first, so already-deleted
    * rows can never be re-addressed.
    */
  private[graft] def readSnapshotTagged(snap: Snapshot, fileCol: String,
      posCol: String): DataFrame =
    readSnapshotImpl(snap, Some(fileCol), Some(posCol))

  private def readSnapshotImpl(snap: Snapshot, fileCol: Option[String],
      posCol: Option[String] = None): DataFrame = {
    val logical = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    if (snap.files.isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], logical)
      val withF = fileCol.fold(empty)(c => empty.withColumn(c, lit(null).cast("string")))
      return posCol.fold(withF)(c => withF.withColumn(c, lit(null).cast("long")))
    }
    // Self-contained-format guard: every live writtenAt must have its
    // write-time schema in the snapshot's own schemas map. A doc written by
    // the pre-self-contained format deserializes with schemas/chain empty and
    // would silently read evolved columns as all-NULL — fail loudly instead.
    val missingSchemas = snap.files.map(_.writtenAt.toString).toSet -- snap.schemas.keySet
    require(missingSchemas.isEmpty,
      s"snapshot ${snap.snapshotId} in $tableDir predates the self-contained snapshot " +
        s"format (no write-time schema recorded for commit(s) ${missingSchemas.mkString(", ")}); " +
        "rewrite the table with this version before reading")
    val dataRoot = SnapshotLog.dataPath(tableDir).toString
    val chainIds = snap.chain.map(_.snapshotId).sorted
    def epochOf(writtenAt: Long): Long =
      chainIds.foldLeft(0L)((e, id) => if (id <= writtenAt) id else e)
    // Merge-on-read deletes need each row's file `writtenAt` (a delete
    // applies iff writtenAt < appliedAt). The filename→writtenAt map rides a
    // broadcast join keyed on the part-file NAME (globally unique — Spark
    // part names embed the write job's uuid; verified below), which
    // sidesteps URI-escaping mismatches between `input_file_name()` and
    // filesystem-qualified paths. Zero cost when no deletes exist.
    val needWrittenAt = snap.deletes.nonEmpty
    // row positions ride the scan when a caller asks for them (positional
    // DML planning) or when positional delete vectors must reconcile
    val posName = posCol.getOrElse(PosCol)
    val needPos = posCol.isDefined || snap.deletes.exists(_.positional)
    if (needWrittenAt) {
      val names = snap.files.map(_.path.split('/').last)
      require(names.distinct.size == names.size,
        s"snapshot ${snap.snapshotId} in $tableDir has colliding part-file names; " +
          "cannot resolve merge-on-read delete applicability")
    }
    // Schema json joins the key as a guard: same-epoch files must agree on
    // their physical schema to share a scan.
    val groups = snap.files.groupBy(f =>
      (epochOf(f.writtenAt), snap.schemas(f.writtenAt.toString)))
    val parts = groups.toSeq.sortBy(_._1).map { case ((epoch, schemaJson), entries) =>
      val physSchema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
      val paths = entries.map(e => s"$dataRoot/${e.path}")
      val raw0 = spark.read
        .option("basePath", dataRoot)
        .schema(physSchema)
        .parquet(paths: _*)
      val raw1 = fileCol.fold(raw0)(c => raw0.withColumn(c, input_file_name()))
      val raw2 = if (needWrittenAt)
        raw1.withColumn(WrittenAtCol,
          element_at(split(input_file_name(), "/"), -1))
      else raw1
      // captured AT the scan: after a union/evolution the metadata column is
      // no longer addressable, and the index is only meaningful per file
      val raw = if (needPos)
        raw2.withColumn(posName, col("_metadata.row_index"))
      else raw2
      // Replay evolution committed after this epoch — from the snapshot's own
      // carried chain, never other (expirable) docs. No chain step lies in
      // (epoch, writtenAt] by the definition of epoch, so filtering from the
      // epoch boundary is exact for every file in the group.
      val ops = snap.chain
        .filter(st => st.snapshotId > epoch && st.snapshotId <= snap.snapshotId)
        .flatMap(_.ops)
      ops.foldLeft(raw)(applyEvolution)
    }
    val unified = parts.reduce(_.unionByName(_))
    val live = if (needWrittenAt) applyDeletes(snap, unified, posName) else unified
    // Present columns in the target snapshot's declared order.
    live.select((logical.fieldNames.toSeq ++ fileCol ++ posCol).map(col): _*)
  }

  /** Filter out rows matched by the snapshot's equality-delete files (the
    * Iceberg v2 merge-on-read read path). Each group of delete files sharing
    * a key-column set becomes ONE anti-join; the delete side is tiny relative
    * to data (bounded by un-materialized delete commits), so Catalyst
    * broadcasts it and the data side neither shuffles nor rewrites.
    *
    * Matching is null-safe (`<=>`) per key column — a null key value in a
    * delete tuple deletes rows with null in that column, the Iceberg
    * equality-delete semantic — plus the `writtenAt < appliedAt` applicability
    * bound, so rows (re-)inserted at or after the delete commit survive.
    *
    * Key-column names are DELETE-TIME names: a rename committed after the
    * delete is mapped forward through the evolution chain; the data-side
    * column (already evolved by replay) is compared against the delete tuple
    * cast to its current type (type widening).
    */
  private def applyDeletes(snap: Snapshot, data: DataFrame,
      posName: String = GraftTable.PosCol): DataFrame = {
    val logical = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val dvRoot = SnapshotLog.dataPath(tableDir).toString
    val (dvs, eqs) = snap.deletes.partition(_.positional)
    // Positional delete vectors: ONE anti-join on (part-file name, row
    // position) for ALL vectors. No applicability bound and no key
    // resolution: a position addresses one immutable file's row forever, a
    // row (re-)inserted after the delete lives in a file no vector can
    // reference, and renames/widenings never touch a position. Vector rows
    // naming files this snapshot no longer has simply match nothing.
    // DV size is O(deleted rows) and UNBOUNDED — a single fat MOR DELETE at
    // the 100 TB scale this path targets can dwarf executor memory — so the
    // broadcast is forced only while the recorded vector bytes stay under a
    // threshold; past it the anti-join shuffles (Catalyst/AQE still free to
    // broadcast if runtime stats say the side is small after all).
    val afterDv = if (dvs.isEmpty) data else {
      val dvDf = dvs.map(d => spark.read.parquet(s"$dvRoot/${d.path}")
          .select(col(WrittenAtCol), col(GraftTable.PosCol)))
        .reduce(_.unionByName(_))
      val dvBytes = dvs.map(_.sizeBytes.max(0L)).sum
      val dvSide =
        if (dvBytes <= GraftTable.DvBroadcastMaxBytes) broadcast(dvDf) else dvDf
      data.alias("_gf_data").join(dvSide.alias("_gf_dv"),
        col(s"_gf_data.$WrittenAtCol") === col(s"_gf_dv.$WrittenAtCol") &&
          col(s"_gf_data.$posName") === col(s"_gf_dv.${GraftTable.PosCol}"),
        "left_anti")
    }
    if (eqs.isEmpty) return afterDv
    val writtenAtByName = snap.files
      .map(f => (f.path.split('/').last, f.writtenAt)).toMap
    // filename → writtenAt via a small literal map; O(files-in-snapshot)
    // entries but evaluated per-row without a join. For very large file
    // counts a broadcast-join map would win; at the 800k-file design point a
    // map literal in the plan is too big, so: broadcast join below.
    import spark.implicits._
    val fileMap = writtenAtByName.toSeq.toDF(WrittenAtCol, "_gf_written_at")
    val withW = afterDv
      .join(broadcast(fileMap), Seq(WrittenAtCol), "left")
      // a filename that fails to resolve would silently mis-apply deletes;
      // fail loudly instead (cannot happen unless the layout contract broke)
      .withColumn("_gf_written_at",
        when(col("_gf_written_at").isNull,
          raise_error(concat(lit("cannot resolve writtenAt for data file "),
            col(WrittenAtCol))).cast("long"))
          .otherwise(col("_gf_written_at")))
    val dataRoot = SnapshotLog.dataPath(tableDir).toString
    val byKeys = eqs.groupBy(_.keyCols)
    val filtered = byKeys.toSeq.sortBy(_._1.mkString(","))
      .foldLeft(withW) { case (df, (keyCols, entries)) =>
        val delSide = entries.map { d =>
          val raw = spark.read.parquet(s"$dataRoot/${d.path}")
          // consolidated files carry each tuple's own bound; plain files
          // apply their commit's bound to every tuple
          if (d.perRowAppliedAt) raw
          else raw.withColumn("_gf_applied_at", lit(d.appliedAt))
        }.reduce(_.unionByName(_))
        // Map each delete-time key name forward through renames committed
        // after the delete, per entry (two deletes sharing key NAMES can
        // still resolve differently when a rename landed between their
        // commits), and cast the delete tuple to the column's current type.
        val resolvedByEntry = entries.map(d =>
          d.appliedAt -> keyCols.map(k => GraftTable.currentName(snap, k, d.appliedAt)))
        def antiJoin(data: DataFrame, del: DataFrame,
            delToCur: Seq[(String, String)]): DataFrame = {
          val cond = delToCur.map { case (delName, curName) =>
            val curType = logical.find(_.name == curName).map(_.dataType)
              .getOrElse(throw new IllegalStateException(
                s"delete key column $curName no longer in schema of $tableDir"))
            col(s"_gf_data.$curName") <=> col(s"_gf_del.$delName").cast(curType)
          }.reduce(_ && _) &&
            (col("_gf_data._gf_written_at") < col("_gf_del._gf_applied_at"))
          data.alias("_gf_data").join(del.alias("_gf_del"), cond, "left_anti")
        }
        // all entries in the group must resolve identically to share a join
        val distinctRes = resolvedByEntry.map(_._2).distinct
        if (distinctRes.size == 1)
          antiJoin(df, delSide, keyCols.zip(distinctRes.head))
        else
          // renames diverged between delete commits in this group: apply each
          // entry as its own anti-join (rare; correctness over plan width)
          entries.foldLeft(df) { (acc, d) =>
            val raw = spark.read.parquet(s"$dataRoot/${d.path}")
            val one = if (d.perRowAppliedAt) raw
              else raw.withColumn("_gf_applied_at", lit(d.appliedAt))
            antiJoin(acc, one,
              keyCols.map(k => k -> GraftTable.currentName(snap, k, d.appliedAt)))
          }
      }
    filtered.drop(WrittenAtCol, "_gf_written_at")
  }

  /** Evolution-aware read of a subset of the latest snapshot's files
    * (copy-on-write DML reads only the files it will rewrite).
    */
  def readFiles(entries: Seq[FileEntry]): DataFrame = readFiles(entries, latest)

  /** Read `entries` in the schema/evolution context of `asOf`. DML and
    * maintenance MUST pass the snapshot they PLANNED against: re-resolving
    * `latest` here would race a concurrent rewrite — the winner's snapshot
    * no longer carries the write-time schemas of files it replaced, so the
    * loser's read of its planned (now-replaced) files fails spuriously (or,
    * after a concurrent evolution, silently replays the wrong ops) instead
    * of reaching the commit-time conflict abort.
    */
  def readFiles(entries: Seq[FileEntry], asOf: Snapshot): DataFrame =
    readSnapshot(asOf.copy(files = entries.toList))

  /** Metadata-level partition pruning (the manifest-pruning role in Iceberg):
    * resolve the file list against equality predicates on partition columns
    * BEFORE Spark sees any path. Catalyst would prune these partitions too,
    * but only after listing and planning over every file — at 100 TB with
    * ~800k files, skipping them in the snapshot metadata keeps scan planning
    * O(selected partitions).
    */
  def readPartitions(partitionEquals: Map[String, String]): DataFrame = {
    val snap = latest
    val unknown = partitionEquals.keySet -- snap.partitionCols.toSet
    require(unknown.isEmpty, s"not partition columns: ${unknown.mkString(", ")}")
    val selected = snap.files.filter(f =>
      partitionEquals.forall { case (k, v) => f.partitionValues.get(k).contains(v) })
    readSnapshot(snap.copy(files = selected))
  }

  /** Stats-based file pruning (the Iceberg manifest `lower_bounds`/
    * `upper_bounds` scan-planning step): files whose recorded `[min, max]` for
    * `colName` falls entirely outside `[lo, hi]` are dropped from the scan
    * BEFORE Spark sees any path. Returns (selected, total) so callers can
    * observe skipping. Either bound may be null (one-sided range).
    *
    * Sound by construction — a file is only skipped on bounds that prove no
    * row matches:
    *  - `FileEntry.stats` keys are WRITE-TIME physical names, so the current
    *    column name is resolved per evolution epoch back to the name it had
    *    when each file was written (the role Iceberg's stable field ids play).
    *    A column ADDED after a file was written resolves to no name at all —
    *    stats that happen to sit under the same string (a renamed-away column
    *    re-using the name) describe a DIFFERENT column's data and are never
    *    consulted.
    *  - Non-finite float/double bounds compare by IEEE order (`Infinity`
    *    prunes nothing it shouldn't); a `NaN` or unparseable bound keeps the
    *    file.
    *  - Files with no usable stats (old format, all-null file, column widened
    *    to string) are always kept.
    *  - PARTITION columns prune too: the hive layout strips them from data
    *    files (no footer stats), but each file's partition value is an exact
    *    point `[v, v]` in the snapshot metadata. A null-partition or
    *    unparseable value keeps the file — and dropping a null-partition
    *    file would be sound anyway, since a range predicate never matches
    *    null rows and every caller re-applies the exact predicate.
    */
  def planBetween(snap: Snapshot, colName: String, lo: Any, hi: Any)
      : (Seq[FileEntry], Int) = {
    import org.apache.spark.sql.types._
    val dt = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
      .find(_.name == colName)
      .getOrElse(throw new IllegalArgumentException(s"no column $colName"))
      .dataType
    val prunable = dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
           StringType | TimestampType | TimestampNTZType | DateType => true
      case _ => false // decimal/binary/nested orderings are engine-specific
    }
    if (!prunable) return (snap.files, snap.files.size)
    val floating = dt == FloatType || dt == DoubleType
    // None = incomparable (unparseable or NaN bound) → treated as "keep".
    def cmp(fileStat: String, queryBound: String): Option[Int] =
      if (dt == StringType) Some(fileStat.compareTo(queryBound))
      else if (floating) scala.util.Try {
        val a = java.lang.Double.parseDouble(fileStat) // "Infinity"/"NaN" parse fine
        val b = java.lang.Double.parseDouble(queryBound)
        if (a.isNaN || b.isNaN) None else Some(java.lang.Double.compare(a, b))
      }.toOption.flatten
      else scala.util.Try(
        new java.math.BigDecimal(fileStat).compareTo(new java.math.BigDecimal(queryBound))
      ).toOption
    val loS = Option(lo).map(v => GraftTable.toPhysicalBound(dt, v))
    val hiS = Option(hi).map(v => GraftTable.toPhysicalBound(dt, v))
    // Resolve the current name back to each epoch's write-time physical name
    // (files between two evolution commits share one resolution).
    val chainIds = snap.chain.map(_.snapshotId).sorted
    def epochOf(writtenAt: Long): Long =
      chainIds.foldLeft(0L)((e, id) => if (id <= writtenAt) id else e)
    val nameAt: Map[Long, Option[String]] =
      snap.files.map(f => epochOf(f.writtenAt)).distinct
        .map(e => e -> GraftTable.writeTimeName(snap, colName, e, dt)).toMap
    // A partition value is a single point in the column's domain; hive
    // values with escape sequences (or non-literal sentinels) don't parse
    // and conservatively keep the file.
    def partPoint(f: FileEntry, phys: String): Option[String] =
      f.partitionValues.get(phys).filterNot(_.contains('%'))
        .flatMap(v => scala.util.Try(GraftTable.toPhysicalBound(dt, v)).toOption)
    // Transform-partition pruning (the Iceberg partition-transform scan
    // planning): when the queried column is the SOURCE of a recorded
    // transform, each file's transform partition value constrains its rows —
    // time granularities bound them to [start, next) in physical micros /
    // epoch-days, truncate(N) prefixes bound strings to [prefix, next), and
    // bucket(N) pins a POINT predicate's file set to the value's hash
    // bucket (the min/max-proof lookup case: a hash-scattered key has
    // near-useless footer bounds, but exactly one bucket). Whole files drop
    // without a footer consult. Time derivation is UTC-pinned at write
    // (`transformColumn`), so instant-domain comparison is sound under ANY
    // read session timezone. Anything unparseable keeps the file.
    val transformsOnCol: Seq[GraftTable.TransformDef] =
      GraftTable.parseTransforms(scala.util.Try(properties).getOrElse(Map.empty))
    // [start, end] overlap test against the query range, physical domain
    def overlaps(min: Long, max: Long): Boolean =
      loS.forall(l => cmp(max.toString, l).forall(_ >= 0)) &&
        hiS.forall(h => cmp(min.toString, h).forall(_ <= 0))
    val isPoint = loS.isDefined && loS == hiS
    def keepFor(td: GraftTable.TransformDef, v: String): Boolean = td.fn match {
      case "days" | "months" | "years" =>
        scala.util.Try(java.time.LocalDate.parse(v)).toOption.forall { d =>
          val end = td.fn match {
            case "days" => d.plusDays(1)
            case "months" => d.plusMonths(1)
            case _ => d.plusYears(1)
          }
          dt match {
            case DateType => overlaps(d.toEpochDay, end.toEpochDay - 1)
            case TimestampType | TimestampNTZType =>
              overlaps(d.toEpochDay * 86400000000L, end.toEpochDay * 86400000000L - 1)
            case _ => true
          }
        }
      case "hours" =>
        scala.util.Try(v.toLong).toOption.forall { h =>
          dt match {
            case TimestampType | TimestampNTZType =>
              overlaps(h * 3600000000L, (h + 1) * 3600000000L - 1)
            case _ => true
          }
        }
      case "bucket" if isPoint =>
        (for (n <- td.arg; b <- GraftTable.bucketOf(dt, lo, n))
          yield v == b.toString).getOrElse(true)
      case "truncate" if dt == StringType =>
        // rows in this file all carry prefix v: their domain is [v, next)
        hiS.forall(h => cmp(v, h).forall(_ <= 0)) &&
          GraftTable.nextPrefix(v).forall(np =>
            loS.forall(l => cmp(np, l).forall(_ > 0)))
      case "truncate"
          if dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType =>
        // integral truncate: value v bounds rows to [v, v + W)
        (for (w <- td.arg; base <- scala.util.Try(v.toLong).toOption)
          yield overlaps(base, base + w - 1)).getOrElse(true)
      case _ => true
    }
    def transformKeep(f: FileEntry, phys: String): Boolean =
      transformsOnCol.filter(_.src == phys).forall { td =>
        f.partitionValues.get(td.pc) match {
          case Some("__HIVE_DEFAULT_PARTITION__") =>
            false // null-source rows never match a range predicate
          case Some(v) if !v.contains('%') => keepFor(td, v)
          case _ => true // absent or hive-escaped: keep
        }
      }
    val selected = snap.files.filter { f =>
      // a provably empty file (pre-empty-skip commits) matches nothing
      if (f.rowCount == 0L) false
      else nameAt(epochOf(f.writtenAt)) match {
        case None => true
        case Some(phys) =>
          val partKeep = partPoint(f, phys).forall(v =>
            loS.forall(l => cmp(v, l).forall(_ >= 0)) &&
              hiS.forall(h => cmp(v, h).forall(_ <= 0)))
          val statsKeep = f.stats.get(phys) match {
            // a range predicate never matches null rows, so a provably
            // all-null file holds nothing in [lo, hi]
            case Some(entry) if GraftTable.StatEntry.allNull(entry, f.rowCount) => false
            case Some(entry) => GraftTable.StatEntry.bounds(entry) match {
              case Some((mn, mx)) =>
                loS.forall(l => cmp(mx, l).forall(_ >= 0)) &&
                  hiS.forall(h => cmp(mn, h).forall(_ <= 0))
              case None => true
            }
            case None => true
          }
          partKeep && statsKeep && transformKeep(f, phys)
      }
    }
    (selected, snap.files.size)
  }

  /** Metadata-only `COUNT(*)` (the Iceberg aggregate-pushdown analog): the
    * snapshot's per-file row counts sum to the exact table count without
    * opening any data file — at 100 TB the difference between a full scan
    * and O(files) driver arithmetic. None when metadata cannot answer
    * exactly: a pending merge-on-read delete removes rows no file entry
    * accounts for, and an unknown per-file count (-1) leaves the sum
    * undefined — callers fall back to a scan.
    */
  def countRowsFromMetadata(snap: Snapshot): Option[Long] =
    if (snap.deletes.nonEmpty || snap.files.exists(_.rowCount < 0)) None
    else Some(snap.files.map(_.rowCount).sum)

  def countRowsFromMetadata(): Option[Long] = countRowsFromMetadata(latest)

  /** Metadata-only `MIN(col)`/`MAX(col)` from the per-file footer bounds.
    * Exact — not approximate — when every file answers for itself:
    *  - every live file resolves `colName` through the evolution chain to a
    *    write-time column with recorded stats (a file written before the
    *    column existed, or with an all-null/statless column, yields None);
    *  - the column is numeric, date, or timestamp: parquet footer bounds for
    *    those are exact extremes of the non-null values, matching SQL
    *    MIN/MAX null-skipping semantics. Strings are excluded — writers may
    *    TRUNCATE binary bounds, which widens them past the true extremes;
    *  - no merge-on-read delete is pending (a delete could remove the
    *    extreme row without touching file metadata);
    *  - no NaN poisoning (parquet drops stats on NaN-containing chunks, so
    *    surviving float bounds are comparable).
    * Returns values in the column's LOGICAL type (timestamp/date bounds are
    * stored as raw micros/epoch-days and converted back). None = scan.
    */
  def minMaxFromMetadata(colName: String, snapArg: Option[Snapshot] = None)
      : Option[(Any, Any)] = {
    import org.apache.spark.sql.types._
    val snap = snapArg.getOrElse(latest)
    if (snap.deletes.nonEmpty || snap.files.isEmpty) return None
    val dt = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
      .find(_.name == colName)
      .getOrElse(throw new IllegalArgumentException(s"no column $colName"))
      .dataType
    val exact = dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
           TimestampType | TimestampNTZType | DateType => true
      case _ => false // string bounds may be writer-truncated; others untracked
    }
    if (!exact) return None
    // Exact ordering keys: Double for float/double columns (doubles ARE the
    // domain; NaN rejected), BigDecimal otherwise (int64 micros past 2^53
    // must not round through a double).
    val floating = dt == FloatType || dt == DoubleType
    def parseable(s: String): Boolean =
      if (floating) scala.util.Try(java.lang.Double.parseDouble(s))
        .toOption.exists(!_.isNaN)
      else scala.util.Try(new java.math.BigDecimal(s)).isSuccess
    def lt(a: String, b: String): Boolean =
      if (floating) java.lang.Double.parseDouble(a) < java.lang.Double.parseDouble(b)
      else new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b)) < 0
    // Per file: None = unknown (bail to scan); Some(None) = provably
    // all-null, contributes nothing to MIN/MAX (SQL null-skipping
    // semantics); Some(Some(bounds)) = contributes.
    val entries = resolveStats(snap, colName).getOrElse(return None)
    val perFile: Seq[Option[Option[(String, String)]]] =
      snap.files.zip(entries).map { case (f, entryOpt) =>
        if (f.rowCount == 0L) Some(None) // empty file: contributes nothing
        else entryOpt match {
          case Some(entry) if GraftTable.StatEntry.allNull(entry, f.rowCount) => Some(None)
          case Some(entry) => GraftTable.StatEntry.bounds(entry) match {
            case Some((mn, mx)) if parseable(mn) && parseable(mx) => Some(Some((mn, mx)))
            case _ => None
          }
          case None => None
        }
      }
    if (perFile.exists(_.isEmpty)) return None
    val bounds = perFile.flatten.flatten
    if (bounds.isEmpty) return None // every row null: scan answers MIN=MAX=NULL
    val mn = bounds.map(_._1).reduce((a, b) => if (lt(a, b)) a else b)
    val mx = bounds.map(_._2).reduce((a, b) => if (lt(a, b)) b else a)
    Some((GraftTable.fromPhysicalBound(dt, mn), GraftTable.fromPhysicalBound(dt, mx)))
  }

  /** Metadata-only `COUNT(col)` (non-null count — the second half of
    * aggregate pushdown): per-file `rowCount - nullCount` sums exactly when
    * every live file resolves the column and reports a null count, no MOR
    * delete is pending, and no file predates the column (its rows hold the
    * evolution default, which this method will not guess about). None =
    * scan.
    */
  def countNonNullFromMetadata(colName: String, snapArg: Option[Snapshot] = None)
      : Option[Long] = {
    val snap = snapArg.getOrElse(latest)
    if (snap.deletes.nonEmpty || snap.files.isEmpty) return None
    resolveStats(snap, colName) match {
      case None => None
      case Some(perFile) =>
        val counts = snap.files.zip(perFile).map { case (f, entry) =>
          if (f.rowCount == 0) Some(0L) // empty file: zero non-null rows
          else if (f.rowCount < 0) None
          else entry.flatMap(GraftTable.StatEntry.nullCount).map(f.rowCount - _)
        }
        if (counts.exists(_.isEmpty)) None else Some(counts.flatten.sum)
    }
  }

  /** Nullability-based file pruning (the Iceberg `null_value_counts` scan
    * planning): for `IS NULL`, a file whose recorded null count is zero
    * cannot match; for `IS NOT NULL`, a provably all-null file cannot.
    * Unknown counts, unresolvable columns, and files written before the
    * column existed are always kept. Returns (selected, total).
    */
  def planNullability(snap: Snapshot, colName: String, isNull: Boolean)
      : (Seq[FileEntry], Int) = {
    val total = snap.files.size
    resolveStats(snap, colName) match {
      case None => (snap.files, total)
      case Some(perFile) =>
        val selected = snap.files.zip(perFile).filter { case (f, entry) =>
          entry match {
            case None => true // no stats: keep
            case Some(e) =>
              val nc = GraftTable.StatEntry.nullCount(e)
              if (isNull) !nc.contains(0L)
              else !GraftTable.StatEntry.allNull(e, f.rowCount)
          }
        }.map(_._1)
        (selected, total)
    }
  }

  /** Read rows where `colName` IS NULL / IS NOT NULL through null-count
    * pruning, with the exact residual predicate over the surviving files.
    */
  def readWhereNull(colName: String, isNull: Boolean): DataFrame = {
    val snap = latest
    val (selected, _) = planNullability(snap, colName, isNull)
    val base = readSnapshot(snap.copy(files = selected.toList))
    base.filter(if (isNull) col(colName).isNull else col(colName).isNotNull)
  }

  /** Resolve each live file's stats entry for `colName` through the
    * evolution chain: None when the snapshot has files whose write-time name
    * cannot be traced (column added later — stats under the same string
    * would describe a different column); otherwise one Option[entry] per
    * file, aligned with `snap.files`.
    *
    * A PARTITION column (hive layout strips it from data files, so no
    * footer stats exist) synthesizes an exact entry from the file's
    * partition value: the default-partition sentinel means every row is
    * null (`[rowCount]`), any other parseable value is the exact point
    * `[v, v, 0]` — so metadata MIN/MAX, COUNT(col), and nullability all
    * answer for partition columns too.
    *
    * A None ELEMENT (file resolves but has no recorded stats for the
    * column) is per-file "unknown" — callers must stay conservative for
    * that file.
    */
  private def resolveStats(snap: Snapshot, colName: String)
      : Option[Seq[Option[List[String]]]] = {
    import org.apache.spark.sql.types._
    val dt = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
      .find(_.name == colName)
      .getOrElse(throw new IllegalArgumentException(s"no column $colName"))
      .dataType
    val chainIds = snap.chain.map(_.snapshotId).sorted
    def epochOf(writtenAt: Long): Long =
      chainIds.foldLeft(0L)((e, id) => if (id <= writtenAt) id else e)
    val nameAt: Map[Long, Option[String]] =
      snap.files.map(f => epochOf(f.writtenAt)).distinct
        .map(e => e -> GraftTable.writeTimeName(snap, colName, e, dt)).toMap
    def partitionEntry(f: FileEntry, phys: String): Option[List[String]] =
      f.partitionValues.get(phys).flatMap {
        case "__HIVE_DEFAULT_PARTITION__" =>
          if (f.rowCount >= 0) Some(List(f.rowCount.toString)) else None
        case v if !v.contains('%') => // hive-escaped values don't round-trip
          scala.util.Try(GraftTable.toPhysicalBound(dt, v)).toOption
            .map(p => List(p, p, "0"))
        case _ => None
      }
    if (snap.files.exists(f => nameAt(epochOf(f.writtenAt)).isEmpty)) None
    else Some(snap.files.map(f =>
      nameAt(epochOf(f.writtenAt)).flatMap(phys =>
        f.stats.get(phys).orElse(partitionEntry(f, phys)))))
  }

  /** Read rows with `colName` in `[lo, hi]` through stats pruning: the file
    * list shrinks to possibly-matching files, then the exact predicate runs as
    * a normal pushed-down filter over the survivors (file bounds are not
    * exact, so the residual filter is required for correctness). Pass null for
    * an open bound.
    */
  def readBetween(colName: String, lo: Any, hi: Any): DataFrame = {
    val snap = latest
    val (selected, _) = planBetween(snap, colName, lo, hi)
    val base = readSnapshot(snap.copy(files = selected.toList))
    val c = col(colName)
    (Option(lo), Option(hi)) match {
      case (Some(l), Some(h)) => base.filter(c >= lit(l) && c <= lit(h))
      case (Some(l), None)    => base.filter(c >= lit(l))
      case (None, Some(h))    => base.filter(c <= lit(h))
      case _                  => base
    }
  }

  /** Per-value point planning for IN-list lookups: the union of each
    * value's `planBetween` point pass. Far tighter than one [min, max]
    * envelope when the keys are sparse over a clustered table — and the
    * composition point where bucket-transform pruning bites (each point
    * keeps only its own hash bucket's files; the reference's flagship
    * lookup workload runs against `bucket(16, user_id)` partitioning,
    * `blob_dfs/blob-dfs_bench.py:72,132-136`). Returns (selected, total).
    */
  def planPoints(snap: Snapshot, colName: String, values: Seq[Any])
      : (Seq[FileEntry], Int) = {
    val keep = values.map(v => planBetween(snap, colName, v, v)._1.map(_.path).toSet)
      .foldLeft(Set.empty[String])(_ ++ _)
    (snap.files.filter(f => keep.contains(f.path)), snap.files.size)
  }

  /** Read rows where `colName` is one of `values` through per-point file
    * pruning (stats, partition values, bucket transform), with the exact
    * IN predicate over the surviving files.
    */
  def readIn(colName: String, values: Seq[Any]): DataFrame = {
    val snap = latest
    val (selected, _) = planPoints(snap, colName, values)
    readSnapshot(snap.copy(files = selected.toList))
      .filter(col(colName).isin(values: _*))
  }

  /** Incremental append scan (the Iceberg incremental-read analog:
    * `option("start-snapshot-id", …).option("end-snapshot-id", …)`): rows
    * APPENDED in snapshots (fromId, toId], read with toId's schema. The CDC
    * consumption primitive — a downstream pipeline processes each new batch
    * without rescanning the table.
    *
    * Content-preserving commits inside the range (compaction, manifest
    * rewrite, schema/partition evolution, delete materialization) are
    * skipped — their net content change is nil, and the rows they rewrote
    * are credited to their ORIGINAL append. Any content-CHANGING non-append
    * commit in range (DML, MOR delete/upsert, overwrite, rollback) raises:
    * an append-only incremental read over it would silently misreport the
    * delta (Iceberg's incremental scan raises the same way).
    */
  def readIncremental(fromId: Long, toId: Long): DataFrame = {
    val (to, range) = changeRange(fromId, toId)
    val bad = range.filterNot(s =>
      RowAddingOps(s.operation) || contentPreserving(s.operation))
    require(bad.isEmpty,
      s"incremental read over ($fromId, $toId] crosses content-changing commit(s) " +
        bad.map(s => s"${s.snapshotId}:${s.operation}").mkString(", ") +
        s" in $tableDir — append-only incremental semantics cannot represent them")
    val appendIds = range.filter(s => RowAddingOps(s.operation)).map(_.snapshotId).toSet
    // the appended files, from each appending snapshot's own doc (a later
    // in-range compaction may have dropped them from toId's list — they
    // remain on disk and in their commit's doc until expiry)
    val appended = range.filter(s => appendIds(s.snapshotId))
      .flatMap(s => s.files.filter(_.writtenAt == s.snapshotId))
    // flatMap, not apply: a zero-file append (e.g. a streaming batch whose
    // rows were all rejected upstream) records no write schema for its own
    // id — and contributes no files to read under one either
    val schemas = range.filter(s => appendIds(s.snapshotId))
      .flatMap(s => s.schemas.get(s.snapshotId.toString)
        .map(s.snapshotId.toString -> _)).toMap
    // deletes cannot apply: in-range MOR commits raise above, and any delete
    // with appliedAt ≤ fromId only touches files written before it
    readSnapshot(to.copy(files = appended.toList, schemas = schemas, deletes = Nil))
  }

  /** Commits that only ADD rows (their files carry writtenAt == own id) —
    * the insert-producing class for incremental/changelog reads. A zero-copy
    * import is an insert like any append.
    */
  private val RowAddingOps = Set("append", "add-files")

  /** Commits whose net content change is nil — skippable by incremental and
    * changelog reads (rewritten rows are credited to their original commit).
    */
  private val ContentPreservingOps = Set("create", "rewrite-data-files",
    "materialize-deletes", "zorder-rewrite", "sort-rewrite",
    "add-column", "rename-column", "widen-column", "evolve-partitioning")
  private def contentPreserving = ContentPreservingOps

  /** Resolve and validate a change-consumption range: `toId` exists,
    * `fromId` exists (or 0 for "since the beginning"), and the live
    * snapshots in (fromId, toId] form an UNBROKEN parent chain — tag-aware
    * expiry can leave the log non-contiguous, and a gapped range would
    * silently omit the expired commits' changes.
    */
  private def changeRange(fromId: Long, toId: Long): (Snapshot, Seq[Snapshot]) = {
    val snaps = snapshotsList
    require(fromId < toId, s"need fromId < toId, got ($fromId, $toId]")
    val to = snaps.find(_.snapshotId == toId)
      .getOrElse(throw new IllegalArgumentException(s"no snapshot $toId in $tableDir"))
    require(fromId == 0 || snaps.exists(_.snapshotId == fromId),
      s"no snapshot $fromId in $tableDir (expired?)")
    val range = snaps.filter(s => s.snapshotId > fromId && s.snapshotId <= toId)
    val ids = range.map(_.snapshotId).toSet
    range.foreach { s =>
      val chained = s.parentId match {
        case None => fromId == 0
        case Some(p) => p == fromId || ids.contains(p)
      }
      require(chained,
        s"snapshot ${s.snapshotId}'s parent ${s.parentId.getOrElse("none")} is not " +
          s"live in ($fromId, $toId] of $tableDir — intermediate commits were " +
          "expired and their changes cannot be reconstructed")
    }
    (to, range)
  }

  /** Row-level changelog over (fromId, toId] (the Iceberg changelog-scan /
    * Delta CDF analog): every row appended or deleted in the range, in the
    * TARGET snapshot's schema, with `_change_type` ('insert' | 'delete') and
    * `_commit_snapshot_id` columns. An upsert appears as its delete half
    * (matched pre-images, read from the pre-commit state) plus its insert
    * half — the Iceberg changelog convention.
    *
    * Supported commits in range: appends (inserts), merge-on-read
    * delete/upsert (deletes reconstructed by semi-joining the pre-commit
    * state against the commit's delete files — O(delete batch) extra read,
    * which is why MOR makes CDC cheap), and content-preserving maintenance
    * (no rows). Copy-on-write DML and overwrites raise: their row diff is
    * not recorded and reconstructing it would re-read both sides of every
    * rewritten file.
    */
  def readChangelog(fromId: Long, toId: Long): DataFrame = {
    val (to, range) = changeRange(fromId, toId)
    // update-mor / merge-mor are structurally upsert-mor commits (one
    // equality-delete + append), so changelog reconstruction is identical
    val rowLevel = Set("delete-mor", "upsert-mor", "update-mor", "merge-mor",
      "delete-dv", "update-dv", "merge-dv") ++
      RowAddingOps
    val bad = range.filterNot(s => rowLevel(s.operation) || contentPreserving(s.operation))
    require(bad.isEmpty,
      s"changelog over ($fromId, $toId] crosses commit(s) without row-level change " +
        "tracking: " + bad.map(s => s"${s.snapshotId}:${s.operation}").mkString(", ") +
        s" in $tableDir — copy-on-write rewrites do not record their row diff")
    val logical = DataType.fromJson(to.schemaJson).asInstanceOf[StructType]
    val dataRoot = SnapshotLog.dataPath(tableDir).toString
    val bySnap = snapshotsList.map(s => s.snapshotId -> s).toMap
    // Read `files` evolved to toId's schema: toId's chain replays evolution;
    // write-time schemas come from the carrying snapshot's own
    // self-contained map (never another, possibly-expired doc).
    def readAtTarget(files: List[FileEntry], schemas: Map[String, String],
        deletes: List[DeleteEntry]): DataFrame =
      readSnapshot(to.copy(files = files, schemas = schemas, deletes = deletes))
    val parts = range.filter(s => rowLevel(s.operation)).flatMap { s =>
      val inserts = {
        val added = s.files.filter(_.writtenAt == s.snapshotId)
        if (added.isEmpty) None
        else Some(readAtTarget(added, s.schemas, Nil)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_snapshot_id", lit(s.snapshotId)))
      }
      val deletes = {
        val added = s.deletes.filter(_.appliedAt == s.snapshotId)
        if (added.isEmpty) None
        else {
          // pre-commit state at toId's schema; the commit's deletes apply to
          // every pre-commit file (all writtenAt < appliedAt), so a plain
          // null-safe semi-join on the key tuples yields the deleted rows
          val parent = bySnap(s.parentId.getOrElse(
            throw new IllegalStateException(s"MOR commit ${s.snapshotId} has no parent")))
          val pre = readAtTarget(parent.files, parent.schemas, parent.deletes)
          val (dvAdded, eqAdded) = added.partition(_.positional)
          val eqMatched = eqAdded.map { d =>
            val del = spark.read.parquet(s"$dataRoot/${d.path}")
            val cond = d.keyCols.map { k =>
              val cur = GraftTable.currentName(to, k, d.appliedAt)
              val curType = logical.find(_.name == cur).map(_.dataType)
                .getOrElse(throw new IllegalStateException(
                  s"delete key column $cur no longer in schema of $tableDir"))
              col(s"_gf_pre.$cur") <=> col(s"_gf_del.$k").cast(curType)
            }.reduce(_ && _)
            pre.alias("_gf_pre").join(del.alias("_gf_del"), cond, "left_semi")
          }
          // positional: the vector NAMES the deleted rows — semi-join the
          // file/pos-tagged pre-commit state on the row address
          val dvMatched = if (dvAdded.isEmpty) Nil else {
            val preTagged = readSnapshotTagged(
              to.copy(files = parent.files, schemas = parent.schemas,
                deletes = parent.deletes), "_gf_cl_uri", "_gf_cl_pos")
              .withColumn("_gf_cl_name",
                element_at(split(col("_gf_cl_uri"), "/"), -1))
            val dv = dvAdded.map(d =>
              spark.read.parquet(s"$dataRoot/${d.path}")).reduce(_.unionByName(_))
            Seq(preTagged.alias("_gf_pre").join(dv.alias("_gf_del"),
              col("_gf_pre._gf_cl_name") === col(s"_gf_del.$WrittenAtCol") &&
                col("_gf_pre._gf_cl_pos") === col(s"_gf_del.$PosCol"),
              "left_semi")
              .drop("_gf_cl_uri", "_gf_cl_pos", "_gf_cl_name"))
          }
          val matched = (eqMatched ++ dvMatched).reduce(_.unionByName(_)).distinct()
          Some(matched
            .withColumn("_change_type", lit("delete"))
            .withColumn("_commit_snapshot_id", lit(s.snapshotId)))
        }
      }
      inserts.toSeq ++ deletes.toSeq
    }
    val outCols = logical.fieldNames.toSeq ++ Seq("_change_type", "_commit_snapshot_id")
    if (parts.isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], logical)
      empty.withColumn("_change_type", lit("").cast("string"))
        .withColumn("_commit_snapshot_id", lit(0L))
        .filter(lit(false)).select(outCols.map(col): _*)
    } else parts.reduce(_.unionByName(_)).select(outCols.map(col): _*)
  }

  /** Roll the table back to `snapshotId`'s state as a NEW commit (the
    * Iceberg `rollback_to_snapshot` procedure): history stays linear — the
    * bad commits remain inspectable via time travel until expiry — and
    * concurrent readers just see another snapshot land.
    */
  def rollbackTo(snapshotId: Long): Snapshot = {
    val target = snapshotsList.find(_.snapshotId == snapshotId)
      .getOrElse(throw new IllegalArgumentException(s"no snapshot $snapshotId in $tableDir"))
    commitWithRetry { parent =>
      val p = parent.getOrElse(throw new IllegalStateException("rollback on empty table"))
      Snapshot(p.snapshotId + 1, Some(p.snapshotId), clock(), "rollback",
        target.schemaJson, target.partitionCols, target.files,
        Map("rolled-back-to" -> snapshotId.toString), Nil,
        target.schemas, target.chain, target.deletes)
    }
  }

  /** Create an immutable named tag pinning `snapshotId` (the Iceberg tag
    * ref): `expireSnapshots` retains tagged snapshots regardless of
    * retain-last, so a tag is a durable audit/reproducibility point (e.g.
    * "the snapshot this model trained on"). Create-if-absent: re-tagging an
    * existing name is an error, not a silent move.
    */
  def createTag(name: String, snapshotId: Long): Unit =
    createTag(name, snapshotId, None)

  /** Tag with Iceberg's `RETAIN` clause: past `maxRefAgeMs` from creation
    * the tag is dropped by the next ref-aware expiry, releasing its pinned
    * snapshot — a bounded-lifetime audit point. None = pinned until an
    * explicit drop.
    */
  def createTag(name: String, snapshotId: Long, maxRefAgeMs: Option[Long]): Unit = {
    require(TagNameRe.matches(name),
      s"tag name must match ${TagNameRe.regex}, got '$name'")
    require(snapshotsList.exists(_.snapshotId == snapshotId),
      s"no snapshot $snapshotId in $tableDir")
    maxRefAgeMs.foreach(a => require(a > 0, s"tag RETAIN age must be positive, got $a"))
    val p = new org.apache.hadoop.fs.Path(SnapshotLog.logPath(tableDir), s"tag-$name.json")
    val doc = org.json4s.jackson.Serialization.write(
      Map("name" -> name, "snapshotId" -> snapshotId.toString,
        "createdAt" -> clock().toString) ++
        maxRefAgeMs.map(a => "maxRefAgeMs" -> a.toString))(SnapshotLog.formats)
    require(SnapshotLog.publishAtomicAt(hfs, p, doc), s"tag $name already exists in $tableDir")
  }

  /** Drop every tag whose RETAIN window has passed (the ref-aging step of
    * Iceberg's expire_snapshots); returns the dropped names. Tags without a
    * retention (or from the pre-retention format) never age out.
    */
  def dropExpiredTags(nowMillis: Long): Seq[String] = {
    implicit val fmts: org.json4s.Formats = SnapshotLog.formats
    val dir = SnapshotLog.logPath(tableDir)
    if (!hfs.exists(dir)) return Nil
    hfs.listStatus(dir).map(_.getPath).flatMap { p =>
      p.getName match {
        case TagFileRe(_) =>
          val m = org.json4s.jackson.JsonMethods.parse(
            SnapshotLog.readStringAt(hfs, p)).extract[Map[String, String]]
          for {
            age <- m.get("maxRefAgeMs").map(_.toLong)
            created <- m.get("createdAt").map(_.toLong)
            if created + age < nowMillis
          } yield { hfs.delete(p, false); m("name") }
        case _ => None
      }
    }.toSeq
  }

  /** All tags, name → pinned snapshot id. */
  def tags: Map[String, Long] = {
    implicit val fmts: org.json4s.Formats = SnapshotLog.formats
    val dir = SnapshotLog.logPath(tableDir)
    if (!hfs.exists(dir)) return Map.empty
    hfs.listStatus(dir).map(_.getPath).flatMap { p =>
      p.getName match {
        case TagFileRe(_) =>
          val m = org.json4s.jackson.JsonMethods.parse(
            SnapshotLog.readStringAt(hfs, p)).extract[Map[String, String]]
          Some(m("name") -> m("snapshotId").toLong)
        case _ => None
      }
    }.toMap
  }

  /** Read the snapshot a tag pins. */
  def readTag(name: String): DataFrame = {
    val id = tags.getOrElse(name,
      throw new IllegalArgumentException(s"no tag $name in $tableDir"))
    readVersionAsOf(id)
  }

  /** Drop a tag (the pinned snapshot becomes expirable again). */
  def deleteTag(name: String): Boolean =
    hfs.delete(new org.apache.hadoop.fs.Path(
      SnapshotLog.logPath(tableDir), s"tag-$name.json"), false)

  // ---- Branch refs: write-audit-publish staging (the Iceberg WAP flow) ----

  /** One branch head: the staged snapshot (self-contained, never in the main
    * log) plus the main snapshot it is based on.
    */
  private case class BranchHead(base: Long, seq: Long, snapshot: Snapshot)

  private def branchHead(name: String): Option[BranchHead] = {
    implicit val fmts: org.json4s.Formats = SnapshotLog.formats
    val dir = SnapshotLog.logPath(tableDir)
    if (!hfs.exists(dir)) return None
    val seqs = hfs.listStatus(dir).map(_.getPath.getName).collect {
      case BranchFileRe(n, seq) if n == name => seq.toLong
    }
    if (seqs.isEmpty) return None
    val seq = seqs.max
    val doc = org.json4s.jackson.JsonMethods.parse(SnapshotLog.readStringAt(hfs,
      new org.apache.hadoop.fs.Path(dir, branchFileName(name, seq))))
    val base = (doc \ "base").extract[Long]
    val snap = (doc \ "snapshot").extract[Snapshot]
    Some(BranchHead(base, seq, snap))
  }

  private def branchFileName(name: String, seq: Long) = f"branch-$name-$seq%08d.json"

  private def writeBranchHead(name: String, base: Long, seq: Long, snap: Snapshot): Boolean = {
    implicit val fmts: org.json4s.Formats = SnapshotLog.formats
    val doc = org.json4s.jackson.Serialization.write(Map(
      "base" -> base, "snapshot" -> snap))
    SnapshotLog.publishAtomicAt(hfs,
      new org.apache.hadoop.fs.Path(SnapshotLog.logPath(tableDir),
        branchFileName(name, seq)), doc)
  }

  /** Create a staging branch at the current main state (the start of a
    * write-audit-publish cycle). The branch lives OUTSIDE the main log:
    * main readers never see staged commits.
    */
  def createBranch(name: String): Unit = {
    require(TagNameRe.matches(name),
      s"branch name must match ${TagNameRe.regex}, got '$name'")
    require(branchHead(name).isEmpty, s"branch $name already exists in $tableDir")
    val base = latest
    require(writeBranchHead(name, base.snapshotId, 0L, base),
      s"branch $name already exists in $tableDir")
  }

  /** All branch names with their base main-snapshot ids. */
  def branches: Map[String, Long] = {
    val dir = SnapshotLog.logPath(tableDir)
    if (!hfs.exists(dir)) return Map.empty
    val names = hfs.listStatus(dir).map(_.getPath.getName).collect {
      case BranchFileRe(n, _) => n
    }.distinct
    names.flatMap(n => branchHead(n).map(h => n -> h.base)).toMap
  }

  /** A branch head's summary map (staged-appends counter plus whatever the
    * stager recorded — e.g. a streaming sink's durable batch id).
    */
  def branchSummary(name: String): Map[String, String] =
    branchHead(name).getOrElse(
      throw new IllegalArgumentException(s"no branch $name in $tableDir"))
      .snapshot.summary

  /** Audit read of a branch's staged state. */
  def readBranch(name: String): DataFrame =
    readSnapshot(branchHead(name).getOrElse(
      throw new IllegalArgumentException(s"no branch $name in $tableDir")).snapshot)

  /** Every data/delete file referenced by any live branch head — maintenance
    * must treat staged files as live (they are invisible to the main log).
    */
  private[graft] def branchReferencedPaths: Set[String] =
    branches.keySet.flatMap(n => branchHead(n).toSeq.flatMap(h =>
      h.snapshot.files.map(_.path) ++ h.snapshot.deletes.map(_.path)))

  /** Stage an append on a branch: data files land under `data/` like any
    * commit (immutable, shared layout) but are referenced only by the branch
    * head, so main readers cannot see them until publish. Schema evolution
    * on a branch is not supported — staged files carry the base snapshot's
    * schema, which is what makes publish a metadata-only fast-forward.
    *
    * `precondition` is re-evaluated against the CURRENT branch head inside
    * the CAS retry loop, so a caller's head-dependent guard (e.g. a
    * streaming sink's "skip if this batch id is already staged") is atomic
    * with the head write: two writers racing the same guard cannot both
    * stage — the loser's retry re-reads the head, sees the winner's stamp,
    * and returns false. Returns true iff the append was staged.
    */
  def appendToBranch(name: String, df: DataFrame,
      extraSummary: Map[String, String] = Map.empty,
      precondition: Snapshot => Boolean = _ => true): Boolean = {
    var attempts = 0
    while (attempts < 20) {
      attempts += 1
      val head = branchHead(name).getOrElse(
        throw new IllegalArgumentException(s"no branch $name in $tableDir"))
      if (!precondition(head.snapshot)) return false
      val cur = DataType.fromJson(head.snapshot.schemaJson).asInstanceOf[StructType]
      require(shapeOf(df.schema) == shapeOf(cur),
        s"branch append schema does not match $tableDir@$name")
      // staged files carry writtenAt = the BASE snapshot id: their physical
      // schema IS the base schema (no branch evolution), so main's
      // writtenAt→schema invariant holds verbatim after publish
      val written = writeDataFiles(df, head.base)
      val snap = head.snapshot.copy(
        files = head.snapshot.files ++ written.map(_.copy(writtenAt = head.base)),
        schemas = head.snapshot.schemas +
          (head.base.toString -> head.snapshot.schemaJson),
        summary = head.snapshot.summary ++ extraSummary +
          ("staged-appends" ->
            (head.snapshot.summary.getOrElse("staged-appends", "0").toInt + 1).toString))
      if (writeBranchHead(name, head.base, head.seq + 1, snap)) return true
      // a concurrent branch append won this seq: clean our staged files and
      // retry against the fresh head
      written.foreach(e => hfs.delete(
        new org.apache.hadoop.fs.Path(SnapshotLog.dataPath(tableDir), e.path), false))
    }
    throw new IllegalStateException(s"could not stage append on $tableDir@$name")
  }

  /** Publish a branch: fast-forward main to the audited staged state as ONE
    * commit (metadata-only — staged files are already in place). The WAP
    * contract is strict: if main advanced past the branch base, the audit
    * no longer describes what publish would produce, so it raises instead
    * (re-branch from the new main and re-audit). The branch ref is dropped
    * after a successful publish.
    */
  def publishBranch(name: String): Snapshot = {
    val head = branchHead(name).getOrElse(
      throw new IllegalArgumentException(s"no branch $name in $tableDir"))
    val snap = commitWithRetry { parent =>
      val p = parent.getOrElse(throw new IllegalStateException("publish on empty table"))
      if (p.snapshotId != head.base)
        throw new java.util.ConcurrentModificationException(
          s"main advanced to ${p.snapshotId} since branch $name based on ${head.base}: " +
            "the audited state is stale — re-branch and re-audit")
      val files = head.snapshot.files
      Snapshot(p.snapshotId + 1, Some(p.snapshotId), clock(), "publish-branch",
        p.schemaJson, p.partitionCols, files,
        // branch-scoped streaming batch ids stay durable ACROSS the publish:
        // the staged head's ids land in the main commit summary, so an
        // at-least-once replay (fresh/lost checkpoint) after a publish sees
        // them via the main log and cannot re-stage published batches
        head.snapshot.summary.filter(_._1.startsWith(GraftTable.StagedStreamKeyPrefix)) ++
        Map("published-branch" -> name,
          "added-files" -> (files.size - p.files.size).toString), Nil,
        schemasFor(files, head.snapshot.schemas + ((p.snapshotId + 1).toString -> p.schemaJson)),
        p.chain, head.snapshot.deletes)
    }
    dropBranch(name)
    snap
  }

  /** Drop a branch ref. Staged files it alone referenced become orphans
    * (removed by the next `removeOrphanFiles`).
    */
  def dropBranch(name: String): Boolean = {
    val dir = SnapshotLog.logPath(tableDir)
    if (!hfs.exists(dir)) return false
    val mine = hfs.listStatus(dir).map(_.getPath).filter(p => p.getName match {
      case BranchFileRe(n, _) => n == name
      case _ => false
    })
    mine.foreach(p => hfs.delete(p, false))
    mine.nonEmpty
  }

  // ---- Table properties: versioned docs, atomic publish, latest wins ----

  private def propsFileName(seq: Long) = f"props-$seq%08d.json"

  private def latestPropsSeq: Option[Long] = {
    val dir = SnapshotLog.logPath(tableDir)
    if (!hfs.exists(dir)) return None
    hfs.listStatus(dir).map(_.getPath.getName)
      .collect { case PropsFileRe(s) => s.toLong }.maxOption
  }

  private def propsAt(seq: Long): Map[String, String] = {
    implicit val fmts: org.json4s.Formats = SnapshotLog.formats
    org.json4s.jackson.JsonMethods.parse(SnapshotLog.readStringAt(hfs,
      new org.apache.hadoop.fs.Path(SnapshotLog.logPath(tableDir), propsFileName(seq))))
      .extract[Map[String, String]]
  }

  /** Current table properties (the Iceberg table-properties analog; e.g.
    * `write.parquet.bloom-filter-columns` — see `writeDataFiles`). Empty for
    * tables that never set any.
    */
  def properties: Map[String, String] =
    latestPropsSeq.map(propsAt).getOrElse(Map.empty)

  /** Merge `updates` into the table properties (None value = remove the
    * key). Compare-and-swap versioned publish: the observed latest seq is
    * read ONCE, the merged doc is published at exactly seq+1 by
    * create-if-absent, and a loser retries against the fresh doc — reading
    * "current props" and "latest seq" separately would let a concurrent
    * publish land between the two reads and be overwritten by a stale merge
    * (the lost update ConcurrentCommitSpec races for).
    */
  def setProperties(updates: Map[String, Option[String]]): Map[String, String] = {
    val dir = SnapshotLog.logPath(tableDir)
    hfs.mkdirs(dir)
    var attempts = 0
    while (attempts < 50) {
      attempts += 1
      val observed = latestPropsSeq
      val cur = observed.map(propsAt).getOrElse(Map.empty)
      val next = updates.foldLeft(cur) {
        case (m, (k, Some(v))) => m + (k -> v)
        case (m, (k, None)) => m - k
      }
      implicit val fmts: org.json4s.Formats = SnapshotLog.formats
      if (SnapshotLog.publishAtomicAt(hfs,
          new org.apache.hadoop.fs.Path(dir, propsFileName(observed.getOrElse(0L) + 1)),
          org.json4s.jackson.Serialization.write(next)))
        return next
      Thread.sleep(ThreadLocalRandom.current().nextLong(1L, math.min(50L, 2L + attempts * 2L)))
    }
    throw new IllegalStateException(s"could not publish properties in $tableDir")
  }

  /** ANALYZE — table/column statistics computed in ONE scan and stored in
    * table properties (the Iceberg `compute_table_stats` procedure / Puffin
    * stats-file analog). Per column: exact NDV and null count; min/max come
    * from snapshot metadata (footer bounds) — already exact there, and free.
    * Exact NDV (`COUNT(DISTINCT)`) keeps the stored numbers verifiable by
    * any engine; Spark plans the multi-distinct agg as one Expand + one
    * shuffle with map-side partials. At 100 TB pass `exact = false`:
    * HLL++ `approx_count_distinct` is a bounded-memory one-pass sketch —
    * the same trade Iceberg makes with theta sketches in Puffin.
    *
    * Keys: `stats.row-count`, `stats.snapshot-id`,
    * `stats.col.<name>.{ndv,nulls,min,max}`. Returns the merged properties.
    */
  def analyzeColumns(cols: Seq[String] = Nil, exact: Boolean = true): Map[String, String] = {
    val snap = latest
    val logical = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val targets: Seq[String] =
      if (cols.isEmpty) logical.fields.map(_.name).toSeq
      else {
        cols.foreach(c => require(logical.fieldNames.contains(c),
          s"analyze: no column $c in $tableDir"))
        cols
      }
    val df = readSnapshot(snap)
    val aggs = targets.flatMap { c =>
      val ndv = if (exact) countDistinct(col(c))
        else approx_count_distinct(col(c))
      Seq(ndv.as(s"ndv:$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls:$c"))
    }
    val row = df.agg(count(lit(1)).as("rc"), aggs: _*).collect().head
    val rc = row.getAs[Long]("rc")
    val updates = scala.collection.mutable.Map[String, Option[String]](
      StatsRowCountProp -> Some(rc.toString),
      StatsSnapshotProp -> Some(snap.snapshotId.toString))
    targets.foreach { c =>
      updates(s"$StatsColPrefix$c.ndv") = Some(row.getAs[Long](s"ndv:$c").toString)
      updates(s"$StatsColPrefix$c.nulls") =
        Some(Option(row.get(row.fieldIndex(s"nulls:$c"))).fold("0")(_.toString))
      // bounds only where footer stats are exact for the type; stale keys
      // from a prior analyze are removed rather than left lying
      minMaxFromMetadata(c, Some(snap)) match {
        case Some((mn, mx)) =>
          updates(s"$StatsColPrefix$c.min") = Some(mn.toString)
          updates(s"$StatsColPrefix$c.max") = Some(mx.toString)
        case None =>
          updates(s"$StatsColPrefix$c.min") = None
          updates(s"$StatsColPrefix$c.max") = None
      }
    }
    setProperties(updates.toMap)
  }

  /** The `ns.t.column_stats` metadata relation: one row per analyzed column
    * out of the stored `stats.*` properties — (col_name, ndv, null_count,
    * min, max, row_count, analyzed_snapshot_id). Empty until `analyzeColumns`
    * (or `ANALYZE TABLE` / `CALL compute_table_stats`) has run.
    */
  def columnStatsTable(): DataFrame = {
    import spark.implicits._
    val props = properties
    val rc = props.get(StatsRowCountProp).map(_.toLong)
    val sid = props.get(StatsSnapshotProp).map(_.toLong)
    val colNames = props.keys.collect {
      case k if k.startsWith(StatsColPrefix) =>
        val rest = k.stripPrefix(StatsColPrefix)
        rest.take(rest.lastIndexOf('.'))
    }.toSeq.distinct.sorted
    colNames.map { c =>
      (c, props.get(s"$StatsColPrefix$c.ndv").map(_.toLong),
        props.get(s"$StatsColPrefix$c.nulls").map(_.toLong),
        props.get(s"$StatsColPrefix$c.min"), props.get(s"$StatsColPrefix$c.max"),
        rc, sid)
    }.toDF("col_name", "ndv", "null_count", "min", "max",
      "row_count", "analyzed_snapshot_id")
  }

  /** D4 — add column with default (ref schema_evolution_sales_events.sql:3-4).
    * An explicit default (even the empty string) replays over pre-evolution
    * rows; the no-default overload replays NULL — absence is encoded by
    * omitting the key, never by a sentinel value.
    */
  def addColumn(name: String, dataType: String): Snapshot =
    addColumn(name, dataType, None)
  def addColumn(name: String, dataType: String, default: String): Snapshot =
    addColumn(name, dataType, Some(default))
  def addColumn(name: String, dataType: String, default: Option[String]): Snapshot =
    evolveSchema(GraftTable.addColumnOp(name, dataType, default),
      s => StructType(s.fields :+ org.apache.spark.sql.types.StructField(
        name, DataType.fromDDL(dataType), nullable = true)), "add-column")

  /** D5 — rename column (ref schema_evolution_sales_events.sql:6-7). */
  def renameColumn(from: String, to: String): Snapshot =
    evolveSchema(GraftTable.renameColumnOp(from, to),
      s => StructType(s.fields.map(f => if (f.name == from) f.copy(name = to) else f)),
      "rename-column")

  /** D6 — type widening (ref schema_evolution_sales_events.sql:9-10). */
  def widenColumn(name: String, newType: String): Snapshot =
    evolveSchema(GraftTable.widenColumnOp(name, newType),
      s => StructType(s.fields.map(f =>
        if (f.name == name) f.copy(dataType = DataType.fromDDL(newType)) else f)),
      "widen-column")

  /** Drop a column (metadata-only, like the Iceberg `drop column`): old
    * files keep the physical data; reads replay the drop so the column never
    * surfaces, and a later re-`addColumn` of the same name starts a FRESH
    * column (the replay order drop-then-add resurrects nothing, and
    * `writeTimeName`'s add rule keeps old files' stats from aliasing in).
    * Refused for columns the table still depends on: partition columns
    * (identity or a transform's source) and live MOR delete keys — dropping
    * those would break scan planning / delete application, not just hide
    * data.
    */
  def dropColumn(name: String): Snapshot = {
    val snap = latest
    require(snap.partitionCols.forall(_ != name),
      s"cannot drop partition column $name of $tableDir")
    require(!GraftTable.parseTransforms(properties).exists(_.src == name),
      s"cannot drop $name: it is the source of a partition transform in $tableDir")
    val liveKeyCols = snap.deletes
      .flatMap(d => d.keyCols.map(k => GraftTable.currentName(snap, k, d.appliedAt)))
    require(!liveKeyCols.contains(name),
      s"cannot drop $name: live merge-on-read delete files key on it in $tableDir")
    evolveSchema(GraftTable.dropColumnOp(name),
      s => {
        require(s.fieldNames.contains(name), s"no column $name in $tableDir")
        StructType(s.fields.filterNot(_.name == name))
      }, "drop-column")
  }

  /** S3 — bulk append (ref blob-dfs_bench.py:104-106). Metadata-only for
    * existing files. `sortWithinPartitionsCols` implements WRITE ORDERED BY
    * (O5, ref create_sales_events.sql:21-24). `extraSummary` entries land in
    * the snapshot's summary map (e.g. the streaming sink's batch-id marker).
    */
  /** `basedOn` pins the commit to an observed head (same refusal contract
    * as [[commitMorDelta]]): if the table advanced since, the commit throws
    * ConcurrentModificationException instead of landing — for callers whose
    * append is NOT idempotent relative to a state they read (e.g. a CDC
    * follower applying a delta derived from the offset at that head).
    */
  /** `preCommit` runs INSIDE every CAS attempt, before the snapshot is
    * built — a caller-supplied fence (e.g. the streaming epoch's
    * `stream-batch-id` re-check) that can abort the commit by throwing even
    * after the data files are staged; staged files are removed on abort.
    */
  def append(df: DataFrame, sortWithinPartitionsCols: Seq[String] = Nil,
      extraSummary: Map[String, String] = Map.empty,
      basedOn: Option[Snapshot] = None,
      preCommit: Option[Snapshot] => Unit = _ => ()): Snapshot =
    commitData(df, "append", parentFiles = true, sortWithinPartitionsCols,
      extraSummary, basedOn, preCommit)

  /** Publish one DSv2 STREAMING epoch's staged part files as an exactly-once
    * append — the driver half of `df.writeStream.format("graft")`
    * (graft.sources.GraftStreamingWrite): executors stage parquet under
    * `data/_streaming/<query>/<epoch>/`, and this commit fences on the same
    * `stream-batch-id` summary key as the foreachBatch sinks
    * (StreamOps.ingestBatch), so Spark's at-least-once epoch replay after a
    * restart upgrades to exactly-once. Returns None when the epoch was
    * already committed (staging is discarded).
    *
    * Two publication shapes:
    *  - UNPARTITIONED table: staged files are already final form — rename
    *    into the shared data layout + footer-stats harvest, zero data
    *    rewrite (the Iceberg streaming-append shape). The fence re-checks
    *    INSIDE the CAS retry so two racing replays cannot both land.
    *  - PARTITIONED table (identity or transform): the staged logical rows
    *    re-enter [[append]] as a distributed read — hash distribution,
    *    derived transform columns, per-partition file targeting and WRITE
    *    ORDERED BY all apply exactly as for a batch append, at the cost of
    *    one extra materialization of the epoch (not the table).
    */
  def commitStreamingEpoch(stagingDir: String, epochId: Long,
      stagedPaths: Seq[String]): Option[Snapshot] = {
    final case class EpochDone() extends RuntimeException
    val staging = new org.apache.hadoop.fs.Path(stagingDir)
    def fence: Option[Long] = snapshotsList.flatMap(s =>
      s.summary.get("stream-batch-id") ++
        s.summary.get(GraftTable.CarriedFencePrefix + "stream-batch-id"))
      .map(_.toLong).maxOption
    def cleanup(): Unit = scala.util.Try(hfs.delete(staging, true))
    if (fence.exists(_ >= epochId)) { cleanup(); return None }
    val parentSnap = latest
    // Publish ONLY the files named by the winning task attempts' commit
    // messages — never a directory listing. The epoch dir may also hold
    // files from zombie attempts whose abort never ran (executor crash
    // after the parquet close, before the commit coordinator answered):
    // listing would publish those alongside the retry's file (duplicated
    // rows), and a footer-less torn leftover would fail the footer harvest
    // on every replay and wedge the stream. cleanup() removes the whole
    // epoch dir afterwards, zombies included. A message-named file that is
    // MISSING means the coordinator accepted a task whose output vanished —
    // refuse loudly rather than silently drop its rows.
    val staged = stagedPaths.map(new org.apache.hadoop.fs.Path(_))
    staged.foreach(f => require(hfs.exists(f),
      s"streaming epoch $epochId: committed task file $f is missing from staging"))
    if (parentSnap.partitionCols.nonEmpty && staged.nonEmpty) {
      val df = spark.read.parquet(staged.map(_.toString): _*)
      val aligned = df.select(DataType.fromJson(parentSnap.schemaJson)
        .asInstanceOf[StructType].fieldNames.filter(df.columns.contains)
        .map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
      // The fence re-check must sit INSIDE the CAS retry (as on the rename
      // path below): two racing replays of the same epoch — e.g. a zombie
      // driver beside its restarted successor — would otherwise BOTH pass
      // the entry check and both commit, duplicating the epoch.
      try {
        val snap = append(aligned,
          extraSummary = Map("stream-batch-id" -> epochId.toString),
          preCommit = _ => if (fence.exists(_ >= epochId)) throw EpochDone())
        cleanup()
        return Some(snap)
      } catch { case _: EpochDone => cleanup(); return None }
    }
    // direct publish: harvest footers at the staging site (a corrupt file
    // refuses before any move), drop provably-empty part files
    val withMeta = staged.map { f =>
      val (rows, st) = footerMeta(f)
      require(rows >= 0,
        s"streaming epoch $epochId: unreadable parquet footer for $f")
      (f, rows, st)
    }.filter(_._2 != 0L)
    val dataRoot = SnapshotLog.dataPath(tableDir)
    val token = java.util.UUID.randomUUID().toString.take(8)
    val moved = withMeta.zipWithIndex.map { case ((f, rows, st), i) =>
      val name = f"stream-$epochId%08d-$token-$i-${f.getName}"
      val dest = new org.apache.hadoop.fs.Path(dataRoot, name)
      require(hfs.rename(f, dest), s"could not publish $f to $dest")
      hfs.setTimes(dest, System.currentTimeMillis(), -1)
      FileEntry(name, Map.empty, rows, hfs.getFileStatus(dest).getLen, 0L, st)
    }
    try {
      val snap = commitWithRetry { p0 =>
        val p = p0.getOrElse(throw new IllegalStateException(
          s"streaming write into $tableDir: table has no snapshots"))
        if (fence.exists(_ >= epochId)) throw EpochDone()
        if (shapeOf(DataType.fromJson(p.schemaJson).asInstanceOf[StructType]) !=
            shapeOf(DataType.fromJson(parentSnap.schemaJson).asInstanceOf[StructType]))
          throw new java.util.ConcurrentModificationException(
            s"schema of $tableDir evolved concurrently with the streaming epoch")
        val id = p.snapshotId + 1
        val files = (p.files ++ moved.map(_.copy(writtenAt = id))).toList
        // a zero-file epoch still advances the fence (no write schema
        // recorded — the streaming source skips it like any empty append)
        val schemas =
          if (moved.isEmpty) schemasFor(files, p.schemas)
          else schemasFor(files, p.schemas + (id.toString -> p.schemaJson))
        Snapshot(id, Some(p.snapshotId), clock(), "append", p.schemaJson,
          p.partitionCols, files,
          Map("stream-batch-id" -> epochId.toString,
            "added-files" -> moved.size.toString),
          Nil, schemas, p.chain, p.deletes)
      }
      cleanup()
      Some(snap)
    } catch {
      case _: EpochDone =>
        moved.foreach(e => scala.util.Try(
          hfs.delete(new org.apache.hadoop.fs.Path(dataRoot, e.path), false)))
        cleanup()
        None
    }
  }

  /** Zero-copy import of existing parquet files — the Iceberg
    * `add_files`/`migrate` procedure family (onboard data another engine
    * wrote without rewriting a byte). Files are RENAMED into the table's
    * shared data layout — an O(1) metadata move per file on the same
    * filesystem, never a data copy — and their parquet footers are harvested
    * at import, so row counts, min/max pruning, and metadata-only aggregates
    * work on imported files exactly as on written ones from the first read.
    *
    * Ownership transfers to the table (Iceberg `migrate` semantics). The
    * in-place external reference of Iceberg's `add_files` is deliberately
    * NOT offered: this format's GC ownership boundary is its single data
    * root — orphan scans and snapshot expiry reason only about files under
    * it, and an external reference would silently dodge both.
    *
    * Source layout contract: hive `k=v` subdirectories map to partition
    * columns and must cover the table's partition spec exactly; file
    * schemas must match the table's current logical schema minus partition
    * columns (the table's own layout keeps partition values in directories,
    * not files). Leaf names are uniquified on the way in (import sources
    * repeat `part-00000-…` names; merge-on-read delete applicability is
    * keyed by globally-unique part names). Empty files are skipped in
    * place; an unreadable footer refuses the whole import BEFORE any file
    * moves; a failed commit moves every imported file back.
    */
  def addFiles(sourceDir: String): Snapshot = {
    val src = new org.apache.hadoop.fs.Path(sourceDir)
    require(hfs.exists(src), s"add_files source $sourceDir does not exist")
    // importing from inside the table itself would rename LIVE files onto
    // new names and double-reference their rows — refuse before looking.
    // The check is symmetric: a source that CONTAINS the table (its parent)
    // would recursively list the table's own data/ files and corrupt it the
    // same way, so either direction of containment refuses.
    val tableQual = hfs.makeQualified(
      new org.apache.hadoop.fs.Path(tableDir)).toString
    val srcQualTop = hfs.makeQualified(src).toString
    require(!(srcQualTop + "/").startsWith(tableQual + "/"),
      s"add_files source $sourceDir lies inside table $tableDir")
    require(!(tableQual + "/").startsWith(srcQualTop + "/"),
      s"add_files source $sourceDir contains table $tableDir — importing " +
        "would rename the table's own live data files")
    val parentSnap = latest
    val partCols = parentSnap.partitionCols
    val logical = DataType.fromJson(parentSnap.schemaJson).asInstanceOf[StructType]
    val srcFiles = listParquetFiles(src)
    require(srcFiles.nonEmpty, s"add_files: no parquet files under $sourceDir")
    val srcQual = hfs.makeQualified(src).toString
    val parsed = srcFiles.map { f =>
      val rel = hfs.makeQualified(f).toString.stripPrefix(srcQual).stripPrefix("/")
      val partVals = rel.split("/").dropRight(1).filter(_.contains("="))
        .map { seg => val Array(k, v) = seg.split("=", 2); k -> v }.toMap
      require(partVals.keySet == partCols.toSet,
        s"add_files: $rel carries partition dirs [${partVals.keySet.mkString(",")}] " +
          s"but $tableDir is partitioned by [${partCols.mkString(",")}]")
      (f, rel, partVals)
    }
    // Shape check through Spark's own reader (data columns + hive partition
    // columns must equal the table's logical shape — the same rule append
    // enforces). Partition columns compare by NAME only: their directory-
    // inferred type is irrelevant because every table read forces the
    // logical schema over basePath discovery.
    val srcSchema = spark.read.option("basePath", sourceDir).parquet(sourceDir).schema
    def minusParts(s: StructType): StructType =
      StructType(s.fields.filterNot(f => partCols.contains(f.name)))
    require(partCols.forall(srcSchema.fieldNames.contains),
      s"add_files: source layout misses partition column(s) " +
        partCols.filterNot(srcSchema.fieldNames.contains).mkString(", "))
    require(shapeOf(minusParts(srcSchema)) == shapeOf(minusParts(logical)),
      s"add_files: source schema ${minusParts(srcSchema).simpleString} does not " +
        s"match table $tableDir ${minusParts(logical).simpleString}")
    // Footers are read at the SOURCE, so a corrupt file refuses the import
    // while everything still sits untouched where the caller put it.
    // 16-way parallel like the write path's stats harvest — a large import
    // is O(files) driver metadata work either way (PlanningScaleSpec bounds
    // the class), but serial footer I/O would dominate wall-clock.
    val withStats = {
      import scala.collection.parallel.CollectionConverters._
      val par = parsed.par
      par.tasksupport = new scala.collection.parallel.ForkJoinTaskSupport(
        new java.util.concurrent.ForkJoinPool(16))
      try par.map { case (f, rel, pv) =>
        val (rows, st) = footerMeta(f)
        require(rows >= 0,
          s"add_files: unreadable parquet footer for $rel — refusing import")
        (f, rel, pv, rows, st)
      }.seq
      finally par.tasksupport.asInstanceOf[scala.collection.parallel.ForkJoinTaskSupport]
        .forkJoinPool.shutdown()
    }
    val dataRoot = SnapshotLog.dataPath(tableDir)
    val guessId = parentSnap.snapshotId + 1
    val token = java.util.UUID.randomUUID().toString.take(8)
    val moved: Seq[(org.apache.hadoop.fs.Path, FileEntry)] =
      withStats.zipWithIndex.flatMap { case ((f, rel, pv, rows, st), i) =>
        if (rows == 0L) None // provably empty: never referenced, left in place
        else {
          val dirPart = rel.split("/").dropRight(1).filter(_.contains("=")).mkString("/")
          val name = f"import-$guessId%08d-$token-$i-${f.getName}"
          val destRel = if (dirPart.isEmpty) name else s"$dirPart/$name"
          val dest = new org.apache.hadoop.fs.Path(dataRoot, destRel)
          hfs.mkdirs(dest.getParent)
          require(hfs.rename(f, dest), s"add_files: could not move $f to $dest")
          // rename preserves the SOURCE mtime — an old source file would sit
          // unreferenced with an ancient timestamp until the commit lands,
          // and a concurrent remove_orphan_files would delete it (fresh
          // writes are safe only because their mtimes are new). Touch the
          // mtime so imports enjoy the same in-flight grace window.
          hfs.setTimes(dest, System.currentTimeMillis(), -1)
          val size = hfs.getFileStatus(dest).getLen
          Some((f, FileEntry(destRel, pv, rows, size, guessId, st)))
        }
      }
    require(moved.nonEmpty, s"add_files: only empty parquet files under $sourceDir")
    def moveBack(): Unit = moved.foreach { case (orig, e) =>
      scala.util.Try(hfs.rename(new org.apache.hadoop.fs.Path(dataRoot, e.path), orig))
    }
    try commitWithRetry { parent =>
      val p = parent.getOrElse(throw new IllegalStateException(
        s"add_files into $tableDir: table has no snapshots"))
      // A concurrent schema or partition evolution means the files no longer
      // match what they were validated against — abort (files move back).
      val cur = DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
      if (shapeOf(cur) != shapeOf(logical))
        throw new java.util.ConcurrentModificationException(
          s"schema of $tableDir evolved concurrently with add_files")
      if (p.partitionCols != partCols)
        throw new java.util.ConcurrentModificationException(
          s"partitioning of $tableDir evolved concurrently with add_files")
      val id = p.snapshotId + 1
      // writtenAt = this commit: existing equality deletes (appliedAt <= id)
      // never touch imported rows, exactly as with an append's rows
      val files = (p.files ++ moved.map(_._2.copy(writtenAt = id))).toList
      Snapshot(id, Some(p.snapshotId), clock(), "add-files", p.schemaJson,
        p.partitionCols, files,
        Map("added-files" -> moved.size.toString, "import-source" -> sourceDir),
        Nil, schemasFor(files, p.schemas + (id.toString -> p.schemaJson)),
        p.chain, p.deletes)
    } catch { case e: Throwable => moveBack(); throw e }
  }

  /** Replace all data with `df` (used by compaction and full rewrites). */
  def overwrite(df: DataFrame, operation: String = "overwrite"): Snapshot =
    commitData(df, operation, parentFiles = false)

  /** Optimistic-commit loop: rebuild the snapshot against the CURRENT parent
    * on every attempt, so a loser retries with the winner's state instead of
    * silently dropping it (blind id-bumping would lose a concurrent append's
    * files). `build` may throw to abort (rewrite conflict validation).
    *
    * Losers back off with jitter (the Iceberg commit-retry shape): under N
    * racing committers a tight loop makes every loser re-list and re-lose in
    * lockstep, and a bounded attempt count can exhaust on a loaded machine —
    * a short randomized sleep that grows with the attempt count breaks the
    * convoy while keeping the uncontended path sleep-free.
    */
  private def commitWithRetry(build: Option[Snapshot] => Snapshot): Snapshot = {
    var attempts = 0
    while (attempts < 50) {
      val parent = snapshotsList.lastOption
      val snap = build(parent)
      // parent rides along so the published doc can be delta-encoded
      // (O(changed files) metadata per commit — SnapshotLog.SnapDoc)
      if (SnapshotLog.commit(conf, tableDir, snap, parent)) return snap
      attempts += 1
      Thread.sleep(ThreadLocalRandom.current().nextLong(1L, math.min(100L, 2L + attempts * 4L)))
    }
    throw new IllegalStateException(s"could not commit after $attempts retries in $tableDir")
  }

  /** Commit a snapshot that keeps `keepFiles` from the snapshot the rewrite
    * was planned against and adds the files produced by writing `df`
    * (copy-on-write DML's primitive). Conflict rule (Iceberg's serializable
    * validation): any commit that landed after `basedOn` aborts the rewrite —
    * a concurrent append could hold rows matching the DML predicate, and a
    * concurrent rewrite may have replaced files this plan kept.
    */
  /** Durable idempotence fences (stream batch ids, CDC follow offsets,
    * staged-stream ids) live in snapshot summaries — aggressive snapshot
    * expiry after maintenance commits would otherwise GC the fence and
    * silently re-open exactly-once paths to replays. Maintenance commits
    * therefore CARRY the current max of each fence key forward under
    * `carried:<key>` (a distinct key, so consumers that count genuine
    * stream commits by the primary key are unaffected); fence readers take
    * the max over both forms.
    */
  private def carriedFences(): Map[String, String] = {
    val snaps = snapshotsList
    def isFence(k: String): Boolean =
      k == "stream-batch-id" || k == "follow-src-snapshot" ||
        k.startsWith(GraftTable.StagedStreamKeyPrefix)
    val keys = snaps.flatMap(_.summary.keys).collect {
      case k if isFence(k) => k
      case k if k.startsWith(GraftTable.CarriedFencePrefix) =>
        k.stripPrefix(GraftTable.CarriedFencePrefix)
    }.toSet
    keys.flatMap { k =>
      snaps.flatMap(s => s.summary.get(k) ++
          s.summary.get(GraftTable.CarriedFencePrefix + k))
        .map(_.toLong).maxOption
        .map(v => (GraftTable.CarriedFencePrefix + k) -> v.toString)
    }.toMap
  }

  def commitRewrite(df: DataFrame, keepFiles: Seq[FileEntry], operation: String,
      basedOn: Option[Snapshot] = None, clearDeletes: Boolean = false,
      advisoryBytesOverride: Option[Long] = None): Snapshot = {
    val planned = basedOn.getOrElse(latest)
    val fences = carriedFences()
    val written = writeDataFiles(df, planned.snapshotId + 1,
      advisoryOverride = advisoryBytesOverride)
    commitWithRetry { parent =>
      val p = parent.getOrElse(throw new IllegalStateException("rewrite on empty table"))
      if (p.snapshotId != planned.snapshotId)
        throw new java.util.ConcurrentModificationException(
          s"table advanced to ${p.snapshotId} since rewrite planned at ${planned.snapshotId}")
      val files = (keepFiles ++ written).toList
      // Equality deletes ride along: rewritten output was read with deletes
      // APPLIED and carries writtenAt = the new id ≥ every appliedAt, so the
      // carried deletes no longer touch it; kept files still need them.
      // `clearDeletes` (delete materialization) drops them once no kept file
      // is affected — the caller proves that by rewriting every affected file.
      val deletes = if (clearDeletes) Nil else p.deletes
      Snapshot(p.snapshotId + 1, Some(p.snapshotId), clock(), operation, p.schemaJson,
        p.partitionCols, files,
        fences ++ Map("added-files" -> written.size.toString), Nil,
        schemasFor(files, p.schemas + ((p.snapshotId + 1).toString -> p.schemaJson)),
        p.chain, deletes)
    }
  }

  /** Merge-on-read commit primitive (the Iceberg v2 equality-delete write
    * path): ONE commit that adds an equality-delete file holding `keys`'
    * tuples and, when `appendDf` is given, appends its rows as new data
    * files — the Flink-CDC upsert shape. No existing data file is opened or
    * rewritten: at 100 TB a keyed delete or upsert batch costs O(batch), not
    * O(matched files), with the reconciliation deferred to reads (broadcast
    * anti-join) and ultimately to `Maintenance.materializeDeletes`.
    *
    * The delete applies to data files with `writtenAt < appliedAt` (this
    * commit's id): rows appended by THIS commit survive, so upsert = delete
    * keys + insert rows atomically.
    *
    * When `basedOn` is given the commit aborts if the table advanced past it
    * (serializable planning — the predicate-scan delete path uses this); when
    * None the commit retries against the current parent (blind keyed deletes
    * and upserts compose with concurrent appends: the delete is simply the
    * later commit and applies to them).
    */
  def commitMorDelta(keys: DataFrame, appendDf: Option[DataFrame], operation: String,
      basedOn: Option[Snapshot] = None,
      extraSummary: Map[String, String] = Map.empty): Snapshot = {
    val keyCols = keys.schema.fieldNames.toList
    require(keyCols.nonEmpty, "merge-on-read delete needs at least one key column")
    val cur = schema
    keyCols.foreach { k =>
      require(cur.fieldNames.contains(k),
        s"delete key column $k is not a column of $tableDir")
    }
    appendDf.foreach { df =>
      require(shapeOf(df.schema) == shapeOf(cur),
        s"$operation append schema does not match table $tableDir")
    }
    val planned = basedOn.getOrElse(latest)
    val delWritten = writeDeleteFile(keys)
    val dataWritten = appendDf.map(writeDataFiles(_, planned.snapshotId + 1)).getOrElse(Nil)
    commitWithRetry { parent =>
      val p = parent.getOrElse(throw new IllegalStateException("MOR delta on empty table"))
      if (basedOn.isDefined && p.snapshotId != planned.snapshotId)
        throw new java.util.ConcurrentModificationException(
          s"table advanced to ${p.snapshotId} since MOR delete planned at ${planned.snapshotId}")
      val id = p.snapshotId + 1
      val files = (p.files ++ dataWritten.map(_.copy(writtenAt = id))).toList
      val delEntries = delWritten.map(_.copy(keyCols = keyCols, appliedAt = id))
      Snapshot(id, Some(p.snapshotId), clock(), operation, p.schemaJson,
        p.partitionCols, files,
        extraSummary ++ Map("added-delete-files" -> delEntries.size.toString,
          "added-files" -> dataWritten.size.toString), Nil,
        schemasFor(files, p.schemas + (id.toString -> p.schemaJson)),
        p.chain, (p.deletes ++ delEntries).toList)
    }
  }

  /** Positional merge-on-read commit primitive (the Iceberg v3
    * deletion-vector shape): ONE commit that adds a delete VECTOR —
    * (part-file name, row position) tuples addressing exactly the rows to
    * drop — and, when `appendDf` is given, appends its rows as new data
    * files. Same O(batch) cost shape as [[commitMorDelta]], but no
    * identifier columns are trusted and a non-unique key can never
    * over-delete: the vector names rows, not values. `dv` must have exactly
    * the columns (`_gf_file` string, `_gf_pos` long) as produced by
    * [[readSnapshotTagged]]'s file/pos tagging.
    */
  def commitDvDelta(dv: DataFrame, appendDf: Option[DataFrame], operation: String,
      basedOn: Option[Snapshot] = None,
      extraSummary: Map[String, String] = Map.empty): Snapshot = {
    val dvCols = dv.schema.fieldNames.toSeq
    require(dvCols == Seq(GraftTable.WrittenAtCol, GraftTable.PosCol),
      s"delete vector must have columns (${GraftTable.WrittenAtCol}, " +
        s"${GraftTable.PosCol}); got ${dvCols.mkString(", ")}")
    val cur = schema
    appendDf.foreach { df =>
      require(shapeOf(df.schema) == shapeOf(cur),
        s"$operation append schema does not match table $tableDir")
    }
    // Serializable by construction: positions address the PLANNED file set,
    // and a commit (compaction, COW DML) landing in between could move the
    // addressed rows into files the vector cannot name — so unlike the
    // compose-with-appends equality path, a DV commit always aborts when the
    // table advanced past its plan.
    val planned = basedOn.getOrElse(latest)
    val delWritten = writeDeleteFile(dv)
    val dataWritten = appendDf.map(writeDataFiles(_, planned.snapshotId + 1)).getOrElse(Nil)
    commitWithRetry { parent =>
      val p = parent.getOrElse(throw new IllegalStateException("DV delta on empty table"))
      if (p.snapshotId != planned.snapshotId)
        throw new java.util.ConcurrentModificationException(
          s"table advanced to ${p.snapshotId} since positional delete planned at ${planned.snapshotId}")
      val id = p.snapshotId + 1
      val files = (p.files ++ dataWritten.map(_.copy(writtenAt = id))).toList
      val delEntries = delWritten.map(_.copy(appliedAt = id, positional = true))
      Snapshot(id, Some(p.snapshotId), clock(), operation, p.schemaJson,
        p.partitionCols, files,
        extraSummary ++ Map("added-delete-files" -> delEntries.size.toString,
          "added-files" -> dataWritten.size.toString,
          "delete-representation" -> "positional"), Nil,
        schemasFor(files, p.schemas + (id.toString -> p.schemaJson)),
        p.chain, (p.deletes ++ delEntries).toList)
    }
  }

  /** Write `keys` as parquet under `data/_deletes/` (the underscore keeps
    * data-scan partition discovery blind to it) and return entries with
    * placeholder keyCols/appliedAt (the commit loop fills them in).
    */
  private def writeDeleteFile(keys: DataFrame): Seq[DeleteEntry] = {
    val dataRoot = SnapshotLog.dataPath(tableDir)
    val delDir = new org.apache.hadoop.fs.Path(dataRoot, DeletesDir)
    val stage = new org.apache.hadoop.fs.Path(dataRoot,
      s".stage-del-${java.util.UUID.randomUUID().toString.take(8)}")
    // ONE delete file per commit by default: a delete batch is keys, not
    // data — small relative to the table by construction — and a single
    // file keeps the read-side anti-join union exactly as wide as the
    // number of un-materialized delete COMMITS. But a MOR UPDATE/MERGE
    // matching a large fraction of the table produces an UNBOUNDED vector,
    // and funneling it through one task is the write-side ceiling at 100 TB
    // (Iceberg shards position deletes per partition for the same reason):
    // above an estimated-size threshold, shard the write — positional
    // vectors cluster by their target file name (each shard's tuples stay
    // file-coherent for the reader's per-file position sets), key batches
    // by their own hash. The read side already unions per-commit files, so
    // a multi-file delete commit costs nothing extra to apply.
    // Catalyst's sizeInBytes is a BigInt and join-heavy plans can estimate
    // absurdly high (1e20 observed on the consolidation merge) — anything
    // past ~1 PB is an estimate artifact, never a real delete batch (a DV
    // is bounded by table row count: even an all-rows vector on a 100 TB
    // table is ~5e13 bytes). Untrusted estimates keep the single-file
    // shape; NEVER narrow the BigInt before the comparison (a wrapped
    // toLong/toInt here once produced a 2-billion-partition shuffle).
    val estBytes = keys.queryExecution.optimizedPlan.stats.sizeInBytes
    val saneCeiling = BigInt("1000000000000000") // 1e15
    val staged0 =
      if (estBytes <= GraftTable.DeleteShardBytes || estBytes > saneCeiling)
        keys.coalesce(1)
      else {
        // explicit shard count (estimate / ceiling, capped at 64): AQE
        // would otherwise coalesce a keyed repartition back to one task
        val shards =
          ((estBytes / GraftTable.DeleteShardBytes) + 1).min(BigInt(64)).toInt
        val shardKey =
          if (keys.columns.contains(GraftTable.WrittenAtCol)) GraftTable.WrittenAtCol
          else keys.columns.head
        keys.repartition(shards, col(shardKey))
      }
    staged0.write.mode("errorifexists").parquet(stage.toString)
    hfs.mkdirs(delDir)
    val staged = listParquetFiles(stage)
    val entries = staged.flatMap { s =>
      val (rows, _) = footerMeta(s)
      // a sharded write can leave empty hash shards — nothing to publish
      if (rows == 0L) None
      else {
        val dest = new org.apache.hadoop.fs.Path(delDir, s.getName)
        require(hfs.rename(s, dest), s"could not publish delete file $s to $dest")
        val st = hfs.getFileStatus(dest)
        Some(DeleteEntry(s"$DeletesDir/${s.getName}", Nil, rows, st.getLen, 0L))
      }
    }
    hfs.delete(stage, true)
    entries
  }

  /** M-step — the Iceberg `rewrite_position_delete_files` analog for
    * equality deletes: drop DANGLING entries (no data file with
    * `writtenAt < appliedAt` remains — the state compaction leaves behind)
    * and CONSOLIDATE the survivors into one file per resolved key-column
    * group, carrying each tuple's own applicability bound in a
    * `_gf_applied_at` column. A key repeated across delete commits collapses
    * to its MAX bound — a row dies iff ANY merged delete applies iff
    * `writtenAt < max`, exactly the union semantics — so hot streaming-
    * upsert keys store once. Data files are untouched; the commit is
    * metadata plus O(delete tuples), never O(table).
    *
    * At 100 TB this keeps merge-on-read flat: the upsert sink adds one small
    * delete file per batch, and while the read path already folds each
    * key-group into ONE anti-join, its delete side unions and re-broadcasts
    * N files every scan. After consolidation both are 1 per group. Old
    * delete files stay for time travel until expiry + orphan removal.
    * Returns None when nothing is dangling and every group is one file.
    *
    * `consolidate = false` runs only the dangling half — pure metadata,
    * zero file IO — which `maintainTable` applies after every compaction.
    */
  def rewriteDeleteFiles(consolidate: Boolean = true): Option[Snapshot] = {
    val planned = latest
    if (planned.deletes.isEmpty) return None
    // The writtenAt-based liveness test is SOUND for positional vectors too
    // (every file a vector references satisfies writtenAt < appliedAt, so
    // "no such file remains" implies every referenced file is gone), just
    // conservative — exact per-tuple pruning happens in the consolidation
    // merge below, which drops tuples naming dead files.
    val (live0, dangling) = planned.deletes.partition(d =>
      planned.files.exists(_.writtenAt < d.appliedAt))
    val (dvLive, live) = live0.partition(_.positional)
    // group by RESOLVED current key names (order-sensitive): entries whose
    // delete-time names differ but resolve identically merge; diverged
    // resolutions stay separate, exactly as they are separate read joins
    val groups = live.groupBy(d =>
      d.keyCols.map(k => GraftTable.currentName(planned, k, d.appliedAt)))
    val (toMerge, singles) =
      if (consolidate) groups.partition(_._2.size > 1)
      else (Map.empty[List[String], List[DeleteEntry]], groups)
    val mergeDv = consolidate && dvLive.size > 1
    if (dangling.isEmpty && toMerge.isEmpty && !mergeDv) return None
    val dataRoot = SnapshotLog.dataPath(tableDir).toString
    // all positional vectors collapse to ONE distinct-tuple vector, keeping
    // only tuples that still name a live file
    val dvWritten: Seq[DeleteEntry] = if (!mergeDv) dvLive else {
      val liveNames = planned.files.map(_.path.split('/').last)
      import spark.implicits._
      val liveNamesDf = liveNames.toDF(GraftTable.WrittenAtCol)
      val merged = dvLive.map(d => spark.read.parquet(s"$dataRoot/${d.path}"))
        .reduce(_.unionByName(_)).distinct()
        .join(broadcast(liveNamesDf), Seq(GraftTable.WrittenAtCol), "left_semi")
        .select(col(GraftTable.WrittenAtCol), col(GraftTable.PosCol))
      val canon = dvLive.maxBy(_.appliedAt)
      writeDeleteFile(merged).map(_.copy(
        appliedAt = canon.appliedAt, positional = true))
    }
    val written = toMerge.toSeq.sortBy(_._1.mkString(",")).flatMap { case (_, entries) =>
      val canon = entries.maxBy(_.appliedAt)
      val union = entries.map { d =>
        val raw = spark.read.parquet(s"$dataRoot/${d.path}")
        val bounded = if (d.perRowAppliedAt) raw
          else raw.withColumn("_gf_applied_at", lit(d.appliedAt))
        // one atomic positional projection onto the canonical entry's
        // delete-time names (alias-select, immune to rename collisions)
        bounded.select(d.keyCols.zip(canon.keyCols).map { case (from, to) =>
          col(from).as(to) } :+ col("_gf_applied_at"): _*)
      }.reduce(_.unionByName(_))
      val collapsed = union.groupBy(canon.keyCols.map(col): _*)
        .agg(max(col("_gf_applied_at")).as("_gf_applied_at"))
      writeDeleteFile(collapsed).map(_.copy(
        keyCols = canon.keyCols, appliedAt = canon.appliedAt, perRowAppliedAt = true))
    }
    val newDeletes =
      (singles.values.flatten ++ written ++ dvWritten).toList.sortBy(_.path)
    Some(commitWithRetry { parent =>
      val p = parent.getOrElse(
        throw new IllegalStateException("delete rewrite on empty table"))
      if (p.snapshotId != planned.snapshotId)
        throw new java.util.ConcurrentModificationException(
          s"table advanced to ${p.snapshotId} since delete rewrite planned at ${planned.snapshotId}")
      Snapshot(p.snapshotId + 1, Some(p.snapshotId), clock(), "rewrite-delete-files",
        p.schemaJson, p.partitionCols, p.files,
        Map("rewritten-delete-files" ->
          (toMerge.values.map(_.size).sum + (if (mergeDv) dvLive.size else 0)).toString,
          "added-delete-files" -> (written.size + (if (mergeDv) dvWritten.size else 0)).toString,
          "dangling-delete-files" -> dangling.size.toString),
        Nil, p.schemas, p.chain, newDeletes)
    })
  }

  /** Prune a schemas map to the writtenAt ids the file list still references,
    * so snapshot docs stay O(live schemas), not O(all schemas ever).
    */
  private def schemasFor(files: Seq[FileEntry], candidates: Map[String, String])
      : Map[String, String] = {
    val live = files.map(_.writtenAt.toString).toSet
    candidates.filter { case (k, _) => live.contains(k) }
  }

  /** Schema-evolution commit: no data movement; the new schema is recomputed
    * from the current parent on every retry so evolution composes with
    * concurrent appends.
    */
  def evolveSchema(op: String, schemaFn: StructType => StructType, operation: String): Snapshot =
    commitWithRetry { parent =>
      val p = parent.getOrElse(throw new IllegalStateException("evolve on empty table"))
      val newSchema = schemaFn(DataType.fromJson(p.schemaJson).asInstanceOf[StructType])
      Snapshot(p.snapshotId + 1, Some(p.snapshotId), clock(), operation, newSchema.json,
        p.partitionCols, p.files, Map.empty, List(op),
        schemasFor(p.files, p.schemas),
        p.chain :+ EvolutionStep(p.snapshotId + 1, List(op)), p.deletes)
    }

  /** Column shape (names + types, order- and nullability-insensitive) used to
    * detect a schema change between writing data files and committing them.
    */
  private def shapeOf(s: StructType): Set[(String, DataType)] =
    s.fields.map(f => (f.name, f.dataType)).toSet

  /** Driver-side metadata time of the LAST data commit on this instance:
    * everything after the executor write returns — snapshot build, delta
    * encode, atomic publish, retries. The bench reports it separately from
    * the write so the O(files) driver planning cost is visible at scale.
    */
  @volatile private[graft] var lastCommitNanos: Long = 0L

  private def commitData(df: DataFrame, operation: String, parentFiles: Boolean,
      sortCols: Seq[String] = Nil, extraSummary: Map[String, String] = Map.empty,
      basedOn: Option[Snapshot] = None,
      preCommit: Option[Snapshot] => Unit = _ => ()): Snapshot = {
    val writeShape = shapeOf(df.schema)
    // Fail a genuinely mis-shaped write BEFORE any data lands; the in-retry
    // check below then only ever fires for a true evolution race.
    snapshotsList.lastOption.foreach { p =>
      val cur = shapeOf(DataType.fromJson(p.schemaJson).asInstanceOf[StructType])
      require(cur == writeShape,
        s"$operation schema does not match table $tableDir: " +
          s"writing ${writeShape.toSeq.sortBy(_._1).mkString(", ")} " +
          s"into ${cur.toSeq.sortBy(_._1).mkString(", ")}")
    }
    val written = writeDataFiles(df,
      snapshotsList.lastOption.map(_.snapshotId + 1).getOrElse(1L), sortCols)
    val commitT0 = System.nanoTime()
    // On ANY commit abort (preCommit fence, basedOn pin, evolution race) the
    // staged files were never published — delete them instead of leaving
    // orphans for the grace-period GC to find days later.
    def dropWritten(): Unit = {
      val dataRoot = SnapshotLog.dataPath(tableDir)
      written.foreach(e => scala.util.Try(
        hfs.delete(new org.apache.hadoop.fs.Path(dataRoot, e.path), false)))
    }
    try commitWithRetry { parent =>
      preCommit(parent)
      basedOn.foreach { pinned =>
        if (parent.map(_.snapshotId).getOrElse(0L) != pinned.snapshotId)
          throw new java.util.ConcurrentModificationException(
            s"table advanced to ${parent.map(_.snapshotId)} since $operation " +
              s"planned at ${pinned.snapshotId} in $tableDir")
      }
      val id = parent.map(_.snapshotId + 1).getOrElse(1L)
      val keep = if (parentFiles) parent.map(_.files).getOrElse(Nil) else Nil
      val schemaJson = parent.map(_.schemaJson).getOrElse(df.schema.json)
      // If a concurrent evolveSchema won the race between writeDataFiles and
      // this commit attempt, the parent schema no longer matches the bytes we
      // physically wrote — registering the files under the NEW schema would
      // read renamed/added columns as wrong/NULL. Abort instead (the caller
      // re-appends against the evolved table).
      parent.foreach { p =>
        val cur = DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
        if (shapeOf(cur) != writeShape)
          throw new java.util.ConcurrentModificationException(
            s"schema of $tableDir evolved concurrently with an append: " +
              s"files were written as ${writeShape.toSeq.sortBy(_._1).mkString(", ")} " +
              s"but the table is now ${shapeOf(cur).toSeq.sortBy(_._1).mkString(", ")}")
      }
      // writtenAt follows the final id so evolution replay resolves the right
      // write-time schema (the shape check above rejects the only way the
      // final id's schema could differ from the write-time schema)
      val files = (keep ++ written.map(_.copy(writtenAt = id))).toList
      // append keeps the parent's equality deletes (they apply only to files
      // with writtenAt below their commit, never the rows appended here); a
      // full overwrite replaces all content, so deletes reset with it
      val deletes = if (parentFiles) parent.map(_.deletes).getOrElse(Nil) else Nil
      Snapshot(id, parent.map(_.snapshotId), clock(), operation, schemaJson,
        parent.map(_.partitionCols).getOrElse(Nil), files,
        extraSummary + ("added-files" -> written.size.toString), Nil,
        schemasFor(files,
          parent.map(_.schemas).getOrElse(Map.empty) + (id.toString -> schemaJson)),
        parent.map(_.chain).getOrElse(Nil), deletes)
    } catch {
      case e: Throwable => dropWritten(); throw e
    } finally lastCommitNanos = System.nanoTime() - commitT0
  }

  /** D8 — partition evolution (spec ICEBERG-Interoperability-Test-Spec.md:79):
    * rewrite the current data under a new partition layout and record the new
    * partition columns in the snapshot. Data content is unchanged.
    */
  def evolvePartitioning(newPartitionCols: Seq[String]): Snapshot = {
    val planned = latest
    val written = writeDataFiles(readLatest(), planned.snapshotId + 1,
      partColsOverride = Some(newPartitionCols))
    commitWithRetry { parent =>
      val p = parent.getOrElse(throw new IllegalStateException("evolve on empty table"))
      if (p.snapshotId != planned.snapshotId)
        throw new java.util.ConcurrentModificationException(
          s"table advanced to ${p.snapshotId} since partition evolution planned at ${planned.snapshotId}")
      Snapshot(p.snapshotId + 1, Some(p.snapshotId), clock(), "evolve-partitioning",
        p.schemaJson, newPartitionCols.toList, written.toList,
        Map("added-files" -> written.size.toString), Nil,
        Map((p.snapshotId + 1).toString -> p.schemaJson), p.chain)
    }
  }

  /** Write df under data/<uuid>/ (hive-partitioned if the table is), return
    * the new file entries with per-file row counts from the parquet footers.
    */
  private def writeDataFiles(df: DataFrame, snapshotId: Long,
      sortCols: Seq[String] = Nil,
      partColsOverride: Option[Seq[String]] = None,
      advisoryOverride: Option[Long] = None): Seq[FileEntry] = {
    val parent = snapshotsList.lastOption
    val partCols = partColsOverride.map(_.toList)
      .getOrElse(parent.map(_.partitionCols).getOrElse(Nil))
    val commitDirName = f"c$snapshotId%08d-${java.util.UUID.randomUUID().toString.take(8)}"
    val dataRoot = SnapshotLog.dataPath(tableDir)
    val commitDir = new org.apache.hadoop.fs.Path(dataRoot, commitDirName)
    // write.distribution-mode=hash (ref framework.yaml:139): cluster rows by
    // partition columns before a partitioned write, else every task emits a
    // file per partition value — task-count × partition-count tiny files.
    // REBALANCE, not plain repartition, is the target-file-size half of the
    // story: hash repartitioning maps every partition VALUE to exactly one
    // task — one file per value per commit regardless of size, so a hot
    // partition at 100 TB becomes one multi-GB single-task file. The AQE
    // rebalance keeps the same single shuffle and the same value clustering,
    // but splits shuffle partitions past
    // `spark.sql.adaptive.advisoryPartitionSizeInBytes` and coalesces tiny
    // ones — bounded file sizes AND write parallelism on skewed partitions
    // (the Iceberg `write.target-file-size-bytes` + hash-distribution pair).
    val props = properties
    // Transform partitioning (the Iceberg `days(ts)`-style partition spec,
    // recorded by the SQL CREATE TABLE bridge): a partition column missing
    // from the frame derives from its source column here, so writers hand in
    // LOGICAL rows and the layout stays transform-partitioned. Reads drop
    // the derived column automatically (it is not in the logical schema).
    val transformDefs: Map[String, GraftTable.TransformDef] =
      GraftTable.parseTransforms(props).map(td => td.pc -> td).toMap
    val withDerived = partCols.filterNot(df.columns.contains).foldLeft(df) { (d, pc) =>
      transformDefs.get(pc) match {
        case Some(td) => d.withColumn(pc, GraftTable.transformColumn(td, d.schema))
        case None => throw new IllegalArgumentException(
          s"partition column $pc is not in the data and has no derivable transform")
      }
    }
    val distributed =
      if (partCols.nonEmpty) withDerived.hint("rebalance", partCols: _*) else df
    // Per-call sort wins; otherwise the sticky `write.sort-order` property
    // (the Iceberg WRITE ORDERED BY table setting) applies to every append,
    // so a clustered table stays clustered without each writer remembering —
    // within-file ordering is what narrows per-file min/max bounds and makes
    // stats pruning bite.
    val effectiveSort =
      if (sortCols.nonEmpty) sortCols
      else props.get(SortOrderProp)
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    // For a PARTITIONED write the sort must lead with the partition columns:
    // FileFormatWriter requires partition-column ordering for dynamic
    // partition writes and would otherwise insert its own NON-STABLE sort by
    // them above this one, scrambling the requested order inside each file
    // (WriteDistributionSpec pins this). With the prefix, the task ordering
    // (p..., sort...) satisfies the writer's requirement as-is, and every
    // emitted file — one per (task, partition value) — is sorted as asked.
    val sorted =
      if (effectiveSort.nonEmpty)
        distributed.sortWithinPartitions(
          (partCols.filterNot(effectiveSort.contains) ++ effectiveSort).map(col): _*)
      else distributed
    // Table data files pin TIMESTAMP_MICROS for the write: INT96 (Spark's
    // session default) carries no parquet min/max statistics, which would
    // silently exempt timestamp columns from stats pruning. Scoped to table
    // writes — the session default stays untouched for other writers.
    val tsConfKey = "spark.sql.parquet.outputTimestampType"
    val prevTsType = spark.conf.get(tsConfKey)
    spark.conf.set(tsConfKey, "TIMESTAMP_MICROS")
    // `write.target-file-size-bytes` (the Iceberg write knob the reference
    // configures, blob-dfs_bench.py / framework.yaml): the rebalance splits
    // on SHUFFLE bytes, but parquet encodes several-fold smaller — without
    // compensation a 64 MB advisory lands ~8-15 MB files, which at 100 TB
    // is millions of undersized files. Advisory = target x the estimated
    // shuffle-to-parquet ratio (`write.shuffle-compression-factor`,
    // default 2.0 — conservative; oversizing a split is corrected by the
    // next compaction, undersizing never is).
    val advisoryKey = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    // explicit caller override (a maintenance procedure's target argument)
    // WINS over the table property — Iceberg's procedure-option precedence
    val targetAdvisory = advisoryOverride.orElse(
      props.get(TargetFileSizeProp)
        .flatMap(s => scala.util.Try(s.toLong).toOption)
        .map { target =>
          val factor = props.get(ShuffleCompressionFactorProp)
            .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(2.0)
          math.max(1L, (target * factor).toLong)
        })
    val prevAdvisory = targetAdvisory.map(_ => spark.conf.getOption(advisoryKey))
    targetAdvisory.foreach(v => spark.conf.set(advisoryKey, v.toString))
    try {
      var writer = sorted.write.mode("errorifexists")
      // Bloom filters on configured key columns (table property; the Iceberg
      // write.parquet.bloom-filter-enabled analog): row-group-level point-
      // lookup skipping that min/max bounds cannot provide for
      // uniformly-spread keys. Write-side only — Spark's vectorized parquet
      // reader consults the filters automatically on pushed-down equality.
      val bloomCols = props.get(BloomFilterColumnsProp)
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
      bloomCols.foreach { c =>
        writer = writer.option(s"parquet.bloom.filter.enabled#$c", "true")
        props.get(BloomFilterNdvProp).foreach(ndv =>
          writer = writer.option(s"parquet.bloom.filter.expected.ndv#$c", ndv))
      }
      (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
        .parquet(commitDir.toString)
    } finally {
      spark.conf.set(tsConfKey, prevTsType)
      prevAdvisory.foreach {
        case Some(v) => spark.conf.set(advisoryKey, v)
        case None => spark.conf.unset(advisoryKey)
      }
    }
    // Publish the staged files into the SHARED hive layout directly under
    // data/ (partition dirs common to all commits, part-file names unique per
    // write job). One layout for every commit means a read over files from
    // any number of commits is a single discovery-clean scan — per-commit
    // subdirectories broke Spark's partition discovery (conflicting
    // directory structures) as soon as one scan spanned two commits.
    val commitStr = hfs.makeQualified(commitDir).toString
    val staged = listParquetFiles(commitDir)
    // Stats collection site (VERDICT r8 ask #5): at or past the threshold,
    // publication + footer stats run as a SPARK JOB — each task renames its
    // file and reads its own footer, returning one FileEntry (the Iceberg
    // writer design: per-file metrics ride the tasks; the driver only
    // collects O(files) bounded metadata). Below it, a 16-way driver loop —
    // cheaper than a job for a handful of local files. Both sites produce
    // IDENTICAL entries (TaskStatsSpec proves it), so the choice is pure
    // cost, and the old 100k-file driver ceiling is retired on the task
    // path: commit cost now scales with cluster width.
    val threshold = props.get(GraftTable.TaskStatsThresholdProp)
      .flatMap(s => scala.util.Try(s.toInt).toOption)
      .getOrElse(GraftTable.TaskStatsThresholdDefault)
    val entries: Seq[FileEntry] =
      if (staged.size >= threshold) {
        val confEntries = {
          import scala.jdk.CollectionConverters._
          conf.iterator().asScala.map(e => e.getKey -> e.getValue).toArray
        }
        val dataRootStr = dataRoot.toString
        val sc = spark.sparkContext
        val stagedStrs = staged.map(_.toString)
        val snapId = snapshotId
        sc.parallelize(stagedStrs, math.max(1, math.min(stagedStrs.size, sc.defaultParallelism)))
          .map(s => GraftTable.publishAndStat(confEntries, dataRootStr, commitStr, s, snapId))
          .collect().toSeq.sortBy(_.path)
      } else {
        GraftTable.footerStatsWarning(staged.size.toLong)
          .foreach(w => System.err.println(s"[graft.table] $w"))
        import scala.collection.parallel.CollectionConverters._
        val par = staged.par
        par.tasksupport = new scala.collection.parallel.ForkJoinTaskSupport(
          new java.util.concurrent.ForkJoinPool(16))
        try {
          par.map { staged =>
            val rel = GraftTable.uniqueLeafName(
              hfs.makeQualified(staged).toString.stripPrefix(commitStr).stripPrefix("/"),
              snapshotId)
            val dest = new org.apache.hadoop.fs.Path(dataRoot, rel)
            hfs.mkdirs(dest.getParent)
            require(hfs.rename(staged, dest), s"could not publish $staged to $dest")
            val partVals = rel.split("/").dropRight(1).filter(_.contains("="))
              .map { seg => val Array(k, v) = seg.split("=", 2); k -> v }.toMap
            val status = hfs.getFileStatus(dest)
            val (rows, stats) = footerMeta(dest)
            FileEntry(rel, partVals, rows, status.getLen, snapshotId, stats)
          }.seq.sortBy(_.path)
        } finally par.tasksupport.asInstanceOf[scala.collection.parallel.ForkJoinTaskSupport]
          .forkJoinPool.shutdown()
      }
    hfs.delete(commitDir, true)
    // A provably EMPTY part-file (a task whose split held no rows — e.g. a
    // filtered write's empty partition) never enters the snapshot: it holds
    // no data, carries no stats, and a statless entry would block every
    // all-files metadata answer (min/max, non-null counts) for the whole
    // table. Unknown counts (-1) are NOT empty and stay.
    val (kept, empty) = entries.partition(_.rowCount != 0L)
    empty.foreach(e =>
      hfs.delete(new org.apache.hadoop.fs.Path(dataRoot, e.path), false))
    kept
  }

  private def listParquetFiles(dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
    val it = hfs.listFiles(dir, true)
    val out = scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.Path]()
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getPath.getName.endsWith(".parquet")) out += s.getPath
    }
    out.toSeq
  }

  private def footerMeta(p: org.apache.hadoop.fs.Path)
      : (Long, Map[String, List[String]]) = GraftTable.footerMeta(conf, p)

  /** Columns of a data file that carry a parquet bloom filter (first row
    * group; one footer probe) — the observable for bloom-filter specs and
    * driver entries.
    */
  def bloomFilterColumns(relPath: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(SnapshotLog.dataPath(tableDir), relPath)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
    try {
      import scala.jdk.CollectionConverters._
      val block = reader.getFooter.getBlocks.asScala.head
      val bfr = reader.getBloomFilterDataReader(block)
      block.getColumns.asScala
        .filter(c => bfr.readBloomFilter(c) != null)
        .map(_.getPath.toDotString).toSet
    } finally reader.close()
  }

  /** Create-only commit: the v1 doc must not exist; a conflict means the
    * table was created concurrently and is an error, never a retry.
    */
  private[table] def commitCreate(schemaJson: String, partitionCols: List[String]): Snapshot = {
    val snap = Snapshot(1L, None, clock(), "create", schemaJson, partitionCols,
      Nil, Map.empty, Nil)
    require(SnapshotLog.commit(conf, tableDir, snap), s"table already exists at $tableDir")
    snap
  }

  /** Injectable commit clock (tests pin it for deterministic time travel). */
  var clock: () => Long = () => System.currentTimeMillis()
}

object GraftTable {

  /** Summary-key prefix for a streaming WAP sink's durable batch id, scoped
    * by branch name (`staged-stream-batch-id:<branch>`). Branch scoping is
    * load-bearing twice over: a fresh branch head IS the base main snapshot
    * verbatim, so an UNSCOPED key would inherit the main table sink's
    * `stream-batch-id` and silently discard staged batches; and two branches
    * fed by independent streams (ids both restarting at 0) must not dedupe
    * against each other. `publishBranch` copies keys with this prefix into
    * the main commit summary so the id chain survives the branch drop.
    */
  val StagedStreamKeyPrefix = "staged-stream-batch-id:"

  /** Prefix under which maintenance commits carry idempotence fences
    * forward (see `carriedFences`); fence readers max over both the
    * primary key and this carried form.
    */
  val CarriedFencePrefix = "carried:"

  /** Accessors for the versioned per-column stats list in `FileEntry.stats`,
    * disambiguated STRUCTURALLY by length (no in-band sentinel — any string
    * is a legal rendered bound): `[min, max]` (legacy docs), `[min, max,
    * nullCount]` (full), `[nullCount]` alone (null count known, bounds
    * absent — an all-null file OR a NaN-poisoned float chunk). Every reader
    * goes through these, so either format prunes soundly and unknown fields
    * stay conservative.
    */
  private[table] object StatEntry {
    def bounds(l: List[String]): Option[(String, String)] = l match {
      case mn :: mx :: _ => Some((mn, mx))
      case _ => None
    }
    def nullCount(l: List[String]): Option[Long] = l match {
      case List(nc) => scala.util.Try(nc.toLong).toOption
      case List(_, _, nc) => scala.util.Try(nc.toLong).toOption
      case _ => None
    }
    /** Provably all-null: the recorded null count equals the file's row
      * count. NEVER inferred from bounds being absent — a NaN-poisoned
      * float chunk also has a known null count with no bounds (parquet
      * drops min/max when NaN appears), and its NaN rows are non-null.
      */
    def allNull(l: List[String], rowCount: Long): Boolean =
      rowCount >= 0 && nullCount(l).contains(rowCount)
  }

  /** Helper-column name carrying each row's part-file name during a
    * merge-on-read read (dropped before the result surfaces).
    */
  private[graft] val WrittenAtCol = "_gf_file"

  /** Helper-column name carrying each row's position within its part file
    * (parquet `_metadata.row_index`) during a positional merge-on-read read.
    * Also the position column INSIDE a delete-vector file, whose schema is
    * exactly (`_gf_file` string part-file name, `_gf_pos` long row index).
    */
  private[graft] val PosCol = "_gf_pos"

  /** Ceiling on the RECORDED bytes of positional delete vectors forced into
    * a broadcast by the MOR read path; larger unions fall back to a shuffled
    * anti-join (64 MB of snappy parquet ≈ a few hundred MB of in-memory
    * (string, long) hash relation — near Spark's own 8 GB broadcast wall
    * once driver+executor copies are counted).
    */
  private[table] val DvBroadcastMaxBytes = 64L * 1024 * 1024

  /** Directory under `data/` holding equality-delete files. */
  private[table] val DeletesDir = "_deletes"

  /** Tag names: filesystem- and JSON-safe. */
  private[table] val TagNameRe = "[A-Za-z0-9._-]{1,128}".r
  private[table] val TagFileRe = "tag-([A-Za-z0-9._-]{1,128})\\.json".r
  private[table] val BranchFileRe = "branch-([A-Za-z0-9._-]{1,128})-(\\d+)\\.json".r
  private[table] val PropsFileRe = "props-(\\d+)\\.json".r

  /** Property: comma-separated columns that get a parquet bloom filter in
    * every data file written after the property is set (the Iceberg
    * `write.parquet.bloom-filter-enabled.column.<col>` analog). Point
    * lookups on these columns then skip row groups whose bloom excludes the
    * key — min/max bounds cannot do that for uniformly-spread keys.
    */
  val BloomFilterColumnsProp = "write.parquet.bloom-filter-columns"

  /** Property: expected distinct values per bloom-filtered column (sizes the
    * filter; parquet-mr's default otherwise).
    */
  val BloomFilterNdvProp = "write.parquet.bloom-filter-ndv"

  /** Property: comma-separated columns every append sorts within partitions
    * by (sticky `WRITE ORDERED BY` — the Iceberg sort-order setting). A
    * per-call sort argument overrides it.
    */
  val SortOrderProp = "write.sort-order"

  /** Iceberg's `write.delete.mode`: `copy-on-write` (default) rewrites
    * matched files; `merge-on-read` commits an equality-delete file keyed by
    * the table's declared identifier columns.
    */
  val DeleteModeProp = "write.delete.mode"
  val UpdateModeProp = "write.update.mode"
  val MergeModeProp = "write.merge.mode"

  /** Comma-separated identifier columns (the Iceberg identifier-field
    * analog) — the equality-delete key tuple for merge-on-read DML.
    */
  val IdentifierColumnsProp = "write.identifier-columns"

  /** How merge-on-read DML records its deletes: `equality` (default — key
    * tuples on the identifier columns, the Flink-CDC shape) or `positional`
    * (delete VECTORS of (part-file name, row position) tuples, the Iceberg
    * v3 deletion-vector shape). Positional needs no identifier columns and
    * never over-deletes on a non-unique key: it names exactly the matched
    * rows, and a position can never match a later file (files are
    * immutable, re-inserts land in new files), so reads skip the
    * applicability bound entirely — one broadcast anti-join on
    * (file, pos).
    */
  val DeleteRepresentationProp = "write.delete.representation"

  /** ANALYZE output (`analyzeColumns`): table-level row count / snapshot id
    * plus per-column `stats.col.<name>.{ndv,nulls,min,max}`.
    */
  val StatsRowCountProp = "stats.row-count"
  val StatsSnapshotProp = "stats.snapshot-id"
  val StatsColPrefix = "stats.col."
  /** Iceberg's `write.target-file-size-bytes`: when set, partitioned writes
    * size their rebalance splits to land parquet files near this target
    * (advisory = target × [[ShuffleCompressionFactorProp]]).
    */
  val TargetFileSizeProp = "write.target-file-size-bytes"

  /** Estimated-size ceiling for a single-file delete-vector write; above
    * it, [[GraftTable.writeDeleteFile]] shards the vector across tasks
    * (one file per shard) instead of funneling through `coalesce(1)`.
    * Overridable via system property only so a spec can exercise the
    * sharded path without materializing 64 MB of keys.
    */
  private[table] def DeleteShardBytes: Long =
    sys.props.get("graft.test.delete-shard-bytes").map(_.toLong)
      .getOrElse(64L * 1024 * 1024)
  val ShuffleCompressionFactorProp = "write.shuffle-compression-factor"

  /** Property: semicolon-separated partition transforms,
    * `fn(srcCol)=partCol` or `fn(N,srcCol)=partCol` each (e.g.
    * `days(event_ts)=event_ts_day`, `bucket(16,tenant_id)=tenant_bucket`,
    * `truncate(8,sku)=sku_prefix`) — the Iceberg transform-partition-spec
    * analog. `writeDataFiles` derives the partition column from the source
    * column when the frame lacks it; `planBetween` prunes files from the
    * recorded transform values (time granularities bound, prefixes bound,
    * buckets pin point lookups).
    */
  val PartitionTransformsProp = "write.partition-transforms"
  private[table] val PartitionTransformRe =
    """(\w+)\((?:(\d+)\s*,\s*)?([\w.]+)\)=([\w.]+)""".r

  /** One recorded partition transform (`fn(src)=pc` / `fn(arg,src)=pc`). */
  private[graft] case class TransformDef(
      fn: String, arg: Option[Int], src: String, pc: String)

  private[graft] def parseTransforms(props: Map[String, String]): Seq[TransformDef] =
    props.get(PartitionTransformsProp).map(_.split(";").toSeq.flatMap {
      case PartitionTransformRe(fn, arg, src, pc) =>
        Some(TransformDef(fn, Option(arg).map(_.toInt), src, pc))
      case _ => None
    }).getOrElse(Nil)

  /** The derivation expression for a transform partition column — the write
    * side of the transform contract (the scan side is `planBetween`'s
    * transform pass, which MUST invert exactly what is derived here).
    *
    * Time granularities derive from the UTC instant for `TimestampType`
    * (session-timezone-FREE: `to_date` under the writer's session zone was
    * the advisor's silent-prune case — a file written under a non-UTC
    * session and day-pruned under UTC could straddle the recorded day) and
    * from the wall clock for NTZ/date, which have no zone to begin with.
    * The double division below is exact to ±2^53 µs (~±285 years of epoch),
    * far beyond any stats-bearing parquet value this engine writes.
    *
    * `hours` derives an epoch-hour LONG (not a truncated timestamp): hive
    * layout URL-escapes `:` in directory values, which would make the
    * recorded value unreadable to the scan planner.
    *
    * `bucket(N)` is `pmod(murmur3(col), N)` — `functions.hash` and the scan
    * side's `bucketOf` share one hash (seed 42) by construction.
    */
  private[table] def transformColumn(td: TransformDef, schema: StructType): Column = {
    import org.apache.spark.sql.types._
    val f = schema.find(_.name == td.src).getOrElse(throw new IllegalArgumentException(
      s"transform source column ${td.src} is not in the data"))
    val c = col(td.src)
    def utcDate: Column = f.dataType match {
      case TimestampType => date_from_unix_date(
        floor(unix_micros(c) / lit(86400000000.0)).cast("int"))
      case TimestampNTZType => to_date(c)
      case DateType => c
      case other => throw new IllegalArgumentException(
        s"${td.fn}() partition transform needs a time-typed source, got $other")
    }
    td.fn match {
      case "days" => utcDate
      case "months" => trunc(utcDate, "month")
      case "years" => trunc(utcDate, "year")
      case "hours" => f.dataType match {
        case TimestampType => floor(unix_micros(c) / lit(3600000000.0)).cast("long")
        case TimestampNTZType =>
          unix_date(to_date(c)).cast("long") * lit(24L) + hour(c).cast("long")
        case other => throw new IllegalArgumentException(
          s"hours() partition transform needs a timestamp source, got $other")
      }
      case "bucket" =>
        val n = td.arg.getOrElse(throw new IllegalArgumentException(
          "bucket transform needs a bucket count: bucket(N,col)=pc"))
        // NOTE: uses Spark's murmur3 seed-42 `hash()`, not the Iceberg
        // bucket-transform spec (murmur3_x86_32 over each type's defined
        // byte layout). Write and scan sides share this derivation (see
        // bucketOf), so pruning is sound — but a bucket(N,col) table lays
        // rows out in DIFFERENT buckets than a spec-compliant engine would;
        // no cross-engine physical-layout compatibility is claimed.
        pmod(hash(c), lit(n))
      case "truncate" =>
        val n = td.arg.getOrElse(throw new IllegalArgumentException(
          "truncate transform needs a width: truncate(N,col)=pc"))
        f.dataType match {
          case StringType => substring(c, 1, n)
          // the Iceberg integer truncate: v - (v mod W), floor semantics
          // (pmod keeps the remainder non-negative, so -7 truncates to -10
          // at W=10, never toward zero)
          case ByteType | ShortType | IntegerType | LongType =>
            (c - pmod(c, lit(n))).cast(f.dataType)
          case other => throw new IllegalArgumentException(
            s"truncate partition transform needs a string or integral source, got $other")
        }
      case other => throw new IllegalArgumentException(
        s"unknown partition transform $other")
    }
  }

  /** The bucket a point value hashes to under `bucket(n)` — the scan-side
    * inverse of `transformColumn`'s `pmod(hash(col), n)`. Returns None
    * unless the value is PROVABLY in the column's external domain (an Int
    * widened to a Long column is the one coercion accepted): hashing a
    * lookalike (a numeric string, a narrowed long) yields a DIFFERENT
    * bucket and would silently drop the matching file. None = keep.
    */
  private[table] def bucketOf(dt: DataType, v: Any, n: Int): Option[Int] = {
    import org.apache.spark.sql.types._
    val exact: Option[Any] = (dt, v) match {
      case (LongType, x: Long) => Some(x)
      case (LongType, x: Int) => Some(x.toLong)
      case (IntegerType, x: Int) => Some(x)
      case (StringType, x: String) => Some(x)
      case _ => None
    }
    exact.flatMap { x =>
      scala.util.Try {
        val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(x, dt)
        val h = new org.apache.spark.sql.catalyst.expressions.Murmur3Hash(Seq(lit))
          .eval(null).asInstanceOf[Int]
        Math.floorMod(h, n)
      }.toOption
    }
  }

  /** Smallest string strictly greater than every string with prefix `s`
    * (the exclusive upper bound of `truncate`'s `[prefix, next)` row
    * domain): increment the rightmost non-max char, drop the tail. None
    * when every char is Char.MaxValue — the domain is unbounded above,
    * callers must keep.
    */
  private[table] def nextPrefix(s: String): Option[String] = {
    val i = s.lastIndexWhere(_ != Char.MaxValue)
    if (i < 0) None else Some(s.substring(0, i) + (s.charAt(i) + 1).toChar)
  }

  /** Forward-map a column name recorded at snapshot `since` to its name at
    * `snap` by replaying renames committed in (since, snap] — the inverse
    * direction of `writeTimeName` (which maps a CURRENT name back to
    * write-time). Used to resolve equality-delete key columns recorded
    * before a rename. An `add` op can never capture the tracked name: the
    * name existed at `since`, so an add of the same string is only legal
    * after a rename moved the tracked column away — which this replay
    * follows first.
    */
  private[table] def currentName(snap: Snapshot, name: String, since: Long): String = {
    implicit val fmts: org.json4s.Formats = SnapshotLog.formats
    snap.chain
      .filter(st => st.snapshotId > since && st.snapshotId <= snap.snapshotId)
      .flatMap(_.ops)
      .foldLeft(name) { (cur, op) =>
        val m = org.json4s.jackson.JsonMethods.parse(op).extract[Map[String, String]]
        if (m.getOrElse("op", "?") == "rename" && m("from") == cur) m("to") else cur
      }
  }

  /** S5 — CREATE TABLE with partition columns (ref create_sales_events.sql:1-19).
    * Partition transforms map to derived columns the caller adds before append.
    */
  def create(spark: SparkSession, dir: String, schema: StructType,
      partitionCols: Seq[String] = Nil,
      properties: Map[String, String] = Map.empty): GraftTable = {
    val conf = spark.sessionState.newHadoopConf()
    require(SnapshotLog.load(conf, dir).isEmpty, s"table already exists at $dir")
    val t = new GraftTable(spark, dir)
    t.commitCreate(schema.json, partitionCols.toList)
    if (properties.nonEmpty)
      t.setProperties(properties.map { case (k, v) => k -> Some(v) })
    t
  }

  def load(spark: SparkSession, dir: String): GraftTable = {
    val t = new GraftTable(spark, dir)
    require(t.snapshotsList.nonEmpty, s"no table at $dir")
    t
  }

  def exists(spark: SparkSession, dir: String): Boolean =
    SnapshotLog.load(spark.sessionState.newHadoopConf(), dir).nonEmpty

  /** D7 — DESCRIBE TABLE as a DataFrame (ref schema_evolution_sales_events.sql:12). */
  def describe(spark: SparkSession, t: GraftTable): DataFrame = {
    import spark.implicits._
    t.schema.fields.map(f => (f.name, f.dataType.simpleString))
      .toSeq.toDF("col_name", "data_type")
  }

  /** Evolution-op encoding shared with SnapshotLog docs — JSON objects, so
    * column names, DDL types (`struct<a:int>`), and default values may contain
    * any character without corrupting committed metadata.
    *
    * Encoding note: since the round-10 build, `add` ops OMIT the `default`
    * key for no-default columns; a present `default` (including the empty
    * string) always replays as the declared literal. Op logs written by
    * earlier builds encoded no-default as `"default":""` — loading such a
    * table under this build replays '' instead of NULL for those columns
    * (no such tables exist in this environment; every run creates fresh).
    */
  def addColumnOp(name: String, dataType: String, default: Option[String]): String =
    writeOp(Map("op" -> "add", "name" -> name, "dataType" -> dataType) ++
      default.map("default" -> _))
  def renameColumnOp(from: String, to: String): String =
    writeOp(Map("op" -> "rename", "from" -> from, "to" -> to))
  def widenColumnOp(name: String, newType: String): String =
    writeOp(Map("op" -> "widen", "name" -> name, "dataType" -> newType))
  def dropColumnOp(name: String): String =
    writeOp(Map("op" -> "drop", "name" -> name))

  private def writeOp(m: Map[String, String]): String =
    org.json4s.jackson.Serialization.write(m)(SnapshotLog.formats)

  /** Row count + per-column `[min, max, nullCount]` stats from the parquet
    * footer — one footer open serves all. Bounds are merged across row
    * groups; a column's BOUNDS drop out if any row group carries no
    * statistics (conservative: absent = never pruned), while its null count
    * (the Iceberg `null_value_counts` analog — IS NULL pruning, metadata
    * COUNT(col)) survives independently as long as every row group reports
    * one. A file with a known null count but no bounds (all-null, or a
    * NaN-poisoned float chunk) keeps `[n]` — see `StatEntry`, whose
    * `allNull` requires `n == rowCount`, never shape alone. Binary (string)
    * stats may be writer-truncated, but truncation only ever WIDENS the
    * bound, so pruning against them stays sound. Only top-level primitive
    * columns are tracked — nested paths (`a.b`) and logical types beyond
    * int/float/string have engine-specific orderings and are skipped.
    *
    * Static (conf passed in) so the WRITE TASKS can harvest stats for the
    * files they publish (`publishAndStat`) — the Iceberg writer design,
    * where per-file metrics ride the task result instead of a driver-side
    * footer sweep.
    */
  private[table] def footerMeta(conf: org.apache.hadoop.conf.Configuration,
      p: org.apache.hadoop.fs.Path): (Long, Map[String, List[String]]) = {
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        val mins = scala.collection.mutable.Map[String, Comparable[Any]]()
        val maxs = scala.collection.mutable.Map[String, Comparable[Any]]()
        val nulls = scala.collection.mutable.Map[String, Long]()
        val invalid = scala.collection.mutable.Set[String]()
        val noNulls = scala.collection.mutable.Set[String]() // null count unusable
        for (block <- reader.getFooter.getBlocks.asScala;
             c <- block.getColumns.asScala) {
          val name = c.getPath.toDotString
          if (!name.contains('.') && statsComparable(c)) {
            val st = c.getStatistics
            if (st == null || st.isEmpty) {
              invalid += name; mins -= name; maxs -= name
              noNulls += name; nulls -= name
            } else {
              if (!noNulls(name)) {
                if (st.isNumNullsSet) nulls(name) = nulls.getOrElse(name, 0L) + st.getNumNulls
                else { noNulls += name; nulls -= name }
              }
              if (!invalid(name) && st.hasNonNullValue) {
                val mn = st.genericGetMin.asInstanceOf[Comparable[Any]]
                val mx = st.genericGetMax.asInstanceOf[Comparable[Any]]
                if (mins.get(name).forall(_.compareTo(mn) > 0)) mins(name) = mn
                if (maxs.get(name).forall(_.compareTo(mx) < 0)) maxs(name) = mx
              } // all-null row group: bounds unaffected
            }
          }
        }
        val keys = mins.keySet ++ nulls.keySet
        val stats = keys.flatMap { k =>
          val bounds =
            if (mins.contains(k)) List(renderStat(mins(k)), renderStat(maxs(k))) else Nil
          val entry = bounds ++ nulls.get(k).map(_.toString).toList
          if (entry.isEmpty) None else Some(k -> entry)
        }.toMap
        (reader.getRecordCount, stats)
      } finally reader.close()
    } catch { case _: Throwable => (-1L, Map.empty) }
  }

  /** Track only parquet primitives whose min/max ordering matches the engine's:
    * plain int32/int64/float/double and UTF8-annotated binary. Logical types
    * riding on these primitives (DATE on int32, TIMESTAMP on int64, nanos-as-
    * long) order identically to their physical values, so they stay prunable.
    * DECIMAL's unscaled-int ordering only matches within one scale — fine for
    * a single column written by this table, which has one schema per file.
    */
  private def statsComparable(c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Boolean = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    c.getPrimitiveType.getPrimitiveTypeName match {
      case INT32 | INT64 | FLOAT | DOUBLE => true
      case BINARY =>
        c.getPrimitiveType.getLogicalTypeAnnotation ==
          org.apache.parquet.schema.LogicalTypeAnnotation.stringType()
      case _ => false
    }
  }

  private def renderStat(v: Comparable[Any]): String = (v: Any) match {
    case b: org.apache.parquet.io.api.Binary => b.toStringUsingUTF8
    case other => other.toString
  }

  /** Task-side file publication + stats harvest (the ask-#5 path): rename
    * one staged file into the shared layout and read its footer, ON AN
    * EXECUTOR. The driver ships (conf entries, roots, staged path) and gets
    * back one `FileEntry` — it never opens a footer itself, so commit cost
    * scales with cluster width instead of driver round-trips. Idempotent
    * under task retry: a rename that fails because a previous attempt
    * already published (staged gone, dest present) is success.
    */
  /** Published leaf names must be GLOBALLY unique across partition dirs:
    * Spark's dynamic-partition write emits the SAME `part-<task>-<jobUuid>`
    * basename into every partition dir a task touches, and merge-on-read
    * delete applicability keys rows to their file by BASENAME
    * (`input_file_name()` is URI-escaped, so full paths don't join
    * reliably against partition dirs holding escaped characters). Prefix
    * the leaf with the commit id and a short hash of the commit-relative
    * path — deterministic on the task publish path, unique within a commit
    * (relative paths are), while the job uuid keeps names unique across
    * commits. Same rule `addFiles` already applies to imports.
    */
  private[table] def uniqueLeafName(rel: String, snapshotId: Long): String = {
    val segs = rel.split('/')
    val h = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(rel))
    (segs.dropRight(1) :+ f"c$snapshotId%x-$h-${segs.last}").mkString("/")
  }

  private[table] def publishAndStat(confEntries: Array[(String, String)],
      dataRoot: String, commitDir: String, stagedPath: String,
      snapshotId: Long): FileEntry = {
    val conf = new org.apache.hadoop.conf.Configuration()
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    val root = new org.apache.hadoop.fs.Path(dataRoot)
    val fs = root.getFileSystem(conf)
    val staged = new org.apache.hadoop.fs.Path(stagedPath)
    val commitStr = fs.makeQualified(new org.apache.hadoop.fs.Path(commitDir)).toString
    val rel = uniqueLeafName(
      fs.makeQualified(staged).toString.stripPrefix(commitStr).stripPrefix("/"),
      snapshotId)
    val dest = new org.apache.hadoop.fs.Path(root, rel)
    fs.mkdirs(dest.getParent)
    if (!fs.rename(staged, dest))
      require(!fs.exists(staged) && fs.exists(dest),
        s"could not publish $staged to $dest")
    val partVals = rel.split("/").dropRight(1).filter(_.contains("="))
      .map { seg => val Array(k, v) = seg.split("=", 2); k -> v }.toMap
    val status = fs.getFileStatus(dest)
    val (rows, stats) = footerMeta(conf, dest)
    FileEntry(rel, partVals, rows, status.getLen, snapshotId, stats)
  }

  /** Property: commit-file count at or above which publication + footer
    * stats collection runs as a SPARK JOB in the write tasks' executors
    * instead of a driver-side parallel loop (`publishAndStat`). Small
    * commits stay on the driver — a job's scheduling overhead exceeds a
    * handful of local footer reads.
    */
  val TaskStatsThresholdProp = "write.stats.task-collect-threshold"
  private[table] val TaskStatsThresholdDefault = 512

  /** 100 TB guard (the commit-path analog of `Dml.plannedFilesWarning`),
    * now scoped to the DRIVER stats site only: by default commits at or past
    * `TaskStatsThresholdProp` (512 files) publish + harvest in the write
    * tasks (`publishAndStat`), where this ceiling is irrelevant — the
    * warning can fire only when the threshold property was raised past the
    * ceiling, pinning a huge commit to the driver loop. Returns the warning
    * it logs so the bound is unit-testable.
    */
  private[table] def footerStatsWarning(newFiles: Long, ceiling: Long = 100000L): Option[String] =
    if (newFiles > ceiling)
      Some(s"commit is harvesting footer stats for $newFiles new files (ceiling $ceiling): " +
        "driver-side footer reads at this count dominate commit time — raise the target " +
        "file size (fewer, larger files) or collect stats in the write tasks")
    else None

  /** Convert a user-facing range bound into the file-stats comparison domain.
    * Footer stats are RAW PHYSICAL values: Spark writes TimestampType as
    * parquet INT64 epoch-microseconds and DateType as INT32 epoch-days, so
    * bounds on those columns are converted before the numeric compare (the
    * same raw-physical trick as the events ns-long pushdown in
    * `Tables.eventsBetween`). Other prunable types compare as rendered.
    */
  private[table] def toPhysicalBound(dt: DataType, v: Any): String = {
    import org.apache.spark.sql.types._
    dt match {
      case TimestampType => v match {
        case t: java.sql.Timestamp =>
          (Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L).toString
        case i: java.time.Instant =>
          (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
        case s: String => // interpreted as UTC, matching the session timezone
          val inst = java.time.LocalDateTime.parse(s.replace(" ", "T"))
            .toInstant(java.time.ZoneOffset.UTC)
          (inst.getEpochSecond * 1000000L + inst.getNano / 1000L).toString
        case n => n.toString // already epoch-micros
      }
      case TimestampNTZType => v match {
        // NTZ physical micros are the wall-clock value at UTC by definition
        case d: java.time.LocalDateTime =>
          val inst = d.toInstant(java.time.ZoneOffset.UTC)
          (inst.getEpochSecond * 1000000L + inst.getNano / 1000L).toString
        case s: String =>
          val inst = java.time.LocalDateTime.parse(s.replace(" ", "T"))
            .toInstant(java.time.ZoneOffset.UTC)
          (inst.getEpochSecond * 1000000L + inst.getNano / 1000L).toString
        case n => n.toString // already epoch-micros
      }
      case DateType => v match {
        case d: java.sql.Date => d.toLocalDate.toEpochDay.toString
        case d: java.time.LocalDate => d.toEpochDay.toString
        case s: String => java.time.LocalDate.parse(s).toEpochDay.toString
        case n => n.toString // already epoch-days
      }
      case _ => v.toString
    }
  }

  /** Inverse of `toPhysicalBound`: convert a raw physical footer bound back
    * into the column's logical value (timestamp from epoch-micros, date from
    * epoch-days, numerics via their JVM type).
    */
  private[table] def fromPhysicalBound(dt: DataType, s: String): Any = {
    import org.apache.spark.sql.types._
    dt match {
      case TimestampType =>
        val micros = s.toLong
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case TimestampNTZType =>
        val micros = s.toLong
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case DateType => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(s.toLong))
      case ByteType => s.toByte
      case ShortType => s.toShort
      case IntegerType => s.toInt
      case LongType => s.toLong
      case FloatType => s.toFloat
      case DoubleType => s.toDouble
      case _ => s
    }
  }

  /** Resolve the write-time physical name of `colName` for files written in
    * evolution epoch `epoch` by REVERSE-applying the chain ops committed
    * after it. Returns None when the column cannot be traced to a write-time
    * column with compatibly-ordered stats:
    *  - an `add` of this name means the column did not exist when the file
    *    was written — any stats under the name belong to a previously
    *    renamed-away column (the aliasing case that silently dropped rows);
    *  - a `widen` to string re-orders numeric values lexicographically, so
    *    pre-widen numeric bounds are not comparable.
    */
  private[table] def writeTimeName(snap: Snapshot, colName: String, epoch: Long,
      dt: DataType): Option[String] = {
    implicit val fmts: org.json4s.Formats = SnapshotLog.formats
    val opsAfter = snap.chain
      .filter(st => st.snapshotId > epoch && st.snapshotId <= snap.snapshotId)
      .flatMap(_.ops)
    opsAfter.reverseIterator.foldLeft(Option(colName)) { (nameOpt, op) =>
      nameOpt.flatMap { name =>
        val m = org.json4s.jackson.JsonMethods.parse(op).extract[Map[String, String]]
        m.getOrElse("op", "?") match {
          case "add" if m("name") == name => None
          case "rename" if m("to") == name => Some(m("from"))
          // a rename AWAY of the tracked name is unreachable (a later add or
          // rename-to would have resolved first) — conservative None anyway
          case "rename" if m("from") == name => None
          case "widen" if m("name") == name &&
            dt == org.apache.spark.sql.types.StringType => None
          case _ => Some(name)
        }
      }
    }
  }

  /** Replay one evolution op over a DataFrame read with an older schema. */
  private[table] def applyEvolution(df: DataFrame, op: String): DataFrame = {
    implicit val fmts: org.json4s.Formats = SnapshotLog.formats
    val m = org.json4s.jackson.JsonMethods.parse(op).extract[Map[String, String]]
    m.getOrElse("op", "?") match {
      case "add" =>
        if (df.columns.contains(m("name"))) df
        else {
          // key absent = no declared default (replay NULL); present = replay
          // the declared literal, INCLUDING an explicit empty string
          val d = m.get("default")
          df.withColumn(m("name"), d.fold(lit(null))(lit(_)).cast(m("dataType")))
        }
      case "rename" =>
        if (df.columns.contains(m("from"))) df.withColumnRenamed(m("from"), m("to")) else df
      case "widen" =>
        if (df.columns.contains(m("name"))) df.withColumn(m("name"), col(m("name")).cast(m("dataType")))
        else df
      case "drop" =>
        // replay order makes drop-then-re-add sound: the old file's column
        // vanishes here before the later add op re-creates it at its default
        if (df.columns.contains(m("name"))) df.drop(m("name")) else df
      case _ => throw new IllegalArgumentException(s"bad evolution op: $op")
    }
  }
}
