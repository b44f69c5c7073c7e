package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, InsertableRelation}
import org.apache.spark.sql.sources.{And => SAnd, EqualTo => SEqualTo, Filter => SFilter, GreaterThan => SGt, GreaterThanOrEqual => SGte, In => SIn, LessThan => SLt, LessThanOrEqual => SLte}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.table.SnapshotLog

/** DataSource V2 STREAMING SOURCE over a snapshot table — the read half of
  * the streaming story (`StreamOps`' exactly-once sinks are the write half):
  *
  * {{{
  *   spark.readStream.format("graft").load(tableDir)   // → micro-batches of
  *   // newly committed appends, offset = snapshot id, exactly-once via
  *   // Spark's own offset log
  * }}}
  *
  * Semantics mirror Iceberg's streaming read: each micro-batch is the data
  * files COMMITTED since the last consumed snapshot; row-adding commits
  * (`append`, zero-copy `add-files`) stream, content-preserving maintenance
  * (compaction, sort/z rewrites, evolution metadata) is skipped — its rows
  * were already streamed from their original commits — and row-REMOVING
  * commits (COW/MOR DML, overwrites) refuse loudly: an append-only stream
  * cannot represent a retraction (Iceberg's streaming read has the same
  * contract). Offsets are snapshot ids, so restart-resume composes with the
  * table's own time travel.
  *
  * Scale shape: `latestOffset`/`planInputPartitions` are O(new commits)
  * METADATA work on the driver (the snapshot log is delta-encoded); one
  * input partition per new data file, readers open only their own file.
  * Schema evolution inside an unconsumed range refuses loudly rather than
  * silently reading renamed columns as null (consume up to the evolution
  * point, restart with the new schema — the Iceberg operating procedure).
  *
  * The per-file reader decodes through Spark's VECTORIZED parquet reader
  * (simple primitive schemas — exactly what this table format writes;
  * complex types refuse at scan build), with parquet-hadoop record
  * materialization as the fallback for empty projections and refused
  * encodings — see [[GraftPartitionReader]].
  */
class GraftStreamSource extends TableProvider with DataSourceRegister
    with CreatableRelationProvider {

  override def shortName(): String = "graft"

  /** Path-based batch write (`df.write.format("graft").mode(...).save(dir)`).
    *
    * `DataFrameWriter.save` only takes the native DSv2 write path when the
    * table advertises `BATCH_WRITE`; a `V1_BATCH_WRITE` table drops to
    * Spark's V1 source command (`DataSource.planForWriting`), which requires
    * the provider to implement THIS interface — the `V1Write` →
    * `InsertableRelation` hook below only serves catalog-table INSERTs. Both
    * routes share one body ([[GraftStreamSource.writeInto]]): align columns
    * to the table layout, then the table API's own distributed
    * append/overwrite (partition transforms, CAS commit retry, schema-shape
    * refusal, WRITE ORDERED BY all ride free).
    */
  override def createRelation(ctx: org.apache.spark.sql.SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): BaseRelation = {
    import org.apache.spark.sql.SaveMode
    val dir = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft batch write needs a path (the table directory)"))
    val exists = SnapshotLog.load(new Configuration(), dir).nonEmpty
    require(exists, s"no graft table at $dir — create it first " +
      "(GraftTable.create or CREATE TABLE); the connector writes into " +
      "existing tables, it does not infer table layout from a DataFrame")
    mode match {
      case SaveMode.Append => GraftStreamSource.writeInto(dir, data, overwrite = false)
      case SaveMode.Overwrite => GraftStreamSource.writeInto(dir, data, overwrite = true)
      case SaveMode.ErrorIfExists => throw new IllegalStateException(
        s"graft table at $dir already exists (mode ErrorIfExists)")
      case SaveMode.Ignore => () // table exists: by contract, no-op
    }
    val written = GraftStreamSource.tableSchema(dir)
    new BaseRelation {
      override def sqlContext: org.apache.spark.sql.SQLContext = ctx
      override def schema: StructType = written
    }
  }

  private def dirOf(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft source needs a path (the table directory)"))
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = dirOf(options)
    val snaps = SnapshotLog.load(new Configuration(), dir)
    require(snaps.nonEmpty, s"no graft table at $dir")
    // a time-travel read surfaces the TARGET snapshot's schema, so a scan
    // before a column rename/widen reads the shape that was live then
    val snap = GraftStreamSource.resolveSnapshot(snaps, dir,
      Option(options.get("snapshot-id")).map(_.toLong),
      Option(options.get("as-of-timestamp")).map(_.toLong)).get
    DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftStreamTable(properties.get("path"), schema)
}

private[sources] class GraftStreamTable(dir: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name(): String = s"graft:$dir"
  override def schema(): StructType = tableSchema

  /** `_file` — the absolute path of the data file each row came from (the
    * Iceberg `_file` metadata column): constant per input partition, served
    * without touching file bytes, and the metadata attribute Spark's
    * group-based row-level plans project on (see GraftCowOperation).
    */
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = GraftStreamSource.FileMetaCol
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String = "absolute path of the row's data file"
    })
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)

  /** Batch WRITE through the connector (`df.write.format("graft")
    * .mode("append"|"overwrite").save(dir)`) — the V1 write bridge
    * delegating to the table's OWN append/overwrite: the write stays fully
    * distributed (the table API's hash-distributed partitioned write, file
    * targeting, footer-stats harvest) and every table semantic rides free —
    * partition transforms, CAS commit retry, schema-shape refusal,
    * WRITE ORDERED BY properties, MOR delete retention on append. A
    * native DSv2 DataWriter would have to re-implement exactly those
    * driver-coordinated semantics executor-side for no added parallelism
    * (the underlying write already fans out). Streaming writes go through
    * the `StreamOps` foreachBatch sinks, which add the batch-id
    * exactly-once fence no blind epoch commit could.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: org.apache.spark.sql.DataFrame,
                overwrite: Boolean): Unit =
              GraftStreamSource.writeInto(dir, data, replace || overwrite)
          }
        // `df.writeStream.format("graft").start(dir)` — the native DSv2
        // streaming sink (exactly-once through the table's stream-batch-id
        // fence; see [[GraftStreamingWrite]])
        override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
          require(!replace,
            "graft streaming sink is append-only: use outputMode('append')")
          val shape = (st: StructType) => st.fields.map(f => (f.name, f.dataType)).toSet
          require(shape(info.schema()) == shape(tableSchema),
            s"graft streaming sink: stream schema ${info.schema().simpleString} " +
              s"does not match table $dir ${tableSchema.simpleString}")
          new GraftStreamingWrite(dir, info.schema(), info.queryId())
        }
      }
    }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    tableSchema.fields.foreach { f =>
      require(GraftStreamSource.readableComplex(f.dataType),
        s"graft source: column ${f.name} has unsupported type " +
          s"${f.dataType.simpleString} (primitives plus array/struct over them)")
    }
    val maxCommits = Option(options.get("max-commits-per-trigger")).map(_.toInt)
    val streamFrom = Option(options.get("stream-from"))
    // batch time travel (the Iceberg read-option analog): pin the scan to a
    // retained snapshot by id or to the last snapshot committed at or
    // before a wall-clock millisecond timestamp
    val asOfSnapshot = Option(options.get("snapshot-id")).map(_.toLong)
    val asOfTimestamp = Option(options.get("as-of-timestamp")).map(_.toLong)
    require(asOfSnapshot.isEmpty || asOfTimestamp.isEmpty,
      "set either snapshot-id or as-of-timestamp, not both")
    // incremental batch read over (start, end]: the appends committed in
    // the range (the Iceberg incremental-scan analog; the batch face of the
    // streaming source's commit-range planning)
    val incrementalFrom = Option(options.get("start-snapshot-id")).map(_.toLong)
    val incrementalTo = Option(options.get("end-snapshot-id")).map(_.toLong)
    require(incrementalTo.isEmpty || incrementalFrom.isDefined,
      "end-snapshot-id needs start-snapshot-id")
    require(incrementalFrom.isEmpty ||
        (asOfSnapshot.isEmpty && asOfTimestamp.isEmpty),
      "an incremental range and a time-travel target cannot combine")
    // Column pruning: Catalyst hands the projection down and the per-file
    // readers project at the PARQUET level (the footer's filtered message
    // type rides ReadSupport.PARQUET_READ_SCHEMA), so unprojected columns
    // are never decoded — the same contract as the table's own scans.
    // Filter pushdown: comparison predicates prune whole FILES against the
    // snapshot's footer bounds and partition values at PLANNING time; every
    // filter is also returned as residual, so Spark re-evaluates row-level —
    // pruning can only ever drop files proven out of range, never change
    // results.
    // Aggregate pushdown: ungrouped COUNT(*)/COUNT(col)/MIN/MAX answer from
    // SNAPSHOT METADATA alone (file row counts + footer stats harvested at
    // write time) when no row can escape the stats' view — no deletes, no
    // residual filters (Spark only attempts the pushdown when the scan has
    // no post-scan filters, and this scan keeps every filter residual).
    // The 100 TB shape: a full-table COUNT(*) is a driver-side metadata
    // fold instead of a 100 TB scan — the same contract as Iceberg's
    // aggregate pushdown over manifest stats.
    new ScanBuilder with SupportsPushDownRequiredColumns
        with SupportsPushDownFilters with SupportsPushDownAggregates
        with org.apache.spark.sql.connector.read.SupportsPushDownLimit {
      private var required: StructType = tableSchema
      private var pushed: Array[SFilter] = Array.empty
      private var agg: Option[(StructType, Array[Array[Any]], String)] = None
      private var limit: Option[Int] = None
      override def pruneColumns(requiredSchema: StructType): Unit =
        // keep the table's field order; Spark's requiredSchema is already a
        // subset of the logical schema — plus the `_file` metadata column
        // when the query (or a row-level plan) asked for it
        required = StructType(tableSchema.fields.filter(f =>
          requiredSchema.fieldNames.contains(f.name)) ++
          requiredSchema.fields.filter(_.name == GraftStreamSource.FileMetaCol))
      override def pushFilters(filters: Array[SFilter]): Array[SFilter] = {
        pushed = filters.filter(GraftStreamSource.prunable(_, tableSchema))
        filters // all residual: file-skipping only, rows re-checked above
      }
      override def pushedFilters(): Array[SFilter] = pushed
      override def supportCompletePushDown(a: Aggregation): Boolean =
        pushed.isEmpty && incrementalFrom.isEmpty &&
          GraftStreamSource.planAggregation(
            dir, tableSchema, a, asOfSnapshot, asOfTimestamp).isDefined
      override def pushAggregation(a: Aggregation): Boolean = {
        // complete pushdown only: a partial (per-task) metadata aggregate
        // has no cheaper form than the complete one, so never accept the
        // partial contract; incremental ranges aggregate their own files,
        // not the snapshot the metadata plan would read
        if (pushed.nonEmpty || incrementalFrom.nonEmpty) return false
        agg = GraftStreamSource.planAggregation(
          dir, tableSchema, a, asOfSnapshot, asOfTimestamp)
        agg.isDefined
      }
      // Partial limit pushdown: Spark keeps its own Limit on top, so the
      // scan may over-deliver but must never under-deliver — planInput
      // Partitions keeps a file PREFIX only when exact metadata row counts
      // prove it carries >= limit live rows (no deletes, no filters). A
      // `LIMIT 10` on a million-file table then opens one file.
      override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
      override def build(): Scan = agg match {
        case Some((aggSchema, rows, desc)) =>
          new GraftAggScan(dir, aggSchema, rows, desc)
        case None =>
          new GraftScan(dir, tableSchema, required, maxCommits, pushed,
            streamFrom, asOfSnapshot, asOfTimestamp, limit,
            incrementalFrom, incrementalTo)
      }
    }
  }
}

private[sources] class GraftScan(dir: String, fullSchema: StructType,
    schema: StructType, maxCommitsPerTrigger: Option[Int],
    pushedFilters: Array[SFilter] = Array.empty,
    streamFrom: Option[String] = None,
    asOfSnapshot: Option[Long] = None,
    asOfTimestamp: Option[Long] = None,
    pushedLimit: Option[Int] = None,
    incrementalFrom: Option[Long] = None,
    incrementalTo: Option[Long] = None,
    onPlanned: Option[(graft.table.Snapshot, Seq[graft.table.FileEntry]) => Unit] = None)
    extends Scan
    with SupportsReportStatistics with SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {
  override def readSchema(): StructType = schema

  /** `_file` support: when the read schema asks for the metadata column,
    * each partition carries its absolute path as a constant value — the
    * reader serves it like a hive partition column, no file bytes touched.
    */
  private def withFileCol(e: graft.table.FileEntry,
      filePath: String): Map[String, String] =
    if (schema.fieldNames.contains(GraftStreamSource.FileMetaCol))
      e.partitionValues + (GraftStreamSource.FileMetaCol -> filePath)
    else e.partitionValues

  /** Storage-partitioned joins (`SupportsReportPartitioning` +
    * `HasPartitionKey`): when every identity-partition column is in the
    * read schema and every file carries an exactly-convertible value, the
    * scan reports `KeyGroupedPartitioning` over those columns and each
    * input partition exposes its typed key row — two graft tables
    * co-partitioned on the join key then join with NO shuffle on either
    * side (under spark.sql.sources.v2.bucketing.enabled), the plan that
    * keeps a 100 TB fact-fact join from moving 100 TB twice. Reported
    * keys and key-row order are both [[spjKeyCols]], so they always agree.
    */
  private lazy val spjKeyCols: List[String] = if (incrementalFrom.isDefined) Nil else {
    val snaps = SnapshotLog.load(new Configuration(), dir)
    resolve(snaps).toList.flatMap { snap =>
      val cols = snap.partitionCols.filter(c => schema.exists(_.name == c))
      val ok = cols.nonEmpty && snap.files.nonEmpty &&
        snap.files.forall(f => cols.forall(c =>
          f.partitionValues.get(c).exists(v => GraftStreamSource
            .partitionKeyValue(schema(schema.fieldIndex(c)).dataType, v).isDefined)))
      if (ok) cols else Nil
    }
  }
  private[sources] def spjKeyFor(e: graft.table.FileEntry): Array[Any] =
    spjKeyCols.map(c => GraftStreamSource.partitionKeyValue(
      schema(schema.fieldIndex(c)).dataType, e.partitionValues(c)).get).toArray
  override def outputPartitioning(): org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (spjKeyCols.isEmpty)
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
    else {
      val snaps = SnapshotLog.load(new Configuration(), dir)
      val groups = resolve(snaps).map(_.files
        .map(f => spjKeyCols.map(f.partitionValues)).distinct.size).getOrElse(0)
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        spjKeyCols.map(c => Expressions.identity(c):
          org.apache.spark.sql.connector.expressions.Expression).toArray,
        math.max(groups, 1))
    }

  /** The snapshot this batch scan reads: the head, or the time-travel
    * target when `snapshot-id` / `as-of-timestamp` was set. */
  private def resolve(snaps: Seq[graft.table.Snapshot]): Option[graft.table.Snapshot] =
    GraftStreamSource.resolveSnapshot(snaps, dir, asOfSnapshot, asOfTimestamp)

  /** Dynamic partition pruning / runtime filtering (the DSv2
    * `SupportsRuntimeFiltering` contract): when this scan is the fact side
    * of a join, Spark re-plans it at RUNTIME with the build side's actual
    * join-key values as an `In` filter — whole files drop on partition
    * values and footer bounds before any task launches, the decisive plan
    * at 100 TB where a dimension filter touches a handful of partitions.
    * Purely an optimization: files that survive still re-check rows in the
    * join itself, so over-approximation never changes results.
    */
  @volatile private var runtimeFilters: Array[SFilter] = Array.empty
  override def filterAttributes(): Array[NamedReference] = {
    // columns runtime values can actually prune on: partition columns
    // (exact value match) and numeric columns (footer [min,max] bounds) —
    // restricted to the PRUNED read schema, because Spark resolves these
    // names against the scan's output (a pruning join's key is always in
    // the output, so nothing is lost)
    val snaps = SnapshotLog.load(new Configuration(), dir)
    val partCols = snaps.lastOption.toSeq.flatMap(_.files)
      .flatMap(_.partitionValues.keys).distinct
    val boundCols = fullSchema.fields
      .filter(f => GraftStreamSource.numericCol(f.name, fullSchema)).map(_.name)
    (partCols ++ boundCols).distinct
      .filter(c => schema.exists(_.name == c))
      .map(Expressions.column).toArray
  }
  override def filter(filters: Array[SFilter]): Unit =
    runtimeFilters = filters.filter(GraftStreamSource.prunable(_, fullSchema))
  private def effectiveFilters: Array[SFilter] = pushedFilters ++ runtimeFilters

  /** Exact table statistics from the snapshot's file inventory, AFTER the
    * pushed filters' file pruning — so Catalyst's join planning sees the
    * size a scan will actually read and broadcasts small graft reads
    * (estimate → runtime AQE, the same decision order as the engine's own
    * MERGE planning). Metadata only: no file is opened.
    */
  override def estimateStatistics(): Statistics = {
    val snaps = SnapshotLog.load(new Configuration(), dir)
    val files = resolve(snaps).map(_.files).getOrElse(Nil)
      .filter(e => GraftStreamSource.fileMayMatch(e, fullSchema, effectiveFilters))
    val bytes = files.map(_.sizeBytes).sum
    val rows = if (files.exists(_.rowCount < 0)) java.util.OptionalLong.empty()
      else java.util.OptionalLong.of(files.map(_.rowCount).sum)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong = rows
    }
  }
  override def description(): String =
    s"GraftScan($dir, pushed=[${pushedFilters.mkString(", ")}])"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    require(asOfSnapshot.isEmpty && asOfTimestamp.isEmpty,
      "snapshot-id/as-of-timestamp are batch read options; a stream anchors " +
        "its START with stream-from instead")
    new GraftMicroBatchStream(dir, fullSchema, schema, maxCommitsPerTrigger,
      pushedFilters, streamFrom)
  }

  /** Batch read of the LATEST snapshot through the same per-file readers.
    * Merge-on-read deletes RECONCILE inside each reader (the Iceberg
    * connector posture): every data file's partition carries the equality-
    * delete files committed after it; the reader loads those key tuples into
    * a hash map and skips matching rows — O(delete batch) extra read per
    * task, no extra Spark stage. Unreplayed schema evolution still refuses
    * (that read needs `GraftTable.readLatest`'s evolution replay); the
    * connector's batch face covers the append/import/compact/MOR-delete
    * lifecycle, which is what an external engine pointed at the directory
    * can safely consume.
    */
  /** Incremental batch over (start, end]: the appends committed in the
    * range, mirroring the table API's `readIncremental` contract — unbroken
    * parent chain (expired intermediates refuse), content-changing commits
    * refuse (append-only semantics can't represent a retraction), files come
    * from each appending commit's OWN doc (a later in-range compaction may
    * have dropped them from the end snapshot's list), and no delete can
    * apply (in-range MOR commits refuse; earlier deletes only touch earlier
    * files). O(range) metadata planning — the CDC-batch shape at 100 TB.
    */
  private def incrementalPartitions(from: Long,
      snaps: Seq[graft.table.Snapshot]): Array[InputPartition] = {
    val to = incrementalTo.getOrElse(snaps.last.snapshotId)
    require(from < to, s"need start-snapshot-id < end, got ($from, $to]")
    require(snaps.exists(_.snapshotId == to),
      s"end-snapshot-id $to is not retained in $dir")
    require(from == 0L || snaps.exists(_.snapshotId == from),
      s"start-snapshot-id $from is not retained in $dir (expired?)")
    val range = snaps.filter(s => s.snapshotId > from && s.snapshotId <= to)
    val ids = range.map(_.snapshotId).toSet
    range.foreach { s =>
      require(s.parentId match {
        case None => from == 0L
        case Some(p) => p == from || ids.contains(p)
      }, s"snapshot ${s.snapshotId}'s parent is not live in ($from, $to] of " +
        s"$dir — intermediate commits were expired")
    }
    val bad = range.filterNot(s => GraftStreamSource.RowAdding(s.operation) ||
      GraftStreamSource.Skippable(s.operation))
    require(bad.isEmpty,
      s"incremental read over ($from, $to] crosses content-changing commit(s) " +
        bad.map(s => s"${s.snapshotId}:${s.operation}").mkString(", ") +
        s" in $dir — append-only incremental semantics cannot represent them")
    val shape = (st: StructType) => st.fields.map(f => (f.name, f.dataType)).toSet
    val dataRoot = SnapshotLog.dataPath(dir).toString
    range.filter(s => GraftStreamSource.RowAdding(s.operation)).flatMap { s =>
      s.files.filter(e => e.writtenAt == s.snapshotId &&
          GraftStreamSource.fileMayMatch(e, fullSchema, effectiveFilters)).map { e =>
        val writeSchema = DataType.fromJson(s.schemas(e.writtenAt.toString))
          .asInstanceOf[StructType]
        val dataShape = shape(StructType(fullSchema.fields.filterNot(f =>
          e.partitionValues.contains(f.name))))
        require(shape(writeSchema) == dataShape ||
            shape(writeSchema) == shape(fullSchema),
          s"graft incremental read: ${e.path} in $dir was written under an " +
            "evolved schema — use the table API (readIncremental) for " +
            "evolution replay")
        GraftInputPartition(s"$dataRoot/${e.path}",
          withFileCol(e, s"$dataRoot/${e.path}"),
          schema.json, e.rowCount, e.writtenAt)
      }
    }.toArray[InputPartition]
  }

  override def toBatch(): Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val snaps = SnapshotLog.load(new Configuration(), dir)
      require(snaps.nonEmpty, s"no graft table at $dir")
      incrementalFrom match {
        case Some(from) => return incrementalPartitions(from, snaps)
        case None => ()
      }
      val head = resolve(snaps).get
      val shape = (st: StructType) => st.fields.map(f => (f.name, f.dataType)).toSet
      val dataRoot = SnapshotLog.dataPath(dir).toString
      // MOR reconciliation preconditions: every delete key column must still
      // exist under its recorded name (a rename between the delete commit
      // and head would need the table API's rename-aware resolution) and be
      // a readable primitive.
      head.deletes.foreach { d =>
        d.keyCols.foreach { k =>
          require(fullSchema.fieldNames.contains(k),
            s"graft batch read: delete file ${d.path} in $dir keys on renamed " +
              s"column $k — use the table API (readLatest) for rename-aware " +
              "delete resolution")
        }
      }
      val keyColTypes = head.deletes.flatMap(_.keyCols).distinct.map { k =>
        StructField(k, fullSchema(fullSchema.fieldIndex(k)).dataType)
      }
      val keySchemaJson =
        if (keyColTypes.isEmpty) "" else StructType(keyColTypes).json
      val surviving = head.files.filter(e =>
        GraftStreamSource.fileMayMatch(e, fullSchema, effectiveFilters))
      // pushed LIMIT: read the smallest file prefix whose exact metadata
      // row counts already cover it — only when no delete can shrink a
      // file's live count below its metadata count (Spark re-applies the
      // limit on top, so over-delivery is fine; under-delivery never is)
      val chosen = pushedLimit match {
        case Some(n) if head.deletes.isEmpty && surviving.forall(_.rowCount >= 0) =>
          var acc = 0L
          surviving.takeWhile { e => val need = acc < n; acc += e.rowCount; need }
        case _ => surviving
      }
      // COW row-level operations record exactly which files this scan chose
      // (post filter pruning) so the write side replaces those and ONLY
      // those; see GraftCowOperation in GraftCatalog.scala
      onPlanned.foreach(_(head, chosen))
      chosen.map { e =>
        // evolution replay: files written under an older schema carry a
        // per-file column mapping (rename → physical name, widen → cast,
        // add-with-default → constant) computed here from the snapshot's
        // own evolution chain — the connector-level form of the table API's
        // replay. Shape comparison runs against the FULL logical schema —
        // the pruned read schema is a projection, not the table's shape.
        val writeSchema = DataType.fromJson(head.schemas(e.writtenAt.toString))
          .asInstanceOf[StructType]
        val dataShape = shape(StructType(fullSchema.fields.filterNot(f =>
          e.partitionValues.contains(f.name))))
        val evolution: List[GraftColMap] =
          if (shape(writeSchema) == dataShape ||
              shape(writeSchema) == shape(fullSchema)) Nil
          else GraftStreamSource.evolutionMapping(head, e, fullSchema, dir)
        // a delete applies iff committed strictly after this file's write;
        // consolidated (per-row-bound) files can't be pruned at planning —
        // each tuple carries its own bound, checked in the reader
        val applicable = head.deletes.filter(d =>
          d.perRowAppliedAt || d.appliedAt > e.writtenAt).map(d =>
          GraftDeleteSpec(s"$dataRoot/${d.path}", d.keyCols, d.appliedAt,
            d.perRowAppliedAt, d.positional))
        GraftInputPartition(s"$dataRoot/${e.path}",
          withFileCol(e, s"$dataRoot/${e.path}"),
          schema.json, e.rowCount, e.writtenAt, applicable, keySchemaJson,
          if (spjKeyCols.isEmpty) Array.empty else spjKeyFor(e), evolution)
      }.toArray[InputPartition]
    }
    override def createReaderFactory(): PartitionReaderFactory = new GraftReaderFactory
  }
}

/** The scan a COMPLETELY pushed-down aggregation builds: one input
  * partition carrying the result row COMPUTED ON THE DRIVER from snapshot
  * metadata (file row counts, footer bounds, null counts) — no data file is
  * ever opened. `description()` carries the pushed aggregate list so
  * `explain` shows `PushedAggregation` and a plan audit can pin the
  * metadata-only path.
  */
private[sources] class GraftAggScan(dir: String, aggSchema: StructType,
    rows: Array[Array[Any]], pushedAggs: String) extends Scan {
  override def readSchema(): StructType = aggSchema
  override def description(): String =
    s"GraftAggScan($dir, PushedAggregation: [$pushedAggs])"
  override def toBatch(): Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      Array(GraftAggPartition(rows))
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftAggReaderFactory
  }
}

private[sources] case class GraftAggPartition(rows: Array[Array[Any]])
  extends InputPartition

private[sources] class GraftAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rows = p.asInstanceOf[GraftAggPartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = new GenericInternalRow(rows(i).clone())
      override def close(): Unit = ()
    }
}

/** Offset = highest consumed snapshot id. */
private[sources] case class GraftOffset(snapshotId: Long) extends Offset {
  override def json(): String = s"""{"snapshotId":$snapshotId}"""
}

private[sources] class GraftMicroBatchStream(dir: String,
    fullSchema: StructType, schema: StructType,
    maxCommitsPerTrigger: Option[Int],
    pushedFilters: Array[SFilter] = Array.empty,
    streamFrom: Option[String] = None) extends MicroBatchStream
    with SupportsTriggerAvailableNow {

  private def snaps = SnapshotLog.load(new Configuration(), dir)

  // Trigger.AvailableNow contract: the run drains up to the head captured
  // HERE, then stops — commits landing mid-run wait for the next run.
  // Without this interface Spark falls back to single-batch Trigger.Once
  // semantics, where a rate limit would silently truncate the run.
  @volatile private var availableNowBound: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound = Some(snaps.lastOption.map(_.snapshotId).getOrElse(0L))

  /** Starting position for a FRESH checkpoint (`option("stream-from", ...)`,
    * the Iceberg `stream-from-timestamp` analog in snapshot units):
    * `earliest` (default) replays the full retained history and requires the
    * chain root to still be retained; `latest` anchors at the current head
    * and streams only commits after query start — the only position that
    * always works on a table whose early history was expired; a snapshot id
    * anchors at that retained snapshot. Only consulted when the checkpoint
    * has no offset yet — resume always wins.
    */
  override def initialOffset(): Offset = streamFrom.map(_.trim) match {
    case None | Some("earliest") => GraftOffset(0L)
    case Some("latest") =>
      GraftOffset(snaps.lastOption.map(_.snapshotId).getOrElse(0L))
    case Some(id) if id.nonEmpty && id.forall(_.isDigit) =>
      val sid = id.toLong
      require(sid == 0L || snaps.exists(_.snapshotId == sid),
        s"stream-from snapshot $sid is not retained in $dir — pick a live " +
          "snapshot id (see the snapshots metadata table), or 'latest'")
      GraftOffset(sid)
    case Some(other) => throw new IllegalArgumentException(
      s"bad stream-from value '$other': expected 'earliest', 'latest', or a " +
        "snapshot id")
  }

  override def latestOffset(): Offset = {
    val s = snaps
    GraftOffset(if (s.isEmpty) 0L else s.last.snapshotId)
  }

  /** Rate limiting (`option("max-commits-per-trigger", n)`): each
    * micro-batch consumes at most n commits past the start offset — the
    * backfill-throttle an operator needs when a streaming query starts
    * against months of table history (the Iceberg streaming-read
    * rate-limit analog, in commit units because a commit is this source's
    * atomic progress step).
    */
  override def getDefaultReadLimit: ReadLimit =
    maxCommitsPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftOffset].snapshotId
    val all = snaps.filter(s => s.snapshotId > from &&
      availableNowBound.forall(s.snapshotId <= _))
    if (all.isEmpty) GraftOffset(from)
    else maxCommitsPerTrigger match {
      case Some(n) => GraftOffset(all.take(n).last.snapshotId)
      case None => GraftOffset(all.last.snapshotId)
    }
  }

  override def reportLatestOffset(): Offset = latestOffset()

  override def deserializeOffset(json: String): Offset = {
    val re = """\{"snapshotId":(\d+)\}""".r
    json.trim match {
      case re(id) => GraftOffset(id.toLong)
      case other => throw new IllegalArgumentException(s"bad graft offset: $other")
    }
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftOffset].snapshotId
    val to = end.asInstanceOf[GraftOffset].snapshotId
    val range = snaps.filter(s => s.snapshotId > from && s.snapshotId <= to)
    // Expiry safety (the table's changeRange contract): the range must be
    // an UNBROKEN parent chain anchored at the start offset — snapshot
    // expiry between runs can drop committed appends, and silently skipping
    // them would lose streamed data. Refuse loudly instead.
    range.headOption.foreach { first =>
      val anchored =
        if (from == 0L) first.parentId.isEmpty
        else first.parentId.contains(from)
      val contiguous = range.sliding(2).forall {
        case Seq(a, b) => b.parentId.contains(a.snapshotId)
        case _ => true
      }
      require(anchored && contiguous,
        s"graft streaming read: snapshots in ($from, $to] of $dir are not a " +
          "contiguous parent chain — commits were expired since the last " +
          "consumed offset. Restart with a fresh checkpoint AND " +
          "option(\"stream-from\", \"latest\") (or a retained snapshot id); " +
          "a fresh checkpoint alone replays from the chain root, which is " +
          "no longer retained")
    }
    val bad = range.filterNot(s =>
      GraftStreamSource.RowAdding(s.operation) ||
        GraftStreamSource.Skippable(s.operation))
    require(bad.isEmpty,
      s"graft streaming read over ($from, $to] crosses row-removing commit(s) " +
        bad.map(s => s"${s.snapshotId}:${s.operation}").mkString(", ") +
        s" in $dir — an append-only stream cannot represent a retraction")
    val dataRoot = SnapshotLog.dataPath(dir).toString
    // zero-file appends (a streaming batch whose rows were all rejected
    // upstream) record no write schema and carry nothing to read — skip
    // them BEFORE the drift check would look their schema up
    range.filter(s => GraftStreamSource.RowAdding(s.operation) &&
        s.schemas.contains(s.snapshotId.toString)).flatMap { s =>
      // refuse schema drift inside the unconsumed range: reading old files
      // under a renamed/evolved schema would silently null columns
      val writeSchema = DataType.fromJson(s.schemas(s.snapshotId.toString))
        .asInstanceOf[StructType]
      val shape = (st: StructType) => st.fields.map(f => (f.name, f.dataType)).toSet
      // drift detection against the FULL logical schema (the read schema
      // may be a pruned projection)
      val dataShape = shape(StructType(fullSchema.fields.filterNot(f =>
        s.files.exists(_.partitionValues.contains(f.name)))))
      require(shape(writeSchema) == dataShape || shape(writeSchema) == shape(fullSchema),
        s"graft streaming read: snapshot ${s.snapshotId} in $dir was written " +
          s"under a different schema than the stream's — consume up to the " +
          "evolution point with the old schema, then restart the query")
      s.files.filter(e => e.writtenAt == s.snapshotId &&
          GraftStreamSource.fileMayMatch(e, fullSchema, pushedFilters)).map { e =>
        val pv =
          if (schema.fieldNames.contains(GraftStreamSource.FileMetaCol))
            e.partitionValues +
              (GraftStreamSource.FileMetaCol -> s"$dataRoot/${e.path}")
          else e.partitionValues
        GraftInputPartition(s"$dataRoot/${e.path}", pv, schema.json, e.rowCount)
      }
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory
}

/** The DSv2 STREAMING SINK (`df.writeStream.format("graft").start(dir)`) —
  * the native-connector half of the streaming write story (the foreachBatch
  * `StreamOps` sinks remain the route for upsert/WAP/dedup semantics).
  *
  * Shape: each epoch's tasks stage parquet part files (logical rows, the
  * table's column types) under `data/_streaming/<queryId>/<epochId>/` —
  * underscore-prefixed, so table scans' partition discovery never sees
  * them; a crashed query's leftovers age out through orphan cleanup. The
  * driver's `commit(epochId)` then publishes the epoch through
  * [[graft.table.GraftTable.commitStreamingEpoch]], which fences on the
  * `stream-batch-id` summary key durable in the SAME snapshot as the data —
  * Spark's at-least-once epoch replay after restart upgrades to
  * exactly-once, identical to the foreachBatch ingest contract.
  *
  * Scale: staging is one parquet write per task (no shuffle); unpartitioned
  * tables publish by RENAME + footer harvest (zero data rewrite);
  * partitioned tables re-enter the table's distributed append so transforms
  * and hash distribution apply. Task-attempt isolation rides on Spark's
  * output commit coordinator: only the winning attempt's `commit` keeps its
  * staged file — `abort` deletes.
  */
private[sources] class GraftStreamingWrite(dir: String, schema: StructType,
    queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  private def stagingRoot: String =
    s"${SnapshotLog.dataPath(dir)}/_streaming/$queryId"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    GraftStreamingWriterFactory(stagingRoot, schema.json)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    val t = graft.table.GraftTable.load(spark, dir)
    // Publish ONLY the files the output commit coordinator's winning
    // attempts named in their commit messages. The staging dir may hold
    // zombie-attempt leftovers whose abort never ran — commitStreamingEpoch
    // deletes the whole epoch dir after the fence-checked commit, so those
    // never reach the table.
    val staged = messages.toSeq.collect {
      case GraftStagedFile(path, rows) if rows > 0L => path
    }
    t.commitStreamingEpoch(s"$stagingRoot/$epochId", epochId, staged)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$stagingRoot/$epochId")
    scala.util.Try(p.getFileSystem(new Configuration()).delete(p, true))
  }
}

private[sources] case class GraftStreamingWriterFactory(stagingRoot: String,
    schemaJson: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new GraftStreamingDataWriter(
      s"$stagingRoot/$epochId/part-$partitionId-$taskId.parquet", schemaJson)
}

private[sources] case class GraftStagedFile(path: String, rows: Long)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

/** One staged parquet file per task attempt, written with the parquet Group
  * API under the table's physical conventions (TIMESTAMP_MICROS int64, date
  * int32, UTF8 binary) so published files are indistinguishable from
  * batch-append output to every reader and to the footer-stats harvest.
  */
private[sources] class GraftStreamingDataWriter(filePath: String, schemaJson: String)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  schema.fields.foreach { f =>
    require(GraftStreamSource.readable(f.dataType),
      s"graft streaming sink: column ${f.name} has unsupported type " +
        s"${f.dataType.simpleString} (primitive columns only)")
  }
  private val path = new org.apache.hadoop.fs.Path(filePath)
  private val msgType = GraftStreamSource.toMessageType(schema)
  private val writer = {
    val conf = new Configuration()
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(msgType, conf)
    org.apache.parquet.hadoop.example.ExampleParquetWriter.builder(path)
      .withConf(conf)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
  }
  private val factory =
    new org.apache.parquet.example.data.simple.SimpleGroupFactory(msgType)
  private var rows = 0L

  /** Row-level plans (`DataAndMetadataWritingSparkTask`) hand the metadata
    * projection separately — this writer has no use for it.
    */
  override def write(metadata: InternalRow, record: InternalRow): Unit =
    write(record)

  override def write(r: InternalRow): Unit = {
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!r.isNullAt(i)) schema(i).dataType match {
        case LongType | TimestampType | TimestampNTZType => g.add(i, r.getLong(i))
        case IntegerType | DateType => g.add(i, r.getInt(i))
        case DoubleType => g.add(i, r.getDouble(i))
        case FloatType => g.add(i, r.getFloat(i))
        case BooleanType => g.add(i, r.getBoolean(i))
        case StringType => g.add(i,
          org.apache.parquet.io.api.Binary.fromString(r.getUTF8String(i).toString))
        case other => throw new IllegalStateException(s"unwritable type $other")
      }
      i += 1
    }
    writer.write(g)
    rows += 1
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    writer.close()
    if (rows == 0L) // empty attempt: nothing to publish
      scala.util.Try(path.getFileSystem(new Configuration()).delete(path, false))
    GraftStagedFile(filePath, rows)
  }

  override def abort(): Unit = {
    scala.util.Try(writer.close())
    scala.util.Try(path.getFileSystem(new Configuration()).delete(path, false))
  }

  override def close(): Unit = ()
}

/** One applicable equality-delete file for a batch-read data file:
  * absolute path, key columns under their recorded names, the commit bound
  * (`appliedAt`), and whether each tuple carries its OWN bound column
  * (`_gf_applied_at`, written by delete consolidation).
  */
private[sources] case class GraftDeleteSpec(
    path: String,
    keyCols: List[String],
    appliedAt: Long,
    perRowAppliedAt: Boolean,
    positional: Boolean = false)

/** One current-schema column's resolution against an EVOLVED file:
  * `phys = Some(name)` reads the file column it was written as (with
  * `physTypeJson` its write-time type — a widen casts up to the current
  * type); `phys = None` means the column post-dates the file (added later):
  * the reader serves `default` (or NULL) as a constant.
  */
private[sources] case class GraftColMap(
    current: String,
    phys: Option[String],
    physTypeJson: String,
    default: Option[String])

private[sources] case class GraftInputPartition(
    filePath: String,
    partitionValues: Map[String, String],
    schemaJson: String,
    rowCount: Long,
    writtenAt: Long = 0L,
    deletes: List[GraftDeleteSpec] = Nil,
    keySchemaJson: String = "",
    spjKey: Array[Any] = Array.empty,
    evolution: List[GraftColMap] = Nil) extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  // only consulted when the scan reported KeyGroupedPartitioning, which
  // fills spjKey for every partition it plans (same column order)
  override def partitionKey(): InternalRow = new GenericInternalRow(spjKey)
}

/** Executor-level parse-once cache for equality-delete files. Delete files
  * are immutable once committed (content-addressed paths under the data dir
  * are never rewritten in place), so (path, keyCols, bound spec) fully
  * identifies the parsed tuple→bound map; without this, a scan re-reads
  * every applicable delete file per input partition — O(data files × delete
  * files) read amplification on a heavily-deleted table (Iceberg caches the
  * parsed delete sets the same way).
  *
  * Concurrency: per-key SINGLE-FLIGHT (a CompletableFuture per in-progress
  * parse) — exactly one task parses a given delete file while others wait on
  * that future, and tasks on UNRELATED files never serialize (an object-wide
  * lock here stalled every delete lookup executor-wide behind one fat
  * parse). Eviction is bounded by total cached TUPLES, not entry count — 64
  * fat maps can exhaust an executor while 64 is meaningless for small ones.
  * `parses` counts actual file parses (cache misses) for tests.
  */
private[sources] object GraftDeleteCache {
  /** ~4M cached delete tuples ≈ low hundreds of MB worst case — bounded
    * regardless of how fat individual delete files are.
    */
  private val MaxTuples = 4L * 1000 * 1000
  val parses = new java.util.concurrent.atomic.AtomicLong(0L)

  // access-ordered LRU of key → (parsed value, tuple count); guarded by its
  // own monitor, held only for O(1) map ops — never across a parse
  private val lru =
    new java.util.LinkedHashMap[AnyRef, (AnyRef, Long)](16, 0.75f, true)
  private var cachedTuples = 0L
  private val inflight = new java.util.concurrent.ConcurrentHashMap[
    AnyRef, java.util.concurrent.CompletableFuture[AnyRef]]()

  private def cached(key: AnyRef): AnyRef =
    lru.synchronized { val hit = lru.get(key); if (hit == null) null else hit._1 }

  private def admit(key: AnyRef, value: AnyRef, tuples: Long): Unit =
    lru.synchronized {
      if (!lru.containsKey(key)) {
        lru.put(key, (value, tuples))
        cachedTuples += tuples
        val it = lru.entrySet().iterator()
        // evict eldest first; never the entry just admitted (it is in use)
        while (cachedTuples > MaxTuples && it.hasNext) {
          val e = it.next()
          if (e.getKey != key) { cachedTuples -= e.getValue._2; it.remove() }
        }
      }
    }

  private def lookup[V <: AnyRef](key: AnyRef, doParse: () => (V, Long)): V = {
    val hit = cached(key)
    if (hit != null) return hit.asInstanceOf[V]
    val fresh = new java.util.concurrent.CompletableFuture[AnyRef]()
    val prior = inflight.putIfAbsent(key, fresh)
    if (prior != null) return prior.join().asInstanceOf[V]
    try {
      val v = cached(key) match { // the race we lost may have completed
        case null =>
          val (parsed, tuples) = doParse()
          admit(key, parsed, tuples)
          parsed
        case x => x.asInstanceOf[V]
      }
      fresh.complete(v)
      v
    } catch {
      case t: Throwable => fresh.completeExceptionally(t); throw t
    } finally inflight.remove(key, fresh)
  }

  def get(d: GraftDeleteSpec,
      keySchema: StructType): java.util.HashMap[List[Any], java.lang.Long] =
    lookup((d.path, d.keyCols, d.perRowAppliedAt, d.appliedAt), () => {
      val m = parse(d, keySchema)
      (m, m.size().toLong)
    })

  // Positional delete-vector half: (dv path) → per-file-name position sets.
  // One parse serves every data-file partition the vector touches.
  def getPositional(d: GraftDeleteSpec)
      : java.util.HashMap[String, java.util.HashSet[java.lang.Long]] =
    lookup(("pos", d.path), () => {
      val m = parsePositional(d)
      var n = 0L
      val it = m.values().iterator()
      while (it.hasNext) n += it.next().size()
      (m, n)
    })

  private def parsePositional(d: GraftDeleteSpec)
      : java.util.HashMap[String, java.util.HashSet[java.lang.Long]] = {
    parses.incrementAndGet()
    val m = new java.util.HashMap[String, java.util.HashSet[java.lang.Long]]()
    val path = new org.apache.hadoop.fs.Path(d.path)
    val r = org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), path)
      .withConf(new Configuration()).build()
    try {
      var g = r.read()
      while (g != null) {
        val fields = g.getType.getFields
        var fileIdx = -1; var posIdx = -1; var i = 0
        while (i < fields.size()) {
          if (fields.get(i).getName == "_gf_file") fileIdx = i
          if (fields.get(i).getName == "_gf_pos") posIdx = i
          i += 1
        }
        require(fileIdx >= 0 && posIdx >= 0,
          s"delete vector ${d.path} lacks (_gf_file, _gf_pos)")
        val name = g.getString(fileIdx, 0)
        var set = m.get(name)
        if (set == null) { set = new java.util.HashSet[java.lang.Long](); m.put(name, set) }
        set.add(g.getLong(posIdx, 0))
        g = r.read()
      }
    } finally r.close()
    m
  }

  private def parse(d: GraftDeleteSpec,
      keySchema: StructType): java.util.HashMap[List[Any], java.lang.Long] = {
    parses.incrementAndGet()
    val m = new java.util.HashMap[List[Any], java.lang.Long]()
    val path = new org.apache.hadoop.fs.Path(d.path)
    val r = org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), path)
      .withConf(new Configuration()).build()
    try {
      var g = r.read()
      while (g != null) {
        val fields = g.getType.getFields
        def idxOf(n: String): Int = {
          var i = 0
          while (i < fields.size() && fields.get(i).getName != n) i += 1
          if (i < fields.size()) i else -1
        }
        val tuple = d.keyCols.map { k =>
          val i = idxOf(k)
          val dt = keySchema(keySchema.fieldIndex(k)).dataType
          if (i < 0 || g.getFieldRepetitionCount(i) == 0) null
          else GraftStreamSource.readValue(g, i, dt)
        }
        val bound: Long =
          if (d.perRowAppliedAt) {
            val i = idxOf("_gf_applied_at")
            require(i >= 0 && g.getFieldRepetitionCount(i) > 0,
              s"consolidated delete file ${d.path} lacks _gf_applied_at")
            g.getLong(i, 0)
          } else d.appliedAt
        val prev = m.get(tuple)
        if (prev == null || bound > prev) m.put(tuple, bound)
        g = r.read()
      }
    } finally r.close()
    m
  }
}

private[sources] class GraftReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(partition.asInstanceOf[GraftInputPartition])
}

/** One-file record reader → InternalRow, PROJECTED at the parquet level —
  * only the pruned scan schema's data fields decode, plus any merge-on-read
  * delete key columns the projection dropped (read for the tuple check,
  * never emitted). Hive partition columns (absent from the file bytes) fill
  * from the partition's directory values. A projection with NO data fields
  * (`count(*)`, partition-only selects) emits the file's metadata row count
  * without opening the file at all — unless deletes apply, which force the
  * row-level read.
  *
  * Decode is VECTORIZED: Spark's own `VectorizedParquetRecordReader`
  * (batched column decode, the same engine behind every Spark parquet
  * scan) reads the projected data columns, `initBatch` rides the hive
  * partition values in as constant vectors, and a codegen'd
  * `UnsafeProjection` re-orders batch positions into the scan schema
  * (measured 2.2-2.4x faster end-to-end than record materialization on a
  * 20M-row aggregate scan). The row-materialized `GroupReadSupport` path
  * remains only as the fallback for empty-projection row reads and
  * encodings the vectorized reader refuses at initialize.
  *
  * MOR reconciliation: applicable delete files load into per-key-set hash
  * maps (key tuple → latest applied-at bound) at open; a data row is
  * skipped iff some map holds its tuple with a bound after the data file's
  * commit — the reader-level form of the table's broadcast anti-join,
  * O(delete batch) memory per task.
  */
private[sources] class GraftPartitionReader(p: GraftInputPartition)
    extends PartitionReader[InternalRow] {

  private val schema = DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
  private val keySchema: StructType =
    if (p.keySchemaJson.isEmpty) new StructType()
    else DataType.fromJson(p.keySchemaJson).asInstanceOf[StructType]
  // delete key columns ride the parquet projection even when the scan
  // pruned them; `schema.length` stays the emitted width. Partition-valued
  // key columns stay in too — both backends serve them as constants from
  // partitionValues, and dropping them would leave the tuple check with no
  // position to read (commitMorDelta allows any column, including partition
  // columns, as a delete key).
  private val extraKeyFields = keySchema.fields.filter(f =>
    p.deletes.exists(_.keyCols.contains(f.name)) &&
      !schema.fieldNames.contains(f.name))
  private val readFields: Array[StructField] = schema.fields ++ extraKeyFields

  // Per-readField resolution, folding in the partition's evolution mapping
  // (see [[GraftColMap]]): a field is either a CONSTANT (hive partition
  // value, or a column this file predates → its declared default/NULL) or a
  // FILE column under its write-time physical name and type (a widen casts
  // up on emit).
  private val evolByName: Map[String, GraftColMap] =
    p.evolution.map(c => c.current -> c).toMap
  private val constFlag = new Array[Boolean](readFields.length)
  private val constValue = new Array[Any](readFields.length)
  private val physName = new Array[String](readFields.length)
  private val physType = new Array[DataType](readFields.length)
  readFields.zipWithIndex.foreach { case (f, i) =>
    p.partitionValues.get(f.name) match {
      case Some(v) =>
        constFlag(i) = true
        constValue(i) = GraftStreamSource.castPartitionValue(v, f.dataType)
      case None => evolByName.get(f.name) match {
        case Some(c) if c.phys.isEmpty =>
          constFlag(i) = true
          constValue(i) = c.default
            .map(d => GraftStreamSource.castPartitionValue(d, f.dataType)).orNull
        case Some(c) =>
          physName(i) = c.phys.get
          physType(i) = DataType.fromJson(c.physTypeJson)
        case None =>
          physName(i) = f.name
          physType(i) = f.dataType
      }
    }
  }
  private val dataFields: Array[String] = readFields.indices
    .filterNot(i => constFlag(i)).map(i => physName(i)).toArray

  // metadata-only path: no data field requested, count known, no deletes
  private val metadataRows: Long =
    if (dataFields.isEmpty && p.rowCount >= 0 && p.deletes.isEmpty) p.rowCount
    else -1L
  private var emitted = 0L

  // (key columns) → (tuple → latest applied-at bound). Per-FILE parses come
  // from the JVM-wide [[GraftDeleteCache]], so a scan over many data files
  // opens each delete file once per executor, not once per input partition;
  // single-spec groups share the cached map directly (read-only after parse).
  private lazy val deleteMaps: Seq[(List[String], java.util.HashMap[List[Any], java.lang.Long])] =
    p.deletes.filterNot(_.positional)
      .groupBy(_.keyCols).toSeq.sortBy(_._1.mkString(",")).map {
      case (keyCols, Seq(d)) => keyCols -> GraftDeleteCache.get(d, keySchema)
      case (keyCols, specs) =>
        val m = new java.util.HashMap[List[Any], java.lang.Long]()
        specs.foreach { d =>
          GraftDeleteCache.get(d, keySchema).forEach { (tuple, bound) =>
            val prev = m.get(tuple)
            if (prev == null || bound > prev) m.put(tuple, bound)
          }
        }
        keyCols -> m
    }

  /** A positioned row cursor: `advance` to the next file row, `valueAt` a
    * readFields position of the CURRENT row (for the delete-tuple check),
    * `emit` the current row projected to the scan schema. */
  private trait Backend {
    def advance(): Boolean
    def valueAt(pos: Int): Any
    def emit(): InternalRow
    def close(): Unit
  }

  /** Spark's vectorized parquet decode, row-cursored. Batch layout is
    * [dataFields (physical names) in request order, constants in
    * constFields order]; `batchPos` maps readFields positions onto it once.
    * Constant columns (hive partition values AND evolved defaults) ride
    * `initBatch`'s constant vectors; widened columns decode in their
    * physical type and cast up inside the emit projection. */
  private final class VectorizedBackend extends Backend {
    private val constIdx: Array[Int] =
      readFields.indices.filter(i => constFlag(i)).toArray
    private val constFields: Array[StructField] = constIdx.map(i => readFields(i))
    private val constRow = new GenericInternalRow(constFields.length)
    constIdx.zipWithIndex.foreach { case (ri, i) => constRow.update(i, constValue(ri)) }
    private val reader =
      new org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader(
        false, 4096)
    try {
      reader.initialize(p.filePath, java.util.Arrays.asList(dataFields: _*))
      reader.initBatch(StructType(constFields), constRow)
    } catch { case e: Throwable => reader.close(); throw e }
    private val batchPos: Array[Int] = readFields.indices.map { i =>
      if (constFlag(i)) dataFields.length + constIdx.indexOf(i)
      else dataFields.indexOf(physName(i))
    }.toArray
    // the type AT the batch position: physical for file columns (a widen
    // decodes narrow), current for constants
    private def batchType(i: Int): DataType =
      if (constFlag(i)) readFields(i).dataType else physType(i)
    private val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(schema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
        val ref = org.apache.spark.sql.catalyst.expressions.BoundReference(
          batchPos(i), batchType(i), f.nullable)
        if (batchType(i) == f.dataType) ref
        else org.apache.spark.sql.catalyst.expressions.Cast(ref, f.dataType,
          Some(java.util.TimeZone.getDefault.getID))
      })
    private var row: InternalRow = _
    // The vectorized reader refuses unsupported encodings (e.g.
    // DELTA_BYTE_ARRAY in imported parquet) LAZILY, in the first batch read —
    // backend selection probes the first advance so such files fall back to
    // the record-materialized path instead of failing the scan.
    private var primed = false
    private var primedResult = false
    def primeFirst(): Unit = { primedResult = doAdvance(); primed = true }
    private def doAdvance(): Boolean =
      if (reader.nextKeyValue()) {
        row = reader.getCurrentValue.asInstanceOf[InternalRow]; true
      } else false
    override def advance(): Boolean =
      if (primed) { primed = false; primedResult } else doAdvance()
    override def valueAt(pos: Int): Any = {
      val i = batchPos(pos)
      if (row.isNullAt(i)) null
      else GraftStreamSource.widenValue(row.get(i, batchType(pos)),
        batchType(pos), readFields(pos).dataType)
    }
    override def emit(): InternalRow = proj(row)
    override def close(): Unit = reader.close()
  }

  /** parquet-hadoop group materialization — the fallback for projections
    * with no data fields and for files whose schema/encoding the
    * vectorized reader refuses at initialize. */
  private final class GroupBackend extends Backend {
    private val reader = {
      val conf = new Configuration()
      val path = new org.apache.hadoop.fs.Path(p.filePath)
      if (dataFields.nonEmpty) {
        // project: filter the FILE's own message type down to the requested
        // data fields (names absent from the file — later-added columns —
        // simply drop out and read back as null)
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf)
        val fr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val fileType = try fr.getFooter.getFileMetaData.getSchema finally fr.close()
        val wanted = dataFields.toSet
        val kept = fileType.getFields.asScala.filter(f => wanted.contains(f.getName))
        if (kept.nonEmpty && kept.size < fileType.getFieldCount) {
          val projected = new org.apache.parquet.schema.MessageType(
            fileType.getName, kept.toList.asJava)
          conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
            projected.toString)
        }
      }
      org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), path)
        .withConf(conf)
        .build()
    }
    private var current: org.apache.parquet.example.data.Group = _
    // readFields position → projected-file field index (-1 = absent); the
    // projected message type is identical for every row of the file
    private var fieldIdx: Array[Int] = _
    override def advance(): Boolean = { current = reader.read(); current != null }
    override def valueAt(pos: Int): Any = {
      if (constFlag(pos)) return constValue(pos)
      if (fieldIdx == null) {
        val names = current.getType.getFields.asScala.map(_.getName).zipWithIndex.toMap
        fieldIdx = readFields.indices
          .map(i => if (constFlag(i)) -1 else names.getOrElse(physName(i), -1)).toArray
      }
      val idx = fieldIdx(pos)
      if (idx < 0 || current.getFieldRepetitionCount(idx) == 0) null
      else GraftStreamSource.widenValue(
        GraftStreamSource.readValue(current, idx, physType(pos)),
        physType(pos), readFields(pos).dataType)
    }
    override def emit(): InternalRow = {
      val row = new GenericInternalRow(schema.length)
      var i = 0
      while (i < schema.length) {
        row.update(i, valueAt(i))
        i += 1
      }
      row
    }
    override def close(): Unit = reader.close()
  }

  private lazy val backend: Backend =
    if (dataFields.isEmpty) new GroupBackend
    else {
      val vectorized =
        try {
          val vb = new VectorizedBackend
          try { vb.primeFirst(); Some(vb) }
          catch { case scala.util.control.NonFatal(_) => vb.close(); None }
        } catch { case _: UnsupportedOperationException => None }
      vectorized.getOrElse(new GroupBackend)
    }

  // key-column positions resolved once per map, not per row
  private lazy val deleteMapPos = deleteMaps.map { case (keyCols, m) =>
    (keyCols.map(k => readFields.indexWhere(_.name == k)), m)
  }

  // Positional delete vectors addressing THIS file: the union of every
  // applicable vector's position set under this file's part name. The reader
  // reads the whole file in physical order (no row-group skipping), so a
  // running row counter reproduces parquet's row_index exactly.
  private lazy val deletedPositions: java.util.HashSet[java.lang.Long] = {
    val name = p.filePath.substring(p.filePath.lastIndexOf('/') + 1)
    val s = new java.util.HashSet[java.lang.Long]()
    p.deletes.filter(_.positional).foreach { d =>
      val set = GraftDeleteCache.getPositional(d).get(name)
      if (set != null) s.addAll(set)
    }
    s
  }
  private var rowPos = -1L

  private def deleted: Boolean =
    (!deletedPositions.isEmpty && deletedPositions.contains(rowPos)) ||
      deleteMapPos.exists { case (positions, m) =>
        val tuple = positions.map(backend.valueAt)
        val bound = m.get(tuple)
        bound != null && p.writtenAt < bound
      }

  private def advanceCounted(): Boolean = {
    val more = backend.advance()
    if (more) rowPos += 1
    more
  }

  override def next(): Boolean =
    if (metadataRows >= 0) { emitted += 1; emitted <= metadataRows }
    else {
      var more = advanceCounted()
      while (more && p.deletes.nonEmpty && deleted)
        more = advanceCounted()
      more
    }

  // metadata-count rows never touch the backend (no file open at all): in
  // this path every scan-schema field is a constant for the whole file
  // (partition value or evolved default)
  private lazy val metadataRow: InternalRow = {
    val row = new GenericInternalRow(schema.length)
    schema.indices.foreach(i => row.update(i, constValue(i)))
    row
  }
  override def get(): InternalRow =
    if (metadataRows >= 0) metadataRow else backend.emit()

  override def close(): Unit = if (metadataRows < 0) backend.close()
}

object GraftStreamSource {

  /** Name of the `_file` metadata column (the Iceberg `_file` analog). */
  private[sources] val FileMetaCol = "_file"

  /** Physical-to-current widenings the connector reader can replay in
    * place: exactly the numeric up-casts the table's widenColumn writes and
    * this format's physical types can represent.
    */
  private[sources] def widenOk(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (a, b) if a == b => true
      case (IntegerType, LongType) => true
      case (IntegerType, DoubleType) => true
      case (LongType, DoubleType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }

  /** Widen a decoded physical value into the current column type. */
  private[sources] def widenValue(v: Any, from: DataType, to: DataType): Any =
    if (v == null || from == to) v
    else (from, to) match {
      case (IntegerType, LongType) => v.asInstanceOf[Int].toLong
      case (IntegerType, DoubleType) => v.asInstanceOf[Int].toDouble
      case (LongType, DoubleType) => v.asInstanceOf[Long].toDouble
      case (FloatType, DoubleType) => v.asInstanceOf[Float].toDouble
      case _ => throw new IllegalStateException(
        s"graft read: cannot widen $from to $to")
    }

  /** The connector-level evolution replay plan for one data file written
    * under an older schema: simulate the snapshot's evolution chain from the
    * file's epoch forward (the SAME op log the table API's readSnapshot
    * folds over a DataFrame — `GraftTable.applyEvolution`), tracking for
    * every CURRENT column its physical source name and write-time type, or
    * the declared default for columns the file predates. Columns whose
    * replay this reader cannot express (non-numeric widen, a type the
    * physical format never wrote) refuse loudly — never silently null.
    */
  private[sources] def evolutionMapping(snap: graft.table.Snapshot,
      e: graft.table.FileEntry, fullSchema: StructType,
      dir: String): List[GraftColMap] = {
    implicit val fmts: org.json4s.Formats = SnapshotLog.formats
    val writeSchema = DataType.fromJson(snap.schemas(e.writtenAt.toString))
      .asInstanceOf[StructType]
    val chainIds = snap.chain.map(_.snapshotId).sorted
    val epoch = chainIds.foldLeft(0L)((acc, id) => if (id <= e.writtenAt) id else acc)
    val ops = snap.chain
      .filter(st => st.snapshotId > epoch && st.snapshotId <= snap.snapshotId)
      .flatMap(_.ops)
    // currentName → provenance, replayed op by op
    case class Col(name: String, phys: Option[(String, DataType)],
        default: Option[String])
    var cols: Vector[Col] = writeSchema.fields.toVector
      .map(f => Col(f.name, Some((f.name, f.dataType)), None))
    ops.foreach { op =>
      val m = org.json4s.jackson.JsonMethods.parse(op).extract[Map[String, String]]
      m.getOrElse("op", "?") match {
        case "add" =>
          if (!cols.exists(_.name == m("name")))
            cols :+= Col(m("name"), None, m.get("default"))
        case "rename" =>
          cols = cols.map(c => if (c.name == m("from")) c.copy(name = m("to")) else c)
        case "widen" => () // the current type in fullSchema drives the cast
        case "drop" => cols = cols.filterNot(_.name == m("name"))
        case other => throw new IllegalArgumentException(
          s"bad evolution op in $dir: $op")
      }
    }
    fullSchema.fields.toList.flatMap { f =>
      if (e.partitionValues.contains(f.name)) None
      else cols.find(_.name == f.name) match {
        case Some(Col(_, Some((pn, pt)), _)) =>
          require(widenOk(pt, f.dataType),
            s"graft read: ${e.path} in $dir stores ${f.name} as " +
              s"${pt.simpleString} which cannot replay to " +
              s"${f.dataType.simpleString} — use the table API (readLatest)")
          if (pn == f.name && pt == f.dataType) None
          else Some(GraftColMap(f.name, Some(pn), pt.json, None))
        case Some(Col(_, None, d)) => Some(GraftColMap(f.name, None, "", d))
        case None => throw new IllegalStateException(
          s"graft read: column ${f.name} of $dir has no provenance in " +
            s"${e.path}'s evolution chain — use the table API (readLatest)")
      }
    }
  }

  private[sources] def tableSchema(dir: String): StructType = {
    val snaps = SnapshotLog.load(new Configuration(), dir)
    require(snaps.nonEmpty, s"no graft table at $dir")
    DataType.fromJson(snaps.last.schemaJson).asInstanceOf[StructType]
  }

  /** One write body for both connector write routes (path-based `save` and
    * catalog INSERT): align to the table's column order so the data files
    * keep one layout — the append's own shape check still refuses genuine
    * mismatches (missing columns fail the select here) — then the table
    * API's distributed append/overwrite.
    */
  private[sources] def writeInto(dir: String,
      data: org.apache.spark.sql.DataFrame, overwrite: Boolean): Unit = {
    val t = graft.table.GraftTable.load(data.sparkSession, dir)
    val aligned = data.select(tableSchema(dir).fieldNames
      .map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    if (overwrite) t.overwrite(aligned) else t.append(aligned)
  }

  /** A filter participates in file-level pruning when it is a comparison on
    * a NUMERIC column (footer bounds for strings may be writer-truncated —
    * the same exclusion as the table's own stats pruning) or an equality on
    * a partition column, with a non-null literal. AND recurses.
    */
  private[sources] def prunable(f: SFilter, schema: StructType): Boolean = f match {
    case SAnd(l, r) => prunable(l, schema) || prunable(r, schema)
    case SEqualTo(c, v) => v != null && comparableCol(c, schema)
    case SGt(c, v) => v != null && numericCol(c, schema)
    case SGte(c, v) => v != null && numericCol(c, schema)
    case SLt(c, v) => v != null && numericCol(c, schema)
    case SLte(c, v) => v != null && numericCol(c, schema)
    // IN-lists: static IN(...) pushdown and the shape Spark's dynamic
    // partition pruning hands to SupportsRuntimeFiltering.filter — a file
    // survives iff SOME value could live in it. `IN (NULL)` / an empty
    // value list can never match a row (three-valued logic), so such a
    // filter prunes EVERY file — the correct plan when the build side of a
    // pruning join came up empty.
    case SIn(c, vs) => vs != null && comparableCol(c, schema)
    case _ => false
  }

  private[sources] def numericCol(c: String, schema: StructType): Boolean =
    schema.find(_.name == c).exists(_.dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
      case _ => false
    })

  private def comparableCol(c: String, schema: StructType): Boolean =
    numericCol(c, schema) || schema.exists(_.name == c) // partition equality

  /** File-level verdict for the pushed filters: keep the file unless a
    * filter PROVES no row can match — numeric comparisons against the
    * file's footer [min, max], string/typed equality against partition
    * values. Absent bounds keep the file (all-null or untracked columns).
    */
  private[sources] def fileMayMatch(e: graft.table.FileEntry,
      schema: StructType, filters: Array[SFilter]): Boolean =
    filters.forall(mayMatch(e, schema, _))

  private def mayMatch(e: graft.table.FileEntry, schema: StructType,
      f: SFilter): Boolean = f match {
    case SAnd(l, r) => mayMatch(e, schema, l) && mayMatch(e, schema, r)
    case SEqualTo(c, v) if e.partitionValues.contains(c) =>
      v != null && e.partitionValues(c) == v.toString
    case SEqualTo(c, v) => boundsAllow(e, schema, c, v, lowIncl = true, v, highIncl = true)
    case SGt(c, v) => boundsAllow(e, schema, c, v, lowIncl = false, null, highIncl = true)
    case SGte(c, v) => boundsAllow(e, schema, c, v, lowIncl = true, null, highIncl = true)
    case SLt(c, v) => boundsAllow(e, schema, c, null, lowIncl = true, v, highIncl = false)
    case SLte(c, v) => boundsAllow(e, schema, c, null, lowIncl = true, v, highIncl = true)
    case SIn(c, vs) if e.partitionValues.contains(c) =>
      vs.exists(v => v != null && e.partitionValues(c) == v.toString)
    case SIn(c, vs) => vs.exists(v => v != null &&
      boundsAllow(e, schema, c, v, lowIncl = true, v, highIncl = true))
    case _ => true // unknown filter: never prune on it
  }

  /** True unless the file's numeric bounds prove [lo, hi] misses every row. */
  private def boundsAllow(e: graft.table.FileEntry, schema: StructType,
      c: String, lo: Any, lowIncl: Boolean, hi: Any, highIncl: Boolean): Boolean = {
    if (!numericCol(c, schema)) return true
    val st = e.stats.get(c).getOrElse(return true)
    if (st.size < 2) return true // no bounds tracked (nulls-only entry)
    val mn = scala.util.Try(new java.math.BigDecimal(st(0))).getOrElse(return true)
    val mx = scala.util.Try(new java.math.BigDecimal(st(1))).getOrElse(return true)
    def dec(v: Any): Option[java.math.BigDecimal] =
      scala.util.Try(new java.math.BigDecimal(v.toString)).toOption
    val loOk = lo == null || dec(lo).forall(l =>
      if (lowIncl) mx.compareTo(l) >= 0 else mx.compareTo(l) > 0)
    val hiOk = hi == null || dec(hi).forall(h =>
      if (highIncl) mn.compareTo(h) <= 0 else mn.compareTo(h) < 0)
    loOk && hiOk
  }

  /** Plan an ungrouped aggregation against snapshot metadata alone, or None
    * when any condition makes metadata untrustworthy. Returns (result
    * schema, the single result row's values, a plan-visible description).
    *
    * Soundness ledger (each `None` is a case where metadata could lie):
    *  - any delete file: deleted rows still count in footer stats;
    *  - grouping: per-group stats aren't tracked (Iceberg refuses too);
    *  - COUNT: any file with an unreadable footer (rowCount < 0);
    *  - COUNT(col): a file missing the column's null count (all-null files
    *    carry `[nulls]`, stat-bearing files `[min,max,nulls]`);
    *  - MIN/MAX(col): non-numeric col (parquet footers may truncate binary
    *    bounds), or a non-empty file with neither exact bounds nor proof
    *    it is all-null (`nulls == rowCount`); partition columns take the
    *    exact partition value instead. Floats with NaN never get footer
    *    bounds (parquet-mr drops them), so NaN can't corrupt a bound.
    */
  /** Batch time-travel resolution shared by the scan, the metadata
    * aggregate, and schema inference: by retained snapshot id, by the last
    * snapshot at or before a millisecond timestamp, else the head. Unknown
    * targets raise — a typo'd snapshot id must never silently read head. */
  private[sources] def resolveSnapshot(snaps: Seq[graft.table.Snapshot],
      dir: String, id: Option[Long], ts: Option[Long]): Option[graft.table.Snapshot] =
    (id, ts) match {
      case (Some(i), _) =>
        val s = snaps.find(_.snapshotId == i)
        require(s.isDefined,
          s"snapshot-id $i is not retained in $dir (see the snapshots metadata table)")
        s
      case (_, Some(t)) =>
        val s = snaps.filter(_.committedAt <= t).lastOption
        require(s.isDefined,
          s"as-of-timestamp $t predates every retained snapshot of $dir")
        s
      case _ => snaps.lastOption
    }

  private[sources] def planAggregation(dir: String, schema: StructType,
      agg: Aggregation, asOfSnapshot: Option[Long] = None,
      asOfTimestamp: Option[Long] = None): Option[(StructType, Array[Array[Any]], String)] = {
    val head = resolveSnapshot(SnapshotLog.load(new Configuration(), dir),
      dir, asOfSnapshot, asOfTimestamp).getOrElse(return None)
    if (head.deletes.nonEmpty) return None
    val files = head.files
    if (files.exists(_.rowCount < 0)) return None

    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case nr: NamedReference if nr.fieldNames.length == 1 =>
          Some(nr.fieldNames()(0)).filter(c => schema.exists(_.name == c))
        case _ => None
      }
    def nullsOf(f: graft.table.FileEntry, c: String): Option[Long] =
      f.stats.get(c) match {
        case Some(st) if st.size == 3 => st(2).toLongOption
        case Some(st) if st.size == 1 => st(0).toLongOption
        case None if f.rowCount == 0 => Some(0L)
        case _ => None // bounds without null count, or untracked column
      }
    def parse(dt: DataType, s: String): Option[Any] = scala.util.Try[Any](dt match {
      case ByteType => s.toByte
      case ShortType => s.toShort
      case IntegerType => s.toInt
      case LongType => s.toLong
      case FloatType => s.toFloat
      case DoubleType => s.toDouble
    }).toOption
    def ord(dt: DataType): Ordering[Any] = (dt match {
      case ByteType => Ordering.Byte
      case ShortType => Ordering.Short
      case IntegerType => Ordering.Int
      case LongType => Ordering.Long
      case FloatType => Ordering.Float.TotalOrdering
      case DoubleType => Ordering.Double.TotalOrdering
    }).asInstanceOf[Ordering[Any]]

    /** Per-file contribution to MIN/MAX: Some(None) = provably nothing
      * (empty or all-null file), Some(Some(v)) = exact bound, None = the
      * file's bound is unknowable → refuse the pushdown. */
    def bound(f: graft.table.FileEntry, c: String, dt: DataType,
        wantMin: Boolean): Option[Option[Any]] =
      if (f.rowCount == 0) Some(None)
      else if (f.partitionValues.contains(c))
        parse(dt, f.partitionValues(c)).map(Some(_))
      else f.stats.get(c) match {
        case Some(st) if st.size >= 2 =>
          parse(dt, if (wantMin) st(0) else st(1)).map(Some(_))
        case _ if nullsOf(f, c).contains(f.rowCount) => Some(None) // all-null
        case _ => None
      }

    /** Each aggregate becomes (result type, description, per-group
      * evaluator); the evaluator returns None when THAT group's metadata
      * can't answer exactly — which refuses the whole pushdown. */
    type Eval = List[graft.table.FileEntry] => Option[Any]

    def minMaxType(c: String): Option[DataType] = {
      val dt = schema(schema.fieldIndex(c)).dataType
      if (!numericCol(c, schema) && !files.forall(_.partitionValues.contains(c)))
        return None
      dt match {
        case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType =>
          Some(dt)
        case _ => None
      }
    }
    def minMax(fs: List[graft.table.FileEntry], c: String, dt: DataType,
        wantMin: Boolean): Option[Any] = {
      val perFile = fs.map(bound(_, c, dt, wantMin))
      if (perFile.exists(_.isEmpty)) return None
      val vs = perFile.flatten.flatten
      Some(if (vs.isEmpty) null
        else if (wantMin) vs.min(ord(dt)) else vs.max(ord(dt)))
    }

    val planned: Seq[(DataType, String, Eval)] = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        (LongType: DataType, "COUNT(*)",
          ((fs: List[graft.table.FileEntry]) => Some(fs.map(_.rowCount).sum: Any)): Eval)
      case cnt: Count if !cnt.isDistinct =>
        val c = colOf(cnt.column).getOrElse(return None)
        (LongType: DataType, s"COUNT($c)", ((fs: List[graft.table.FileEntry]) => {
          val perFile = fs.map(nullsOf(_, c))
          if (perFile.exists(_.isEmpty)) None
          else Some((fs.map(_.rowCount).sum - perFile.flatten.sum): Any)
        }): Eval)
      case m: Min =>
        val c = colOf(m.column).getOrElse(return None)
        val dt = minMaxType(c).getOrElse(return None)
        (dt, s"MIN($c)", ((fs: List[graft.table.FileEntry]) =>
          minMax(fs, c, dt, wantMin = true)): Eval)
      case m: Max =>
        val c = colOf(m.column).getOrElse(return None)
        val dt = minMaxType(c).getOrElse(return None)
        (dt, s"MAX($c)", ((fs: List[graft.table.FileEntry]) =>
          minMax(fs, c, dt, wantMin = false)): Eval)
      case _ => return None // SUM/AVG/distinct: not derivable from metadata
    }

    // GROUP BY: identity-partition columns recorded in every file — each
    // group is exactly one partition-value tuple, so per-group file sets
    // (and their metadata) are exact. Beyond Iceberg's aggregate pushdown,
    // which refuses any grouping; the decisive plan for the 100 TB
    // "row count per day partition" query — zero data files opened.
    val groupCols = agg.groupByExpressions.toSeq.map(colOf(_).getOrElse(return None))
    if (!groupCols.forall(c => files.forall(_.partitionValues.contains(c))))
      return None
    def groupKey(c: String, raw: String): Option[Any] =
      partitionKeyValue(schema(schema.fieldIndex(c)).dataType, raw)
    val groups: Seq[(Array[Any], List[graft.table.FileEntry])] =
      if (groupCols.isEmpty) Seq((Array.empty[Any], files))
      else files.groupBy(f => groupCols.map(f.partitionValues)).toSeq
        .sortBy(_._1.mkString("\u0000")).map { case (raws, fs) =>
          (groupCols.zip(raws).map { case (c, raw) =>
            groupKey(c, raw).getOrElse(return None)
          }.toArray, fs)
        }

    val rows: Array[Array[Any]] = groups.map { case (key, fs) =>
      key ++ planned.map(_._3(fs).getOrElse(return None))
    }.toArray
    val fields = groupCols.map(c => schema(schema.fieldIndex(c))) ++
      planned.zipWithIndex.map { case ((dt, d, _), i) =>
        StructField(s"agg_$i", dt, nullable = !d.startsWith("COUNT"))
      }
    val desc = (groupCols.map(c => s"GROUP BY $c") ++ planned.map(_._2))
      .mkString(", ")
    Some((StructType(fields), rows, desc))
  }

  /** A recorded partition value as the CATALYST value of the column's type
    * (UTF8String for strings, boxed numerics, days-int for dates) — the
    * currency of grouped metadata aggregates and storage-partitioned join
    * keys. None = the type (or this raw string) can't round-trip exactly,
    * which refuses whatever optimization asked.
    */
  private[sources] def partitionKeyValue(dt: DataType, raw: String): Option[Any] =
    scala.util.Try[Any](dt match {
      case StringType => UTF8String.fromString(raw)
      case ByteType => raw.toByte
      case ShortType => raw.toShort
      case IntegerType => raw.toInt
      case LongType => raw.toLong
      case FloatType => raw.toFloat
      case DoubleType => raw.toDouble
      case DateType => java.time.LocalDate.parse(raw).toEpochDay.toInt
      case BooleanType => raw.toBoolean
    }).toOption

  /** Same classification as the table's incremental readers. */
  private[sources] val RowAdding = Set("append", "add-files")
  private[sources] val Skippable = Set("create", "rewrite-data-files",
    "materialize-deletes", "zorder-rewrite", "sort-rewrite",
    "add-column", "rename-column", "widen-column", "evolve-partitioning")

  private[sources] def readable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType | StringType |
         BooleanType | TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }

  /** Scan-side type support: primitives plus arbitrarily nested ARRAY /
    * STRUCT over them (the table API writes these through Spark's standard
    * 3-level parquet layout; both reader backends decode them — the
    * vectorized reader natively, the group fallback via
    * [[readComplexValue]]). Maps stay out of scope, as in the table's own
    * physical format.
    */
  private[sources] def readableComplex(dt: DataType): Boolean = dt match {
    case ArrayType(e, _) => readableComplex(e)
    case st: StructType => st.fields.forall(f => readableComplex(f.dataType))
    case other => readable(other)
  }

  /** Parquet message type for the streaming sink's staged files — the same
    * physical conventions the table's batch writes pin (TIMESTAMP_MICROS
    * int64, date int32, UTF8 binary), so stats harvest and every reader
    * treat published stream files exactly like append output.
    */
  private[sources] def toMessageType(s: StructType): org.apache.parquet.schema.MessageType = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation => LTA, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val b = Types.buildMessage()
    s.fields.foreach { f =>
      val fb = f.dataType match {
        case LongType => Types.optional(INT64)
        case IntegerType => Types.optional(INT32)
        case DoubleType => Types.optional(DOUBLE)
        case FloatType => Types.optional(FLOAT)
        case BooleanType => Types.optional(BOOLEAN)
        case StringType => Types.optional(BINARY).as(LTA.stringType())
        case TimestampType =>
          Types.optional(INT64).as(LTA.timestampType(true, LTA.TimeUnit.MICROS))
        case TimestampNTZType =>
          Types.optional(INT64).as(LTA.timestampType(false, LTA.TimeUnit.MICROS))
        case DateType => Types.optional(INT32).as(LTA.dateType())
        case other => throw new IllegalArgumentException(
          s"graft streaming sink: column ${f.name} type $other unsupported")
      }
      b.addField(fb.named(f.name))
    }
    b.named("spark_schema")
  }

  private[sources] def readValue(g: org.apache.parquet.example.data.Group,
      idx: Int, dt: DataType): Any = dt match {
    case LongType => g.getLong(idx, 0)
    case IntegerType => g.getInteger(idx, 0)
    case DoubleType => g.getDouble(idx, 0)
    case FloatType => g.getFloat(idx, 0)
    case BooleanType => g.getBoolean(idx, 0)
    case StringType => UTF8String.fromString(g.getString(idx, 0))
    // table writes pin TIMESTAMP_MICROS (int64) — exactly InternalRow's form
    case TimestampType | TimestampNTZType => g.getLong(idx, 0)
    case DateType => g.getInteger(idx, 0)
    case nested @ (_: ArrayType | _: StructType) =>
      readComplexValue(g.getGroup(idx, 0), nested)
    case other => throw new IllegalStateException(s"unreadable type $other")
  }

  /** Decode a nested parquet group into Catalyst internal form. Arrays use
    * Spark's standard 3-level layout (`optional group c (LIST) { repeated
    * group list { <element> } }`); structs are plain nested groups read by
    * FIELD NAME, so old files missing a later-added struct member read it
    * back as null.
    */
  private[sources] def readComplexValue(g: org.apache.parquet.example.data.Group,
      dt: DataType): Any = dt match {
    case ArrayType(elem, _) =>
      // `g` is the LIST-annotated group; its single repeated field holds one
      // wrapper group per element, each wrapping the element value (or
      // nothing, for a null element)
      val n = g.getFieldRepetitionCount(0)
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        val wrapper = g.getGroup(0, i)
        out(i) =
          if (wrapper.getFieldRepetitionCount(0) == 0) null
          else readValue(wrapper, 0, elem)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    case st: StructType =>
      val names = g.getType.getFields.asScala.map(_.getName).zipWithIndex.toMap
      val row = new GenericInternalRow(st.length)
      var i = 0
      while (i < st.length) {
        val idx = names.getOrElse(st(i).name, -1)
        row.update(i,
          if (idx < 0 || g.getFieldRepetitionCount(idx) == 0) null
          else readValue(g, idx, st(i).dataType))
        i += 1
      }
      row
    case other => throw new IllegalStateException(s"unreadable nested type $other")
  }

  private[sources] def castPartitionValue(v: String, dt: DataType): Any = {
    if (v == "__HIVE_DEFAULT_PARTITION__") return null
    dt match {
      case LongType => v.toLong
      case IntegerType => v.toInt
      case DoubleType => v.toDouble
      case StringType => UTF8String.fromString(v)
      case BooleanType => v.toBoolean
      // hive directory renderings: dates plain (`ds=2025-05-06`), timestamps
      // URL-escaped (`ts=2025-05-06 12%3A00%3A00`); InternalRow wants
      // epoch days / epoch micros
      case DateType => java.time.LocalDate.parse(v).toEpochDay.toInt
      case TimestampType | TimestampNTZType =>
        val un = java.net.URLDecoder.decode(v, "UTF-8")
        val ldt = java.time.LocalDateTime.parse(un.replace(' ', 'T'))
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L
      case other => throw new IllegalArgumentException(
        s"graft streaming source: partition column type $other unsupported")
    }
  }
}
