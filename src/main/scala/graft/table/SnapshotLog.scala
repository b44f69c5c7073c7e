package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import java.nio.charset.StandardCharsets

/** One data file tracked by a snapshot.
  *
  * @param path            path relative to the table's `data/` root
  * @param partitionValues hive-style partition values parsed from the path
  *                        (string-encoded; cast to the partition schema on use)
  * @param rowCount        rows in the file (from the parquet footer; -1 unknown)
  * @param sizeBytes       file length
  */
case class FileEntry(
    path: String,
    partitionValues: Map[String, String],
    rowCount: Long,
    sizeBytes: Long)

/** One committed table version — the analog of an Iceberg snapshot + manifest
  * list (reference surface: `SELECT snapshot_id, committed_at FROM t.snapshots`,
  * `iceberg-tests/sql/spark/open_catalog/bulk_insert_sales_events.sql:14-17`).
  *
  * The full data-file list is embedded per snapshot. Commits are therefore
  * metadata-only for untouched files: an append stores references to the parent's
  * files plus the new ones, never rewriting data. At 100 TB the file list itself
  * gets large — `rewriteManifests` consolidates, and the list lives in one JSON
  * doc per snapshot rather than per-file objects in a database.
  */
case class Snapshot(
    snapshotId: Long,
    parentId: Option[Long],
    committedAt: Long,
    operation: String,
    schemaJson: String,
    partitionCols: List[String],
    files: List[FileEntry],
    summary: Map[String, String])

/** Persistence for the snapshot log: `<table>/_graft_log/v%08d.json`, one doc per
  * snapshot, committed by atomic rename (write `.tmp`, rename to final name — the
  * rename fails if a concurrent writer got there first, giving optimistic
  * concurrency like Iceberg's catalog swap). `manifest-%08d.json` holds a
  * consolidated array of all snapshots ≤ N (written by `rewriteManifests`), so a
  * reader loads one consolidated doc plus any newer deltas instead of N files.
  */
object SnapshotLog {
  implicit val formats: Formats = DefaultFormats

  val LogDir = "_graft_log"
  val DataDir = "data"

  def logPath(tableDir: String) = new Path(tableDir, LogDir)
  def dataPath(tableDir: String) = new Path(tableDir, DataDir)

  private def snapFileName(id: Long) = f"v$id%08d.json"
  private val SnapRe = "v(\\d{8})\\.json".r
  private val ManifestRe = "manifest-(\\d{8})\\.json".r

  def fs(conf: Configuration, dir: String): FileSystem = new Path(dir).getFileSystem(conf)

  private def writeString(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def readString(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Atomically publish a snapshot doc. Returns false if the version already
    * exists (concurrent commit) — callers retry with a fresh id.
    */
  def commit(conf: Configuration, tableDir: String, snap: Snapshot): Boolean = {
    val f = fs(conf, tableDir)
    val dir = logPath(tableDir)
    f.mkdirs(dir)
    val finalPath = new Path(dir, snapFileName(snap.snapshotId))
    if (f.exists(finalPath)) return false
    val tmp = new Path(dir, snapFileName(snap.snapshotId) + s".tmp-${java.util.UUID.randomUUID()}")
    writeString(f, tmp, Serialization.write(snap))
    f.rename(tmp, finalPath) && { f.delete(tmp, false); true } || { f.delete(tmp, false); false }
  }

  /** All live snapshots, ascending by id: newest consolidated manifest plus any
    * newer per-snapshot deltas.
    */
  def load(conf: Configuration, tableDir: String): Seq[Snapshot] = {
    val f = fs(conf, tableDir)
    val dir = logPath(tableDir)
    if (!f.exists(dir)) return Seq.empty
    val names = f.listStatus(dir).map(_.getPath.getName)
    val manifests = names.collect { case ManifestRe(n) => n.toLong }
    val upTo = if (manifests.isEmpty) -1L else manifests.max
    val base: Seq[Snapshot] =
      if (upTo < 0) Seq.empty
      else Serialization.read[List[Snapshot]](readString(f, new Path(dir, f"manifest-$upTo%08d.json")))
    val deltas = names.collect { case SnapRe(n) if n.toLong > upTo => n.toLong }.sorted
      .map(id => Serialization.read[Snapshot](readString(f, new Path(dir, snapFileName(id)))))
    (base ++ deltas).sortBy(_.snapshotId)
  }

  /** Consolidate the log into one manifest doc and drop the per-snapshot files it
    * covers (our analog of `rewrite_manifests`, reference
    * `blob_dfs/blob-dfs_bench.py:146-149`).
    */
  def rewriteManifests(conf: Configuration, tableDir: String): Int = {
    val snaps = load(conf, tableDir)
    if (snaps.isEmpty) return 0
    val f = fs(conf, tableDir)
    val dir = logPath(tableDir)
    val maxId = snaps.map(_.snapshotId).max
    val tmp = new Path(dir, f"manifest-$maxId%08d.json.tmp")
    writeString(f, tmp, Serialization.write(snaps.toList))
    f.rename(tmp, new Path(dir, f"manifest-$maxId%08d.json"))
    // Remove superseded per-snapshot docs and older manifests.
    f.listStatus(dir).map(_.getPath).foreach { p =>
      p.getName match {
        case SnapRe(n) if n.toLong <= maxId => f.delete(p, false)
        case ManifestRe(n) if n.toLong < maxId => f.delete(p, false)
        case _ =>
      }
    }
    snaps.size
  }

  /** Replace the whole log (used by expireSnapshots). */
  def replaceAll(conf: Configuration, tableDir: String, snaps: Seq[Snapshot]): Unit = {
    val f = fs(conf, tableDir)
    val dir = logPath(tableDir)
    val maxId = snaps.map(_.snapshotId).max
    val tmp = new Path(dir, f"manifest-$maxId%08d.json.tmp")
    writeString(f, tmp, Serialization.write(snaps.toList))
    f.listStatus(dir).map(_.getPath).foreach { p =>
      p.getName match {
        case SnapRe(_) | ManifestRe(_) => f.delete(p, false)
        case _ =>
      }
    }
    f.rename(tmp, new Path(dir, f"manifest-$maxId%08d.json"))
  }
}
