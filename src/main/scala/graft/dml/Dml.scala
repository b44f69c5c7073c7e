package graft.dml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.table.{FileEntry, GraftTable, Snapshot}

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

  /** Split a snapshot's files into (files containing rows matching pred,
    * files provably untouched), remembering the snapshot the plan is based
    * on — commitRewrite validates nothing advanced past it.
    */
  private def planFiles(t: GraftTable, pred: Column): (Seq[FileEntry], Seq[FileEntry], Snapshot) = {
    val planned = t.latest
    val withFile = t.readSnapshot(planned).withColumn("_file", input_file_name())
    val touched = withFile.filter(pred).select("_file").distinct().collect()
      .map(_.getString(0)).toSet
    val (m, u) = planned.files.partition(e => touched.exists(_.endsWith("/" + e.path)))
    (m, u, planned)
  }

  /** D1 — `UPDATE t SET ... WHERE pred` (ref update_sales_events.sql:3-5). */
  def update(t: GraftTable, pred: Column, assignments: Map[String, Column]): Snapshot = {
    val (matched, untouched, planned) = planFiles(t, pred)
    if (matched.isEmpty) return t.latest
    val rewritten = assignments.foldLeft(t.readFiles(matched)) { case (df, (c, e)) =>
      df.withColumn(c, when(pred, e).otherwise(col(c)))
    }
    t.commitRewrite(rewritten, untouched, "update", basedOn = Some(planned))
  }

  /** D2 — `DELETE FROM t WHERE pred` (ref delete_sales_events.sql:3-4). */
  def delete(t: GraftTable, pred: Column): Snapshot = {
    val (matched, untouched, planned) = planFiles(t, pred)
    if (matched.isEmpty) return t.latest
    val rewritten = t.readFiles(matched).filter(!pred)
    t.commitRewrite(rewritten, untouched, "delete", basedOn = Some(planned))
  }

  /** D3/J1/J2 — `MERGE INTO t USING source ON t.key = source.key`
    * (ref merge_sales_events.sql:4-21).
    *
    * `updateSet` maps target columns to expressions over the joined row
    * (reference source columns as `src.<col>`); rows with no match insert the
    * full source row when `insertNotMatched` (WHEN NOT MATCHED THEN INSERT).
    * Matched rows in untouched files are impossible by construction: every
    * file containing a key present in `source` is rewritten.
    */
  def merge(t: GraftTable, source: DataFrame, key: String,
      updateSet: Map[String, Column], insertNotMatched: Boolean): Snapshot = {
    val src = source.alias("src")
    // Plan matched files via a broadcast semi-join against the source keys —
    // the source never collects to the driver (a VALUES-sized source
    // broadcasts trivially; a large source still only ships its key column).
    val planned = t.latest
    val srcKeys = broadcast(source.select(col(key)).distinct())
    val withFile = t.readSnapshot(planned).withColumn("_file", input_file_name())
    val touched = withFile.join(srcKeys, Seq(key), "left_semi")
      .select("_file").distinct().collect().map(_.getString(0)).toSet
    val (matched, untouched) = planned.files.partition(e =>
      touched.exists(_.endsWith("/" + e.path)))
    // Rewrite matched files: left-join to source, apply updates where joined.
    val tgt = t.readFiles(matched).alias("tgt")
    val joined = tgt.join(src, col(s"tgt.$key") === col(s"src.$key"), "left")
    val hasMatch = col(s"src.$key").isNotNull
    val updatedCols = t.schema.fieldNames.map { c =>
      updateSet.get(c) match {
        case Some(e) => when(hasMatch, e).otherwise(col(s"tgt.$c")).as(c)
        case None => col(s"tgt.$c").as(c)
      }
    }
    val rewritten = joined.select(updatedCols.toSeq: _*)
    // WHEN NOT MATCHED THEN INSERT: source rows whose key is absent from the
    // WHOLE target (anti-join against the full table, not just matched files).
    val result =
      if (!insertNotMatched) rewritten
      else {
        val allKeys = t.readLatest().select(key)
        val inserts = source.join(allKeys, Seq(key), "left_anti")
          .select(t.schema.fieldNames.map(col).toSeq: _*)
        rewritten.unionByName(inserts)
      }
    t.commitRewrite(result, untouched, "merge", basedOn = Some(planned))
  }
}
