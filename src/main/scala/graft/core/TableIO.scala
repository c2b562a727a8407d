package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Parquet table IO with the reference's materialization semantics
  * (reference dbt_project.yml:35-43 CTAS; models/dwh/\*.sql incremental
  * `unique_key` upsert — SURVEY §2.1 S3/S4).
  *
  * Writes are atomic via write-to-temp-then-swap, which also makes
  * self-overwrite (read table T, transform, write T) safe — plain
  * `mode("overwrite")` on the path being read would truncate the input
  * before the job runs.
  *
  * Scale note: on a real cluster this class is the seam where a table
  * format (Delta/Iceberg `MERGE INTO`) slots in; the anti-join + union
  * rewrite below is the format-free equivalent and is partition-prunable
  * when `partitionBy` is set (only partitions containing touched keys are
  * rewritten in the Delta upgrade path — here we keep whole-table rewrite
  * for plain Parquet correctness).
  */
object TableIO {

  /** Crash recovery: overwriteAtomic has a window between moving the live
    * table to `.__old__` and moving the new data in. If a crash strikes
    * there, the data survives only under `.__old__`; every entry point calls
    * this first so the next process restores it instead of silently treating
    * the table as absent (which would, e.g., rebuild a dimension from one
    * delta and lose all history). */
  private def recover(path: String): Unit = {
    val target = new File(path)
    val old = new File(path + ".__old__")
    if (!target.exists && old.exists)
      try Files.move(old.toPath, target.toPath, StandardCopyOption.ATOMIC_MOVE): Unit
      catch { // concurrent reader won the restore race — target exists now
        case _: java.nio.file.FileSystemException if target.exists => ()
      }
  }

  def exists(path: String): Boolean = {
    recover(path)
    val f = new File(path)
    f.exists && (f.isFile || f.listFiles != null && f.listFiles.nonEmpty)
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    recover(path)
    spark.read.parquet(path)
  }

  def readOrEmpty(spark: SparkSession, path: String, like: DataFrame): DataFrame =
    if (exists(path)) spark.read.parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], like.schema)

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Atomic overwrite: write to `<path>.__tmp__`, then swap. Readers racing
    * the swap see either the old or the new table; a crash mid-swap is
    * healed by [[recover]] on the next access. */
  def overwriteAtomic(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    recover(path)
    val tmp = path + ".__tmp__"
    deleteRecursively(new File(tmp))
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(tmp)
    val old = new File(path + ".__old__")
    deleteRecursively(old)
    val target = new File(path)
    if (target.exists) Files.move(Paths.get(path), old.toPath, StandardCopyOption.ATOMIC_MOVE): Unit
    // a concurrent reader's recover() can resurrect .__old__ into the target
    // between our two moves; the writer must win — re-stash the resurrected
    // stale copy and retry committing the new data (bounded: each retry
    // requires another reader to lose the race in a microsecond window)
    var attempts = 0
    var committed = false
    while (!committed) {
      try {
        Files.move(Paths.get(tmp), Paths.get(path), StandardCopyOption.ATOMIC_MOVE): Unit
        committed = true
      } catch {
        case e: java.nio.file.FileSystemException if target.exists && attempts < 5 =>
          attempts += 1
          deleteRecursively(old)
          Files.move(Paths.get(path), old.toPath, StandardCopyOption.ATOMIC_MOVE): Unit
        case e: Throwable => throw e
      }
    }
    deleteRecursively(old)
  }

  /** Incremental `unique_key` upsert (SURVEY S4): existing rows whose key
    * appears in `delta` are replaced; everything else is kept; delta rows are
    * appended. First run = plain write. */
  def upsertByKey(spark: SparkSession, path: String, delta: DataFrame, keys: Seq[String]): Unit = {
    if (!exists(path)) overwriteAtomic(delta, path)
    else {
      val existing = spark.read.parquet(path)
      val keep = existing.join(delta.select(keys.map(org.apache.spark.sql.functions.col): _*).distinct(), keys, "left_anti")
      overwriteAtomic(keep.unionByName(delta.select(existing.columns.map(org.apache.spark.sql.functions.col): _*)), path)
    }
  }
}
