package graft.tools

import java.io.File
import graft.core.GraftTable
import graft.core.GraftTable.{ColStats, FileEntry, Manifest}

/** Measures append-commit latency as a function of table file count,
  * flat (single-level, everything inline) vs leaf (two-level) manifest
  * layout — the numbers behind SCALE.md's "commit cost is O(new files +
  * leaf count), not O(table files)" claim (the WriteAmp discipline:
  * scale claims carry measurements).
  *
  *   runMain graft.tools.CommitCost
  *
  * Method: fabricate N synthetic file entries (per-file stats included —
  * the JSON-realistic shape; commit cost is manifest machinery, data IO
  * is deliberately out of frame), bootstrap a table in each layout, then
  * time a 10-file append commit (pack + put-if-absent manifest write),
  * median of 5. Flat is what a format without the leaf layer pays: the
  * WHOLE file list re-serializes on every commit. Leaf is the
  * production [[GraftTable.packCommit]] policy (inline cap 100, ≤32
  * size-tiered leaves) over a 32-leaf steady state. */
object CommitCost {

  private def entry(i: Int): FileEntry =
    FileEntry(f"data/f-$i%08d.parquet", 1000L, 1L << 20,
      Map("k" -> ColStats("long", Some((i * 1000L).toString),
        Some((i * 1000L + 999).toString), 0)))

  private def timeMedian(reps: Int)(f: Int => Unit): Double = {
    val ts = (0 until reps).map { r =>
      val t0 = System.nanoTime(); f(r); (System.nanoTime() - t0) / 1e6
    }
    ts.sorted.apply(reps / 2)
  }

  private def manifestBytes(dir: String): Long =
    Option(new File(dir, "_graft_log").listFiles).getOrElse(Array.empty[File])
      .filter(_.getName.matches("v\\d{20}\\.json")).map(_.length).max

  def main(args: Array[String]): Unit = {
    val sizes = Seq(1000, 10000, 100000)
    val reps = 5
    val ddl = "k BIGINT"
    println(f"[commitcost] ${"files"}%9s | ${"flat ms"}%9s ${"flat KB"}%9s | " +
      f"${"leaf ms"}%9s ${"leaf KB"}%9s ${"leaves"}%7s")
    sizes.foreach { n =>
      val entries = (0 until n).map(entry)
      val newFiles = (0 until 10).map(i => entry(n + i))

      // FLAT: every commit re-serializes the whole inline list
      val flatDir = java.nio.file.Files.createTempDirectory("graft_ccflat").toString + "/t"
      new File(flatDir, "_graft_log").mkdirs()
      require(GraftTable.tryCommit(flatDir, Manifest(1L, 1L, "bootstrap", ddl, entries)))
      val flatMs = timeMedian(reps) { _ =>
        val cur = GraftTable.currentManifest(flatDir).get
        require(GraftTable.tryCommit(flatDir, Manifest(cur.version + 1, cur.version + 1,
          "append", ddl, cur.files ++ newFiles)))
      }
      val flatKb = manifestBytes(flatDir) / 1024

      // LEAF: 32-leaf steady state, then the production pack policy
      val leafDir = java.nio.file.Files.createTempDirectory("graft_ccleaf").toString + "/t"
      new File(leafDir, "_graft_log").mkdirs()
      val leaves = entries.grouped(math.max(1, math.ceil(n / 32.0).toInt))
        .map(c => GraftTable.writeLeaf(leafDir, c)).toSeq
      require(GraftTable.tryCommit(leafDir,
        Manifest(1L, 1L, "bootstrap", ddl, Nil, None, Some(leaves))))
      val leafMs = timeMedian(reps) { _ =>
        val cur = GraftTable.currentManifest(leafDir).get
        val (files, lvs) = GraftTable.packCommit(leafDir,
          cur.files ++ newFiles, cur.leaves.getOrElse(Nil))
        require(GraftTable.tryCommit(leafDir, Manifest(cur.version + 1, cur.version + 1,
          "append", ddl, files, None, lvs)))
      }
      val leafKb = manifestBytes(leafDir) / 1024
      val nLeaves = GraftTable.currentManifest(leafDir).get.leaves.map(_.size).getOrElse(0)
      println(f"[commitcost] $n%9d | $flatMs%9.1f $flatKb%8dK | " +
        f"$leafMs%9.1f $leafKb%8dK $nLeaves%7d")
    }
  }
}
