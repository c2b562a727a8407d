package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftTable

/** Model-based property test: a seeded random sequence of table
  * operations (overwrite / append / upsert / compact / stream-append with
  * occasional verbatim replays) runs against both the real GraftTable and
  * a driver-side model (a Map snapshot per version). Invariants after
  * EVERY op:
  *  - the live table equals the model's latest snapshot;
  *  - every historical version still reads back as its model snapshot
  *    (time travel is never corrupted by later ops);
  *  - vacuum never changes any retained snapshot's contents.
  * The q11-style equivalence argument, generalized to the whole format. */
class GraftTablePropertySpec extends AnyFunSuite with SparkSpecBase {

  private def kvDf(m: Map[Int, String]) =
    if (m.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType.fromDDL("k INT, v STRING"))
    else df("k INT, v STRING", m.toSeq.sortBy(_._1)
      .map { case (k, v) => Row(Int.box(k), v) }: _*)

  private def readBack(path: String, version: Long): Map[Int, String] =
    GraftTable.readVersion(spark, path, version).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap

  test("random op sequences preserve every snapshot (seeded, 3 runs × 24 ops)") {
    for (seed <- Seq(7, 21, 63)) {
      val rnd = new scala.util.Random(seed)
      val path = java.nio.file.Files.createTempDirectory(s"graft_vtp$seed").toString + "/t"
      // model: version -> full contents; multiset because append can
      // duplicate keys — model values are Seq per key
      var multi = Map.empty[Int, List[String]] // current contents as key -> values
      val history = scala.collection.mutable.ArrayBuffer.empty[Map[Int, List[String]]]
      def liveRows(path: String): Map[Int, List[String]] =
        GraftTable.read(spark, path).collect()
          .map(r => (r.getInt(0), r.getString(1))).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).toList.sorted }
      def kvRows(m: Seq[(Int, String)]) =
        if (m.isEmpty) kvDf(Map.empty)
        else df("k INT, v STRING", m.map { case (k, v) => Row(Int.box(k), v) }: _*)
      var streamBatch = 0L
      for (step <- 0 until 24) {
        val fresh = (0 until rnd.nextInt(4) + 1)
          .map(_ => (rnd.nextInt(12), s"s$seed-$step-${rnd.nextInt(100)}"))
        rnd.nextInt(6) match {
          case 0 =>
            GraftTable.overwrite(kvRows(fresh), path)
            multi = fresh.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toList.sorted }
          case 1 | 2 =>
            if (GraftTable.exists(path)) {
              GraftTable.append(kvRows(fresh), path)
              multi = fresh.foldLeft(multi) { case (m, (k, v)) =>
                m + (k -> (v :: m.getOrElse(k, Nil)).sorted)
              }
            } else {
              GraftTable.overwrite(kvRows(fresh), path)
              multi = fresh.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toList.sorted }
            }
          case 3 =>
            // keyed upsert: delta must be key-unique (replace semantics)
            val delta = fresh.toMap.toSeq
            GraftTable.upsertByKey(spark, path, kvRows(delta), Seq("k"))
            multi = delta.foldLeft(multi) { case (m, (k, v)) => m + (k -> List(v)) }
          case 4 =>
            // compact: contents must not change; may be a version no-op
            // (≤1 small file) — the history loop below records either way
            if (GraftTable.exists(path)) {
              GraftTable.compactFiles(spark, path, targetBytes = 1L << 20): Unit
            } else { GraftTable.overwrite(kvRows(fresh), path); multi = fresh.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toList.sorted } }
          case 5 =>
            if (GraftTable.exists(path)) {
              val replay = rnd.nextBoolean() && streamBatch > 0
              val id = if (replay) streamBatch - 1 else streamBatch
              val v = GraftTable.appendStream(kvRows(fresh), path, "s", id)
              if (!replay) {
                streamBatch += 1
                multi = fresh.foldLeft(multi) { case (m, (k, v2)) =>
                  m + (k -> (v2 :: m.getOrElse(k, Nil)).sorted)
                }
              } else assert(v == -1L, "replayed stream batch must be a no-op")
            } else { GraftTable.overwrite(kvRows(fresh), path); multi = fresh.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toList.sorted } }
          case _ => ()
        }
        // history tracking: one snapshot per committed version
        while (history.size < GraftTable.currentVersion(path).get.toInt) history += multi
        assert(liveRows(path) == multi, s"seed=$seed step=$step live mismatch")
      }
      // every retained version equals its recorded model snapshot
      val versions = GraftTable.versions(path).map(_._1)
      assert(versions.size == history.size, s"seed=$seed: ${versions.size} vs ${history.size}")
      versions.foreach { v =>
        val got = GraftTable.readVersion(spark, path, v).collect()
          .map(r => (r.getInt(0), r.getString(1))).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).toList.sorted }
        assert(got == history(v.toInt - 1), s"seed=$seed version $v drifted")
      }
      // vacuum to the last 3 versions: retained snapshots unchanged
      GraftTable.vacuum(path, keepVersions = 3)
      val retained = GraftTable.versions(path).map(_._1)
      assert(retained.size <= 3)
      retained.foreach { v =>
        val got = GraftTable.readVersion(spark, path, v).collect()
          .map(r => (r.getInt(0), r.getString(1))).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).toList.sorted }
        assert(got == history(v.toInt - 1), s"seed=$seed version $v broken by vacuum")
      }
    }
  }
}
