package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SqlFunctions
import graft.northwind.NorthwindWarehouse

/** End-to-end invariants of the concrete Northwind warehouse (the oracle
  * gate q36/q39-q41 proves value parity; these pin OPERATIONAL properties
  * of the two-cycle run that value equality alone can't see). */
class NorthwindSpec extends AnyFunSuite with SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  // one shared two-cycle build for all cases
  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_nw_spec").toString
    NorthwindWarehouse.buildWarehouse(spark, sfDir, r)
    r
  }

  test("repair post-hook resolves every late-arriving customer SK by cycle 2") {
    val fo = spark.read.parquet(s"$root/dwh/fact_order")
    val dummies = fo.filter(col("customer_sk") === SqlFunctions.dummySk ||
      col("employee_sk") === SqlFunctions.dummySk ||
      col("shipper_sk") === SqlFunctions.dummySk)
    assert(dummies.count() == 0, "dummy SKs survived the cycle-2 repair")
    // repaired rows carry the cycle-2 stamp while their load time stays T1
    val repaired = fo.filter(col("dl_process_date") === to_timestamp(lit("2024-01-01")) &&
      col("updated_at") === to_timestamp(lit("2024-02-01")))
    assert(repaired.count() > 0, "expected late-customer rows bumped by the repair")
  }

  test("fact_order is year-partitioned on disk") {
    val dirs = Option(new java.io.File(s"$root/dwh/fact_order").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("order_year=")),
      s"expected order_year partition dirs, got ${dirs.toSeq}")
  }

  private def yearDirBytes(path: String): Map[String, Map[String, Seq[Byte]]] = {
    def files(f: java.io.File, prefix: String = ""): Map[String, Seq[Byte]] =
      Option(f.listFiles).getOrElse(Array.empty).flatMap { c =>
        if (c.isDirectory) files(c, s"$prefix${c.getName}/")
        else if (c.getName.startsWith(".") || c.getName.startsWith("_")) Nil
        else Seq(s"$prefix${c.getName}" ->
          java.nio.file.Files.readAllBytes(c.toPath).toSeq)
      }.toMap
    Option(new java.io.File(path).listFiles).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("order_year="))
      .map(d => d.getName -> files(d)).toMap
  }

  test("fact_order_details cycle-2 upsert rewrites EXACTLY the delta's year partitions") {
    // independent two-cycle run with a fingerprint taken between cycles:
    // untouched year dirs must be byte-identical, touched ones must change,
    // and the touched set must equal the years of the cycle-2 delta
    val r = java.nio.file.Files.createTempDirectory("graft_nw_part").toString
    NorthwindWarehouse.runCycle(spark, sfDir, r, 1)
    val before = yearDirBytes(s"$r/dwh/fact_order_details")
    assert(before.size > 1, s"expected multiple year partitions, got ${before.keys}")
    NorthwindWarehouse.runCycle(spark, sfDir, r, 2)
    val after = yearDirBytes(s"$r/dwh/fact_order_details")
    // cycle-2 delta = detail rows staged at T2; their years via the header
    val t2 = to_timestamp(lit("2024-02-01"))
    val det2 = spark.read.parquet(s"$r/staging/stg_order_details")
      .filter(col("dl_process_date") >= t2).select("order_id").distinct()
    val hdr = spark.read.parquet(s"$r/staging/stg_orders")
      .select(col("order_id"), col("order_date")).dropDuplicates("order_id")
    val deltaYears = det2.join(hdr, Seq("order_id"))
      .select(year(col("order_date")).as("y")).distinct()
      .collect().map(r0 => s"order_year=${r0.getInt(0)}").toSet
    val changed = (before.keySet ++ after.keySet)
      .filter(d => before.get(d) != after.get(d))
    assert(changed == deltaYears,
      s"rewritten partitions $changed != delta years $deltaYears")
    assert((before.keySet -- changed).nonEmpty || deltaYears == before.keySet)
  }

  test("audit HWMs advance to the cycle-2 batch time for every model") {
    val audit = spark.read.parquet(s"$root/audit/audit_control")
    val lagging = audit.filter(col("hwm_date") < to_timestamp(lit("2024-02-01")))
    assert(lagging.count() == 0,
      s"audit rows below T2: ${lagging.collect().mkString(",")}")
  }

  test("SCD2 dims: late-arriving customers have one version effective 1900; updates have two") {
    val dim = spark.read.parquet(s"$root/dwh/dim_customer")
    // a late customer (custkey % 7 == 2 → 1-based id 3) arrives at T2 but
    // still gets the 1900-forced first version
    val late = dim.filter(col("customer_id") === "3")
    assert(late.count() == 1)
    assert(late.head.getAs[java.sql.Timestamp]("effective_date") ==
      ts("1900-01-01 00:00:00"))
    // an updated customer (id-1 % 10 == 3, not late, e.g. 0-based 13 → "14")
    val upd = dim.filter(col("customer_id") === "14")
      .select("version_no", "is_active").collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(upd.toSeq == Seq((1, "N"), (2, "Y")), s"got ${upd.toSeq}")
  }

  test("dim_customer maintains through a foreachBatch stream over the CDC feed (§2.9 drop-in)") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    import graft.core.TableIO
    import graft.northwind.{NorthwindSources, NorthwindStaging}
    import graft.scd.Scd2
    val dir = java.nio.file.Files.createTempDirectory("graft_nw_stream").toString
    val full = NorthwindSources.customers(spark, sfDir, cycle = 2)
    // the raw CDC feed arrives as two append-only files → two micro-batches.
    // FileStreamSource admits files in mtime order; back-date the first
    // batch's files so the order can't tie on fast filesystems
    full.filter(col("src_ts") === NorthwindSources.t1)
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    new java.io.File(s"$dir/in").listFiles()
      .foreach(f => f.setLastModified(System.currentTimeMillis() - 60000): Unit)
    full.filter(col("src_ts") === NorthwindSources.t2)
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val dimPath = s"$dir/dim"
    val cfg = NorthwindWarehouse.dimCustomerCfg
    val q = spark.readStream.schema(full.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the SAME transformers the batch runner uses, per micro-batch
        val s = batch.sparkSession
        val hwm =
          if (TableIO.exists(dimPath))
            TableIO.read(s, dimPath).agg(max(col("updated_at"))).first().getTimestamp(0)
          else java.sql.Timestamp.valueOf("1900-01-01 00:00:00")
        val delta = NorthwindWarehouse.stgDimCustomer(
          s, NorthwindStaging.stgCustomers(batch), lit(hwm))
        val existing = TableIO.readOrEmpty(s, dimPath,
          Scd2.fromHistory(delta, cfg, "customer_sk"))
        TableIO.overwriteAtomic(Scd2.merge(existing, delta, cfg, "customer_sk"), dimPath)
      }
      .start()
    assert(q.awaitTermination(120000), "stream did not finish within the timeout")
    assert(canon(spark.read.parquet(dimPath)) ==
      canon(spark.read.parquet(s"$root/dwh/dim_customer")),
      "streamed dim diverged from the two-cycle batch dim")
  }

  test("second run over unchanged sources is a no-op for dim version counts") {
    val before = spark.read.parquet(s"$root/dwh/dim_customer").count()
    NorthwindWarehouse.runCycle(spark, sfDir, root, 2) // replay cycle 2
    val after = spark.read.parquet(s"$root/dwh/dim_customer").count()
    assert(before == after, "replaying an already-processed batch changed the dimension")
  }

  test("dim_customer on GraftTable: same final state, per-cycle history for free") {
    import graft.core.GraftTable
    val gtRoot = java.nio.file.Files.createTempDirectory("graft_nw_gt").toString
    val path = NorthwindWarehouse.buildDimCustomerOnGraftTable(spark, sfDir, gtRoot)
    // value parity with the plain-parquet warehouse dim (q123's oracle
    // gates this against DuckDB too; here against the sibling build)
    assert(canon(GraftTable.read(spark, path)) ==
      canon(spark.read.parquet(s"$root/dwh/dim_customer")),
      "GraftTable-backed dim diverged from the plain-parquet dim")
    // two cycles → two committed versions, and version 1 IS cycle 1:
    // strictly fewer rows (cycle 2 adds late arrivals + new versions) and
    // reachable both by version and by any timestamp between the commits
    val vs = GraftTable.versions(path)
    assert(vs.map(_._3) == Seq("overwrite", "overwrite"), s"got $vs")
    val v1 = GraftTable.readVersion(spark, path, vs(0)._1)
    val v2 = GraftTable.readVersion(spark, path, vs(1)._1)
    assert(v1.count() < v2.count(), "cycle 2 added no history?")
    assert(canon(v2) == canon(GraftTable.read(spark, path)))
    assert(canon(GraftTable.readAsOf(spark, path, vs(0)._2)) == canon(v1),
      "AT(cycle-1 commit instant) must replay cycle 1's dim")
  }
}
