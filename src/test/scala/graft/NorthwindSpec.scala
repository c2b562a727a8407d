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

  test("second run over unchanged sources is a no-op for dim version counts") {
    val before = spark.read.parquet(s"$root/dwh/dim_customer").count()
    NorthwindWarehouse.runCycle(spark, sfDir, root, 2) // replay cycle 2
    val after = spark.read.parquet(s"$root/dwh/dim_customer").count()
    assert(before == after, "replaying an already-processed batch changed the dimension")
  }
}
