package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SqlFunctions._
import graft.pipeline.{LoadStep, Pipeline, WarehouseBuilder}
import graft.scd.Scd2Config

/** End-to-end warehouse lifecycle over two incremental cycles: staging CDC
  * envelope → HWM-filtered SCD2 dim → temporal fact with dummy fallback →
  * late-arriving-dimension repair. The reference's full E1/E2 loop. */
class PipelineSpec extends AnyFunSuite with SparkSpecBase {

  test("Pipeline runs steps in dependency order and rejects cycles") {
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    val p = new Pipeline(Seq(
      LoadStep("c", Seq("b"))(_ => ran += "c"),
      LoadStep("a", Nil)(_ => ran += "a"),
      LoadStep("b", Seq("a"))(_ => ran += "b")))
    p.run(spark)
    assert(ran.toSeq == Seq("a", "b", "c"))
    assertThrows[IllegalArgumentException] {
      new Pipeline(Seq(LoadStep("x", Seq("y"))(_ => ()), LoadStep("y", Seq("x"))(_ => ())))
    }
  }

  test("fact load resolves SKs against multiple dimensions") {
    val root = java.nio.file.Files.createTempDirectory("graft_wh2").toString
    val t = "2024-03-01 00:00:00"
    val users = df("id INT, nm STRING", Row(Int.box(1), "u1"))
    val items = df("id INT, nm STRING", Row(Int.box(7), "i7"))
    val sales = df("sid INT, uid INT, iid INT, sd STRING",
      Row(Int.box(500), Int.box(1), Int.box(7), "2024-02-01 00:00:00"))
    val wb = new WarehouseBuilder(root)
      .loadStaging("stg_u", _ => users, Seq("user_id" -> col("id"), "name" -> col("nm")),
        Seq("user_id", "name"), processTs = lit(t).cast("timestamp"))
      .loadStaging("stg_i", _ => items, Seq("item_id" -> col("id"), "name" -> col("nm")),
        Seq("item_id", "name"), processTs = lit(t).cast("timestamp"))
      .loadStaging("stg_s", _ => sales, Seq("sale_id" -> col("sid"), "user_id" -> col("uid"),
        "item_id" -> col("iid"), "sale_date" -> col("sd").cast("timestamp")),
        Seq("sale_id"), processTs = lit(t).cast("timestamp"))
      .loadDim("dim_u", "stg_u", Scd2Config(Seq("user_id"), "dl_process_date",
        payload = Seq("name")), "user_id")
      .loadDim("dim_i", "stg_i", Scd2Config(Seq("item_id"), "dl_process_date",
        payload = Seq("name")), "item_id")
      .loadFact("fact_sale", "stg_s", Seq("sale_id"), "sale_date",
        dims = Seq(("dim_u", "user_id", "user_id"), ("dim_i", "item_id", "item_id")))
    wb.build().run(spark)
    val fact = spark.read.parquet(s"$root/dwh/fact_sale")
    val r = fact.select("dim_u_sk", "dim_i_sk").head
    val uSk = spark.read.parquet(s"$root/dwh/dim_u").select("sk").head.getString(0)
    val iSk = spark.read.parquet(s"$root/dwh/dim_i").select("sk").head.getString(0)
    assert(r.getString(0) == uSk && r.getString(1) == iSk)
  }

  test("two-cycle warehouse: SCD2 versions, dummy fallback, late-dim repair") {
    val root = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val dummy = spark.range(1).select(dummySk).head.getString(0)

    var users: DataFrame = null
    var orders: DataFrame = null
    def cycle(usersTs: String, ordersTs: String): Unit = {
      val wb = new WarehouseBuilder(root)
        .loadStaging("stg_users", _ => users,
          Seq("user_id" -> col("id"), "name" -> col("nm")),
          hashCols = Seq("user_id", "name"), processTs = lit(usersTs).cast("timestamp"))
        .loadStaging("stg_orders", _ => orders,
          Seq("order_id" -> col("oid"), "user_id" -> col("uid"),
            "order_date" -> col("od").cast("timestamp")),
          hashCols = Seq("order_id", "user_id"), processTs = lit(ordersTs).cast("timestamp"))
        .loadDim("dim_user", "stg_users",
          Scd2Config(Seq("user_id"), "dl_process_date", payload = Seq("name")),
          businessKeyDesc = "user_id")
        .loadFact("fact_order", "stg_orders", factKeys = Seq("order_id"),
          probeTs = "order_date", dims = Seq(("dim_user", "user_id", "user_id")))
      wb.build().run(spark)
    }

    // cycle 1: users 1,2; order 100→user1, order 101→user3 (not yet a dim member)
    users = df("id INT, nm STRING", Row(Int.box(1), "alice"), Row(Int.box(2), "bob"))
    orders = df("oid INT, uid INT, od STRING",
      Row(Int.box(100), Int.box(1), "2024-02-01 00:00:00"),
      Row(Int.box(101), Int.box(3), "2024-02-02 00:00:00"))
    cycle("2024-03-01 00:00:00", "2024-03-01 00:00:00")

    val dim1 = spark.read.parquet(s"$root/dwh/dim_user")
    assert(dim1.count() == 2 && dim1.filter(col("is_active") === "Y").count() == 2)
    val fact1 = spark.read.parquet(s"$root/dwh/fact_order")
    val sk101 = fact1.filter(col("order_id") === 101).select("dim_user_sk").head.getString(0)
    assert(sk101 == dummy) // user 3 unknown → dummy member SK

    // cycle 2: alice renamed (new version), user 3 arrives late
    users = df("id INT, nm STRING", Row(Int.box(1), "alicia"),
      Row(Int.box(2), "bob"), Row(Int.box(3), "carol"))
    // orders staging keeps the old stamp → empty fact delta → ONLY the
    // post-load repair pass (C7) can fix order 101's dummy SK
    cycle("2024-03-02 00:00:00", "2024-03-01 00:00:00")

    val dim2 = spark.read.parquet(s"$root/dwh/dim_user")
    // alice: 2 versions (one active); bob: still 1 (no-op suppressed); carol: 1
    assert(dim2.filter(col("user_id") === 1).count() == 2)
    assert(dim2.filter(col("user_id") === 1 && col("is_active") === "Y")
      .select("name").head.getString(0) == "alicia")
    assert(dim2.filter(col("user_id") === 2).count() == 1)
    assert(dim2.filter(col("user_id") === 3).count() == 1)

    val fact2 = spark.read.parquet(s"$root/dwh/fact_order")
    val repaired = fact2.filter(col("order_id") === 101).select("dim_user_sk").head.getString(0)
    val carolSk = dim2.filter(col("user_id") === 3).select("sk").head.getString(0)
    assert(repaired == carolSk) // late-arriving dim repaired (C7)
    // order 100 resolves to the version valid at its order date (v1: alice)
    val sk100 = fact2.filter(col("order_id") === 100).select("dim_user_sk").head.getString(0)
    val aliceV1 = dim2.filter(col("user_id") === 1 && col("version_no") === 1)
      .select("sk").head.getString(0)
    assert(sk100 == aliceV1)
  }
}
