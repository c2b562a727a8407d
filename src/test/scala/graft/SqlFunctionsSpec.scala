package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SqlFunctions._

class SqlFunctionsSpec extends AnyFunSuite with SparkSpecBase {

  test("surrogateKey joins string casts with '-' and hashes") {
    val out = df("a INT, b STRING", Row(Int.box(1), "x"))
      .select(surrogateKey(col("a"), col("b")).as("sk")).head.getString(0)
    assert(out == md5Hex("1-x"))
  }

  test("surrogateKey maps NULL to empty string, keeping the separator") {
    val out = df("a INT, b STRING, c STRING", Row(Int.box(7), null, "z"))
      .select(surrogateKey(col("a"), col("b"), col("c")).as("sk")).head.getString(0)
    assert(out == md5Hex("7--z")) // null middle → '', both separators remain
  }

  test("dummySk is the SK of key 0 at the 1900 epoch (micros convention)") {
    val out = spark.range(1).select(dummySk.as("sk")).head.getString(0)
    assert(out == md5Hex(s"0-$EpochMicros"))
  }

  test("temporalSk hashes the timestamp as epoch micros") {
    val out = df("k INT, t TIMESTAMP", Row(Int.box(5), ts("2024-01-02 03:04:05")))
      .select(temporalSk(Seq(col("k")), col("t")).as("sk")).head.getString(0)
    val micros = ts("2024-01-02 03:04:05").getTime * 1000
    assert(out == md5Hex(s"5-$micros"))
  }

  test("hash32 equals the first 8 md5 hex chars as unsigned int") {
    val out = df("s STRING", Row("hello"))
      .select(hash32(col("s")).as("h")).head.getLong(0)
    assert(out == java.lang.Long.parseLong(md5Hex("hello").take(8), 16))
  }
}
