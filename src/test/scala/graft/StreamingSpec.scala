package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.scd.{Scd2, Scd2Config}
import graft.functions.SqlFunctions._
import graft.streaming.Streams

/** Streaming skins: file-source → windowed agg matches the batch transformer;
  * foreachBatch SCD2 sink converges to the batch-built dimension. */
class StreamingSpec extends AnyFunSuite with SparkSpecBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_stream").toString

  private def eventRows = df(
    "user_id INT, ts TIMESTAMP, event_type STRING, value DOUBLE",
    Row(Int.box(1), ts("2024-01-01 10:05:00"), "view", Double.box(1.5)),
    Row(Int.box(1), ts("2024-01-01 10:45:00"), "view", Double.box(2.0)),
    Row(Int.box(2), ts("2024-01-01 11:10:00"), "purchase", Double.box(9.9)),
    Row(Int.box(2), ts("2024-01-01 11:20:00"), "view", Double.box(0.5)))

  test("streamed windowed agg equals the batch transformer output") {
    val dir = tmp()
    eventRows.write.parquet(dir + "/in")
    val stream = Streams.readFileStream(spark, dir + "/in", eventRows.schema)
    val q = Streams.windowedAgg(stream, "ts", "event_type", "value")
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = canon(spark.table("win_agg"))
    val batch = canon(Streams.windowedAgg(eventRows, "ts", "event_type", "value"))
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streamed session_window agg equals batch; exact-gap touch merges, greater splits") {
    val dir = tmp()
    val rows = df("user_id INT, ts TIMESTAMP, event_type STRING, value DOUBLE",
      Row(Int.box(1), ts("2024-01-01 10:00:00"), "view", Double.box(1.0)),
      Row(Int.box(1), ts("2024-01-01 10:20:00"), "view", Double.box(1.0)), // 20m < gap: same
      Row(Int.box(1), ts("2024-01-01 10:50:00"), "view", Double.box(1.0)), // exactly 30m: MERGES
      Row(Int.box(1), ts("2024-01-01 11:25:00"), "view", Double.box(1.0)), // 35m > gap: new
      Row(Int.box(2), ts("2024-01-01 10:00:00"), "view", Double.box(1.0)),
      // user 2's late event drives the watermark far enough to close all
      Row(Int.box(2), ts("2024-01-01 15:00:00"), "view", Double.box(1.0)))
    rows.write.parquet(dir + "/in")
    val stream = Streams.readFileStream(spark, dir + "/in", rows.schema)
    val q = Streams.sessionAgg(stream, "ts", "user_id", gap = "30 minutes")
      .writeStream.format("memory").queryName("sess_agg")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = canon(spark.table("sess_agg"))
    val batch = canon(Streams.sessionAgg(rows, "ts", "user_id", gap = "30 minutes"))
    assert(streamed == batch && streamed.nonEmpty)
    // [start, last + gap) windows merge when they overlap OR touch: the
    // exactly-gap event extends the session; only a strictly greater gap
    // breaks — the same rule as Ops.sessionize (and q75's oracle)
    val u1 = Streams.sessionAgg(rows, "ts", "user_id", gap = "30 minutes")
      .filter(col("user_id") === 1).collect()
      .map(r => (r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3))).toSet
    assert(u1 == Set(
      ("2024-01-01 10:00:00.0", "2024-01-01 11:20:00.0", 3L),
      ("2024-01-01 11:25:00.0", "2024-01-01 11:55:00.0", 1L)), s"got $u1")
  }

  test("stream-stream interval join equals the batch join; bound excludes far pairs") {
    val dir = tmp()
    val views = df("v_user INT, v_ts TIMESTAMP, page STRING",
      Row(Int.box(1), ts("2024-01-01 10:00:00"), "home"),
      Row(Int.box(1), ts("2024-01-01 12:00:00"), "pricing"),
      Row(Int.box(2), ts("2024-01-01 10:00:00"), "home"))
    val buys = df("b_user INT, b_ts TIMESTAMP, amount DOUBLE",
      Row(Int.box(1), ts("2024-01-01 10:05:00"), Double.box(9.99)), // 5m after view: joins
      Row(Int.box(1), ts("2024-01-01 11:00:00"), Double.box(5.0)),  // 1h from both views: excluded
      Row(Int.box(2), ts("2024-01-01 09:58:00"), Double.box(1.0)))  // 2m BEFORE the view: joins
    views.write.parquet(dir + "/v")
    buys.write.parquet(dir + "/b")
    val q = Streams.intervalJoin(
        Streams.readFileStream(spark, dir + "/v", views.schema),
        Streams.readFileStream(spark, dir + "/b", buys.schema),
        "v_user", "b_user", "v_ts", "b_ts")
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = canon(spark.table("ss_join"))
    val batch = canon(Streams.intervalJoin(views, buys, "v_user", "b_user", "v_ts", "b_ts"))
    assert(streamed == batch && streamed.nonEmpty)
    val pairs = spark.table("ss_join").collect()
      .map(r => (r.getInt(0), r.getString(2), r.getDouble(5))).toSet
    assert(pairs == Set((1, "home", 9.99), (2, "home", 1.0)), s"got $pairs")
  }

  test("left-outer interval join: unconverted lefts null-pad, stream equals batch") {
    val dir = tmp()
    val views = df("v_user INT, v_ts TIMESTAMP, page STRING",
      Row(Int.box(1), ts("2024-01-01 10:00:00"), "home"),
      Row(Int.box(1), ts("2024-01-01 12:00:00"), "pricing"), // no buy within ±10m → null pad
      Row(Int.box(2), ts("2024-01-01 10:00:00"), "home"),
      // watermark pusher: far-future row on BOTH sides closes every
      // earlier join window so the outer results actually emit under
      // AvailableNow (its own row may be withheld — excluded below)
      Row(Int.box(9), ts("2024-01-02 10:00:00"), "flush"))
    val buys = df("b_user INT, b_ts TIMESTAMP, amount DOUBLE",
      Row(Int.box(1), ts("2024-01-01 10:05:00"), Double.box(9.99)),
      Row(Int.box(2), ts("2024-01-01 09:58:00"), Double.box(1.0)),
      Row(Int.box(9), ts("2024-01-02 10:00:00"), Double.box(0.0)))
    views.write.parquet(dir + "/v")
    buys.write.parquet(dir + "/b")
    val q = Streams.intervalJoin(
        Streams.readFileStream(spark, dir + "/v", views.schema),
        Streams.readFileStream(spark, dir + "/b", buys.schema),
        "v_user", "b_user", "v_ts", "b_ts", how = "left_outer")
      .writeStream.format("memory").queryName("ss_louter")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val noFlush = (d: org.apache.spark.sql.DataFrame) => d.filter(col("v_user") =!= 9)
    val streamed = canon(noFlush(spark.table("ss_louter")))
    val batch = canon(noFlush(Streams.intervalJoin(views, buys,
      "v_user", "b_user", "v_ts", "b_ts", how = "left_outer")))
    assert(streamed == batch && streamed.nonEmpty)
    val unconverted = spark.table("ss_louter")
      .filter(col("b_user").isNull).collect().map(r => (r.getInt(0), r.getString(2))).toSet
    assert(unconverted == Set((1, "pricing")), s"got $unconverted")
  }

  test("dedupStreamBounded suppresses in-window duplicates with watermark-bounded state") {
    val dir = tmp()
    val docs = df("doc_id INT, text STRING, ts TIMESTAMP",
      Row(Int.box(1), "alpha", ts("2024-01-01 10:00:00")),
      Row(Int.box(2), "alpha", ts("2024-01-01 10:05:00")), // in-window dup → suppressed
      Row(Int.box(3), "beta", ts("2024-01-01 10:06:00")),
      Row(Int.box(4), "beta", ts("2024-01-01 10:07:00"))) // in-window dup → suppressed
    docs.write.parquet(dir + "/d")
    val q = Streams.dedupStreamBounded(
        Streams.readFileStream(spark, dir + "/d", docs.schema),
        "doc_id", "text", "ts", delay = "1 hour")
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val fps = spark.table("dedup_wm").select("fp").collect().map(_.getString(0)).toSeq
    assert(fps.length == 2 && fps.distinct.length == 2, s"got $fps")
    // batch degradation: same call, same fingerprint set
    val batchFps = Streams.dedupStreamBounded(docs, "doc_id", "text", "ts")
      .select("fp").collect().map(_.getString(0)).toSeq
    assert(batchFps.sorted == fps.sorted)
  }

  test("dedupStream state survives restart under the RocksDB state store") {
    // the scale-state claim in Streams.dedupStream's scaladoc, exercised
    // for real: same first-seen-wins semantics, state off-heap in RocksDB,
    // restored across a second AvailableNow run from the checkpoint
    val dir = tmp()
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, text STRING")
      def runOnce(): Unit = {
        val q = Streams.dedupStream(
            spark.readStream.schema(schema).parquet(dir + "/in"), "doc_id", "text")
          .writeStream.format("parquet").option("path", dir + "/out")
          .option("checkpointLocation", dir + "/ckpt")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(60000): Unit
      }
      df("doc_id BIGINT, text STRING", Row(Long.box(1L), "alpha"), Row(Long.box(2L), "beta"))
        .coalesce(1).write.mode("append").parquet(dir + "/in")
      runOnce()
      // run 2: a dup of "alpha" must be suppressed by RESTORED RocksDB state
      df("doc_id BIGINT, text STRING", Row(Long.box(3L), "alpha"), Row(Long.box(4L), "gamma"))
        .coalesce(1).write.mode("append").parquet(dir + "/in")
      runOnce()
      val kept = spark.read.parquet(dir + "/out").collect().map(_.getLong(1)).toSet
      assert(kept == Set(1L, 2L, 4L), s"got $kept")
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("watermark drops late data and append mode emits only closed windows") {
    val dir = tmp()
    val schema = eventRows.schema
    // two separate AvailableNow runs over one checkpoint: the watermark is
    // restored between runs, so batch boundaries are deterministic (a single
    // run's file-batching order is not)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(dir + "/in")
      val q = Streams.windowedAgg(stream, "ts", "event_type", "value")
        .writeStream.format("parquet").option("path", dir + "/out")
        .option("checkpointLocation", dir + "/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    // run 1: window 10-11 gets one event; 12:55 drives the watermark to 11:55
    df("user_id INT, ts TIMESTAMP, event_type STRING, value DOUBLE",
      Row(Int.box(1), ts("2024-01-01 10:05:00"), "view", Double.box(1.0)),
      Row(Int.box(1), ts("2024-01-01 12:55:00"), "view", Double.box(2.0)))
      .coalesce(1).write.mode("append").parquet(dir + "/in")
    runOnce()
    // run 2: 10:30 arrives BELOW the restored watermark -> must be dropped;
    // 13:05 opens a window that never closes before the stream ends
    df("user_id INT, ts TIMESTAMP, event_type STRING, value DOUBLE",
      Row(Int.box(1), ts("2024-01-01 10:30:00"), "view", Double.box(100.0)),
      Row(Int.box(1), ts("2024-01-01 13:05:00"), "view", Double.box(3.0)))
      .coalesce(1).write.mode("append").parquet(dir + "/in")
    runOnce()
    val out = spark.read.parquet(dir + "/out")
      .select("window_start", "n_events", "sum_value").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2)))
    // only the 10:00 window ever closes (watermark 11:55 passed its end);
    // it holds ONE event — the 10:30 straggler was dropped, not merged
    assert(out.toSeq == Seq(("2024-01-01 10:00:00.0", 1L, 1.0)))
  }

  test("aggregateSink: stream rollup == batch groupBy; compaction preserves the view") {
    val dir = tmp()
    val path = dir + "/rollup"
    val aggs = Seq("sum" -> "value", "max" -> "value")
    // two files → two micro-batches under maxFilesPerTrigger=1
    eventRows.filter(col("user_id") === 1).write.parquet(dir + "/in")
    eventRows.filter(col("user_id") === 2).write.mode("append").parquet(dir + "/in")
    val stream = spark.readStream.schema(eventRows.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir + "/in")
    val q = Streams.aggregateSink(stream, path, Seq("event_type"), aggs, dir + "/ckpt").start()
    q.awaitTermination(60000)
    def view = Streams.readRollup(spark, path, Seq("event_type"), aggs)
      .select(col("event_type"), col("n_rows"),
        col("sum_value").cast("double"), col("max_value"))
    val want = canon(eventRows.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"),
        max(col("value")).as("max_value")))
    assert(canon(view) == want, "streamed rollup != batch groupBy")
    // quiesced compaction folds partials to one base row per key
    Streams.compactRollup(spark, path, Seq("event_type"), aggs)
    assert(canon(view) == want, "compaction changed the rollup view")
    val grain = spark.read.parquet(path).groupBy(col("event_type")).count()
      .collect().map(_.getLong(1)).toSet
    assert(grain == Set(1L), s"expected one base partial per key, got $grain")
  }

  test("aggregateSink replay: re-delivering a batch id with its content replaces, never adds") {
    // at-least-once simulation with controlled batch contents: land batches
    // 0 and 1, then replay batch 1 VERBATIM (what a post-crash foreachBatch
    // re-delivery does) — the (batch_id, key) upsert must replace its own
    // rows with identical values, leaving the combined view unchanged
    val path = tmp() + "/rollup"
    val aggs = Seq("sum" -> "value", "max" -> "value")
    val b0 = eventRows.filter(col("user_id") === 1)
    val b1 = eventRows.filter(col("user_id") === 2)
    Streams.mergeBatchPartials(spark, path, b0, 0L, Seq("event_type"), aggs)
    Streams.mergeBatchPartials(spark, path, b1, 1L, Seq("event_type"), aggs)
    def view = Streams.readRollup(spark, path, Seq("event_type"), aggs)
      .select(col("event_type"), col("n_rows"),
        col("sum_value").cast("double"), col("max_value"))
    val want = canon(view)
    Streams.mergeBatchPartials(spark, path, b1, 1L, Seq("event_type"), aggs)
    assert(canon(view) == want, "replayed batch double-counted")
    Streams.mergeBatchPartials(spark, path, b1, 1L, Seq("event_type"), aggs)
    assert(canon(view) == want, "second replay double-counted")
  }

  test("graftTableSink: streamed GraftTable == batch input; replays are no-ops") {
    import graft.core.GraftTable
    val dir = tmp()
    val path = dir + "/events_t"
    eventRows.filter(col("user_id") === 1).write.parquet(dir + "/in")
    eventRows.filter(col("user_id") === 2).write.mode("append").parquet(dir + "/in")
    val stream = spark.readStream.schema(eventRows.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir + "/in")
    Streams.graftTableSink(stream, path, dir + "/ckpt").start().awaitTermination(60000)
    assert(canon(GraftTable.read(spark, path)) == canon(eventRows))
    val vAfter = GraftTable.currentVersion(path).get
    // verbatim replay of an already-committed batch id: no-op, version unchanged
    val replayed = GraftTable.appendStream(
      eventRows.filter(col("user_id") === 2), path, "ckpt-" +
        java.util.UUID.nameUUIDFromBytes((dir + "/ckpt").getBytes("UTF-8")).toString.take(8),
      batchId = 1L)
    assert(replayed == -1L && GraftTable.currentVersion(path).get == vAfter)
    assert(canon(GraftTable.read(spark, path)) == canon(eventRows))
    // restart on the same checkpoint with no new input appends nothing
    val stream2 = spark.readStream.schema(eventRows.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir + "/in")
    Streams.graftTableSink(stream2, path, dir + "/ckpt").start().awaitTermination(60000)
    assert(GraftTable.currentVersion(path).get == vAfter)
    // genuinely new data (a later batch id from the restarted query) lands
    val extra = df("user_id INT, ts TIMESTAMP, event_type STRING, value DOUBLE",
      Row(Int.box(3), ts("2024-01-01 12:00:00"), "view", Double.box(7.0)))
    extra.write.mode("append").parquet(dir + "/in")
    val stream3 = spark.readStream.schema(eventRows.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir + "/in")
    Streams.graftTableSink(stream3, path, dir + "/ckpt").start().awaitTermination(60000)
    assert(GraftTable.currentVersion(path).get > vAfter)
    assert(canon(GraftTable.read(spark, path)) == canon(eventRows.unionByName(extra)))
  }

  test("foreachBatch SCD2 sink over two micro-batches converges to fromHistory") {
    val dir = tmp()
    val cfg = Scd2Config(Seq("user_id"), "ts", payload = Seq("event_type"),
      tiebreak = Seq("value"))
    val all = eventRows.withColumn("row_hash", rowHash(col("event_type")))
    // two append-only files → two micro-batches via maxFilesPerTrigger
    all.filter(col("ts") < lit("2024-01-01 11:00:00").cast("timestamp"))
      .coalesce(1).write.mode("append").parquet(dir + "/in")
    all.filter(col("ts") >= lit("2024-01-01 11:00:00").cast("timestamp"))
      .coalesce(1).write.mode("append").parquet(dir + "/in")
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir + "/in")
    val q = Streams.scd2Sink(stream, cfg, dir + "/dim", dir + "/ckpt").start()
    q.awaitTermination(60000)
    assert(canon(spark.read.parquet(dir + "/dim")) == canon(Scd2.fromHistory(all, cfg)))
  }

  test("dedupStream keeps first-seen fingerprints across restarts") {
    val dir = tmp()
    val schema = df("doc_id BIGINT, text STRING").schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(dir + "/in")
      val q = Streams.dedupStream(stream, "doc_id", "text")
        .writeStream.format("parquet").option("path", dir + "/out")
        .option("checkpointLocation", dir + "/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    df("doc_id BIGINT, text STRING",
      Row(Long.box(2L), "aaa"), Row(Long.box(1L), "aaa"), Row(Long.box(3L), "bbb"))
      .coalesce(1).write.mode("append").parquet(dir + "/in")
    runOnce()
    // restart over the same checkpoint: state must remember 'aaa'/'bbb'
    df("doc_id BIGINT, text STRING",
      Row(Long.box(4L), "aaa"), Row(Long.box(5L), "ccc"))
      .coalesce(1).write.mode("append").parquet(dir + "/in")
    runOnce()
    val out = spark.read.parquet(dir + "/out").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Map("aaa" -> 1L, "bbb" -> 3L, "ccc" -> 5L)
      .map { case (t, id) => md5Hex(t) -> id }
    assert(out == expected, s"got $out")
  }
}
