package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

class StreamsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("windowed word count over the event stream matches the batch plan") {
    val got = Streams.windowedWordCount(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = graft.sources.Tables.events(spark, sf)
      .groupBy(((col("ts").cast("long") / 3600000000000L).cast("long") * 3600000L).as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("running idf equals the batch idf") {
    val got = Streams.runningIdf(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = graft.operators.Bm25.idf(graft.sources.Tables.documents(spark, sf))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
  }

  test("seeded running counts start from the initial state (ref UnionTest pattern)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val seed = Seq(("a", 10L), ("z", 5L)).toDF("term", "n")
    val counts = Streams.runningCountsSeeded(spark, in.toDF(), seed)
    val sq = counts.writeStream.format("memory").queryName("graft_seeded_test")
      .outputMode(OutputMode.Update()).start()
    in.addData("a", "b")
    sq.processAllAvailable()
    sq.stop()
    val last = spark.table("graft_seeded_test")
      .groupBy("term").agg(max("n").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // seeded keys flush through even without new rows (z stays at 5)
    assert(last == Map("a" -> 11L, "b" -> 1L, "z" -> 5L))
  }

  test("streaming upsert sink merges each micro-batch into the parquet store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("upsink").toString + "/store"
    val in = MemoryStream[(String, Double, Long)]
    val sq = Streams.upsertSink(spark, in.toDF().toDF("term", "idf", "version"),
      store, Seq("term"), "version")
    try {
      in.addData(("w1", 1.0, 1L), ("w2", 2.0, 1L))
      sq.processAllAvailable()
      in.addData(("w2", 9.0, 2L))
      sq.processAllAvailable()
    } finally sq.stop()
    val got = spark.read.parquet(store).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("w1" -> 1.0, "w2" -> 9.0))
  }

  test("mapGroupsWithState accumulates counts across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val counts = Streams.runningCountsWithState(spark, in.toDF())
    val sq = counts.writeStream.format("memory").queryName("graft_state_test")
      .outputMode(OutputMode.Update()).start()
    in.addData("a", "b", "a")
    sq.processAllAvailable()
    in.addData("a", "c")
    sq.processAllAvailable()
    sq.stop()
    val last = spark.table("graft_state_test")
      .groupBy("term").agg(max("n").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(last == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("checkpointed streaming restarts exactly-once: stop mid-stream, resume, no dup/loss") {
    import spark.implicits._
    val base = Files.createTempDirectory("ckpt").toString
    val srcDir = s"$base/src"
    val ckpt = s"$base/checkpoint"
    val outDir = s"$base/out"
    new java.io.File(srcDir).mkdirs()
    def startQuery() = spark.readStream
      .schema("term STRING")
      .option("maxFilesPerTrigger", "1")
      .json(srcDir)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()
    // wave 1: two files, drain, then stop (simulated failure/redeploy)
    Seq("a", "b").toDF("term").coalesce(1).write.mode("append").json(srcDir)
    Seq("b", "c").toDF("term").coalesce(1).write.mode("append").json(srcDir)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    // wave 2 lands while the query is down
    Seq("d").toDF("term").coalesce(1).write.mode("append").json(srcDir)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    // the checkpoint must make the restart resume AFTER wave 1:
    // every record exactly once, including the offline arrivals
    val got = spark.read.parquet(outDir).groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 2L, "c" -> 1L, "d" -> 1L))
  }

  test("anomaly alerts: state persists across micro-batches, equals the batch window") {
    val base = Files.createTempDirectory("anomaly").toString
    val events = graft.sources.Tables.events(spark, sf)
    // two TIME-ORDERED files -> two micro-batches; the second batch's
    // alerts depend on state built in the first
    val cut = events.selectExpr("percentile(ts, 0.5D)").collect()(0).getDouble(0).toLong
    events.filter(col("ts") <= cut).coalesce(1).write.parquet(s"$base/src_a")
    // file source orders batches by modification time
    Thread.sleep(1100)
    events.filter(col("ts") > cut).coalesce(1).write.mode("append").parquet(s"$base/src_a")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src_a")
    val got = graft.streaming.Streams.anomalyAlertsFrom(spark, stream)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch oracle: the same integer condition over the full window
    val want = spark.sql(
      s"""WITH e AS (SELECT user_id, event_id, ts,
         |           CAST(floor(value * 1000000.0) AS LONG) AS v
         |           FROM parquet.`${sf + "/events.parquet"}`),
         |w AS (SELECT user_id, event_id, v,
         |        count(*) OVER win AS n, sum(v) OVER win AS s
         |      FROM e
         |      WINDOW win AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         |SELECT user_id, event_id FROM w WHERE n > 0 AND v * n > 3 * s""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("watermark evicts closed windows in append mode and drops late data") {
    // the production-mode contract behind the complete-mode drains:
    // in APPEND mode a window emits only once the watermark passes its
    // end, and an event arriving after that is DROPPED, bounding state
    // on an unbounded stream. Driven batch by batch so the watermark
    // (computed from the PREVIOUS batch's max event time) is explicit.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)] // (event-time seconds, key)
    val counts = in.toDF().toDF("secs", "k")
      .withColumn("event_time", timestamp_seconds(col("secs")))
      .withWatermark("event_time", "10 seconds")
      .groupBy(window(col("event_time"), "1 minute").as("win"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("win.start")).as("w"), col("k"), col("n"))
    val sq = counts.writeStream.format("memory").queryName("graft_wm_test")
      .outputMode(OutputMode.Append()).start()
    def emitted() = spark.table("graft_wm_test")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    try {
      // batch 1: two rows in window [0,60); watermark still at -inf
      in.addData((5L, "a"), (20L, "a")); sq.processAllAvailable()
      assert(emitted().isEmpty, "open window must not emit in append mode")
      // batch 2: event time jumps to 200 -> watermark 190 > 60 closes
      // window [0,60), which now emits its final count
      in.addData((200L, "a")); sq.processAllAvailable()
      assert(emitted() == Map((0L, "a") -> 2L))
      // batch 3: a LATE row for the closed window — dropped, no update
      // (and no duplicate emission of the closed window)
      in.addData((25L, "a")); sq.processAllAvailable()
      assert(emitted() == Map((0L, "a") -> 2L), "late data must be dropped")
    } finally sq.stop()
  }

  test("socket source through the serving skeleton (ref SocketWindowWordCount)") {
    // local TCP feeder: a known 2-line script repeated until the
    // stream side has drained enough rows — the reference's live
    // socket text feed, in-process
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val port = server.getLocalPort
    @volatile var stop = false
    val feeder = new Thread(() => {
      try {
        val sock = server.accept()
        val out = new java.io.PrintWriter(sock.getOutputStream, true)
        while (!stop && !out.checkError()) {
          out.println("alpha beta")
          out.println("alpha gamma")
          Thread.sleep(20)
        }
        sock.close()
      } catch { case _: Throwable => () }
    })
    feeder.setDaemon(true)
    feeder.start()
    try {
      val rows = Streams.socketServeSmoke(spark,
          java.net.InetAddress.getLoopbackAddress.getHostAddress, port,
          minRows = 20, timeoutSec = 120)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // tokens only from the script; every line contributes its two
      // terms, and >=20 drained lines mean >=40 term occurrences
      assert(rows.keySet.subsetOf(Set("alpha", "beta", "gamma")))
      assert(rows.contains("alpha"))
      assert(rows.values.sum >= 40L)
      // alpha appears once per line; the others split the remainder
      assert(rows("alpha") == rows.getOrElse("beta", 0L) + rows.getOrElse("gamma", 0L)
        || rows("alpha") == rows.getOrElse("beta", 0L) + rows.getOrElse("gamma", 0L) + 1)
    } finally {
      stop = true
      server.close()
    }
  }

  test("rate-source smoke: unbounded feed through the serving skeleton, full bucket domain") {
    val rows = graft.streaming.Streams.rateSmoke(spark, rowsPerSecond = 2000,
      nBuckets = 10, minRows = 200).collect()
    // exactly the bucket domain, every bucket hit, >= minRows total
    assert(rows.length == 10)
    assert(rows.map(_.getLong(0)).toSet == (0L until 10L).toSet)
    assert(rows.forall(_.getLong(1) >= 1L))
    assert(rows.map(_.getLong(1)).sum >= 200L)
  }

  test("streamed per-doc file sink converges to the batch writer's files") {
    // the ref's BMStream shape: docs arrive in micro-batches, each
    // batch writes its own {doc_id}.txt profiles — after the drain the
    // file set and bytes must equal one batch perDocFiles pass
    import spark.implicits._
    val docs = Seq((1L, "aa bb aa"), (2L, "cc cc dd"), (3L, "ee"), (4L, "ff gg"))
      .toDF("doc_id", "text")
    val src = Files.createTempDirectory("sperdoc_src").toString
    docs.repartition(4).write.mode("overwrite").parquet(src)
    val streamOut = Files.createTempDirectory("sperdoc_out").toString + "/files"
    Streams.perDocStream(spark, src, streamOut, maxFilesPerTrigger = Some(1))
    val batchOut = Files.createTempDirectory("sperdoc_batch").toString
    graft.sources.Sinks.perDocFiles(
      graft.operators.Bm25.tfProfiles(docs), batchOut, "doc_id", "profile")
    def slurp(dir: String): Map[String, String] = {
      val d = new java.io.File(dir)
      d.listFiles().filter(_.getName.endsWith(".txt"))
        .map(f => f.getName -> new String(
          Files.readAllBytes(f.toPath), "UTF-8")).toMap
    }
    val streamed = slurp(streamOut)
    assert(streamed.nonEmpty)
    assert(streamed == slurp(batchOut))
  }

  test("streaming index ingest: per-batch updates converge to the batch-built index") {
    val base = Files.createTempDirectory("idxingest").toString
    val srcDir = s"$base/src"
    val idx = s"$base/index"
    new java.io.File(srcDir).mkdirs()
    val docs = graft.sources.Tables.documents(spark, sf)
    // land the corpus as 3 separate files; one micro-batch each
    docs.filter(col("doc_id") % 3 === 0).coalesce(1).write.mode("append").parquet(srcDir)
    docs.filter(col("doc_id") % 3 === 1).coalesce(1).write.mode("append").parquet(srcDir)
    docs.filter(col("doc_id") % 3 === 2).coalesce(1).write.mode("append").parquet(srcDir)
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = graft.streaming.Streams.indexIngest(spark, stream, idx, s"$base/ckpt")
    q.processAllAvailable()
    q.stop()
    val streamed = graft.operators.Bm25Index.score(spark, idx).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val direct = graft.operators.Bm25.bm25Score(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(streamed.sameElements(direct),
      "index maintained by streaming micro-batches must equal the batch build")
  }
}
