package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.IncrementalPipeline
import graft.transform.GraphTransform

/** Structured-Streaming face: watermarked windowed aggregation and the
  * foreachBatch incremental SCD sink (SURVEY.md §2.9 idiomatic extension). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("windowed event counts over a file-backed stream (memory sink)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    // stage a small slice of the events table as the stream source
    val batch = graft.catalog.Q.t(spark, "/root/testdata/sf0.001", "events")
      .filter(col("user_id") < 20)
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val agg = IncrementalPipeline.windowedEventCounts(stream, "1 hour", "6 hours")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_counts")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT sum(n) FROM win_counts").collect()(0).getLong(0)
    // append mode emits only watermark-closed windows; all but the last
    // window close, so nearly all events are counted
    assert(got > 0 && got <= batch.count())
  }

  test("foreachBatch SCD sink: two identical batches -> no new history") {
    val state = java.nio.file.Files.createTempDirectory("graft-scd").toString
    val src = java.nio.file.Files.createTempDirectory("graft-src").toString
    val snapshot = GraphTransform.withTemporal(
      Seq(("c1", "Alice"), ("c2", "Bob")).toDF("hubspot_id", "name"),
      lit("2024-01-01 00:00:00").cast("timestamp"))
    snapshot.write.mode("overwrite").parquet(src)

    def runOnce(cp: String): Unit = {
      val stream = spark.readStream.schema(snapshot.schema).parquet(src)
      val q = IncrementalPipeline.scdSink(stream, state, cp).start()
      q.awaitTermination(120000)
    }
    runOnce(s"$state/cp1")
    val cur1 = spark.read.parquet(s"$state/current")
    assert(cur1.count() == 2)
    runOnce(s"$state/cp2") // same snapshot again, fresh checkpoint
    val cur2 = spark.read.parquet(s"$state/current")
    assert(cur2.count() == 2)
    val histPath = new org.apache.hadoop.fs.Path(s"$state/history")
    val fs = histPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val histRows =
      if (fs.exists(histPath)) spark.read.parquet(s"$state/history").count() else 0L
    assert(histRows == 0L, "idempotent reload must not write history")
  }

  test("flatMapGroupsWithState sessionization: gaps close sessions across batches") {
    import graft.streaming.SessionEvent
    implicit val sql = spark.sqlContext
    // Spark 4 moved MemoryStream under execution.streaming.runtime
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent]
    def ev(u: Long, t: String) = SessionEvent(u, java.sql.Timestamp.valueOf(t))
    val q = IncrementalPipeline.sessionizeStream(input.toDF(), gapSeconds = 1800)
      .writeStream.outputMode("append").format("memory").queryName("sessions").start()
    // batch 1: two close events then a far one -> first session closes in-batch
    input.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:10:00"),
      ev(1, "2024-01-01 13:00:00"))
    q.processAllAvailable()
    val afterB1 = spark.table("sessions").collect()
    assert(afterB1.length == 1)
    assert(afterB1(0).getLong(afterB1(0).fieldIndex("n_events")) == 2L)
    assert(afterB1(0).getLong(afterB1(0).fieldIndex("duration_s")) == 600L)
    // batch 2: a later event closes the 13:00 singleton session
    input.addData(ev(1, "2024-01-01 16:00:00"))
    q.processAllAvailable()
    val afterB2 = spark.table("sessions").collect()
    assert(afterB2.length >= 2)
    val singleton = afterB2.find(r =>
      r.getTimestamp(r.fieldIndex("session_start")).toString.startsWith("2024-01-01 13:00")).get
    assert(singleton.getLong(singleton.fieldIndex("n_events")) == 1L)
    q.stop()
  }

  test("session_window sink: late row beyond watermark dropped, inside it merged") {
    // Round-8 verdict #6: the watermark CONTRACT, both sides. With a
    // 1-hour watermark and 30-minute gap: after the stream has seen
    // 19:00 the watermark stands at 18:00 — an event at 18:30 is late
    // but INSIDE the horizon and must merge into the open session; an
    // event at 17:00 is beyond it and must vanish without a trace.
    import graft.streaming.SessionEvent
    implicit val sql = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent]
    def ev(u: Long, t: String) = SessionEvent(u, java.sql.Timestamp.valueOf(t))
    val q = IncrementalPipeline.sessionWindowCounts(
        input.toDF(), gap = "30 minutes", watermark = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("swin").start()
    // batch 1: open user 1's session and advance the watermark to 18:00
    input.addData(ev(1, "2024-01-01 18:40:00"), ev(1, "2024-01-01 19:00:00"))
    q.processAllAvailable()
    // batch 2: one late-but-inside row (merges), one beyond-watermark row
    // (dropped by the stateful aggregation)
    input.addData(ev(1, "2024-01-01 18:30:00"), ev(1, "2024-01-01 17:00:00"))
    q.processAllAvailable()
    // batches 3-4: push the watermark past the session end so append
    // mode finalizes and emits it
    input.addData(ev(2, "2024-01-01 23:00:00"))
    q.processAllAvailable()
    input.addData(ev(2, "2024-01-01 23:10:00"))
    q.processAllAvailable()
    val u1 = spark.table("swin").collect()
      .filter(_.getLong(2) == 1L)
      .map(r => (r.getTimestamp(0).toString, r.getLong(3)))
    q.stop()
    // exactly one session: 18:30 merged in (3 events, start pulled back
    // to 18:30), 17:00 contributed nothing anywhere
    assert(u1.toSeq == Seq(("2024-01-01 18:30:00.0", 3L)),
      s"expected one merged 3-event session from 18:30, got ${u1.toSeq}")
  }

  test("stream-stream interval join: in-horizon click attributes, beyond-watermark click dropped") {
    // Both sides unbounded: a click joins the same user's open at most
    // 1 hour before it. Contract under test: (a) an in-horizon click
    // matches and emits immediately (append inner join); (b) a pair
    // outside the horizon does NOT match; (c) once both watermarks have
    // advanced past an open's matchable range, a late click for it is
    // dropped — the join state for that open is provably gone.
    import graft.streaming.SessionEvent
    implicit val sql = spark.sqlContext
    val opens = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent]
    val clicks = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent]
    def ev(u: Long, t: String) = SessionEvent(u, java.sql.Timestamp.valueOf(t))
    val q = IncrementalPipeline.attributionJoin(
        opens.toDF(), clicks.toDF(), horizon = "1 hour", watermark = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("attrib").start()
    // (a) open 10:00, click 10:20 -> one attributed pair
    opens.addData(ev(1, "2024-01-01 10:00:00"))
    clicks.addData(ev(1, "2024-01-01 10:20:00"))
    q.processAllAvailable()
    // (b) advance both watermarks far past 10:00; the 20:00/21:30 pair
    // is 90 minutes apart -> outside the horizon, no match
    opens.addData(ev(9, "2024-01-01 20:00:00"))
    clicks.addData(ev(9, "2024-01-01 21:30:00"))
    q.processAllAvailable()
    // (c) click watermark now ~20:30: a 10:25 click is late beyond the
    // horizon and its open's state was evicted -> contributes nothing
    clicks.addData(ev(1, "2024-01-01 10:25:00"))
    q.processAllAvailable()
    val rows = spark.table("attrib").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString))
    q.stop()
    assert(rows.toSeq == Seq((1L, "2024-01-01 10:00:00.0", "2024-01-01 10:20:00.0")),
      s"expected exactly the one in-horizon attribution, got ${rows.toSeq}")
  }

  test("left-outer attribution: never-clicked open emits once with null click") {
    // The funnel-loss contract: an open the watermark proves can no
    // longer match must surface as a row with a null click_ts (emitted
    // when its join state evicts), while matched pairs emit normally
    // and clicks without opens emit nothing (left side is opens).
    import graft.streaming.SessionEvent
    implicit val sql = spark.sqlContext
    val opens = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent]
    val clicks = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent]
    def ev(u: Long, t: String) = SessionEvent(u, java.sql.Timestamp.valueOf(t))
    val q = IncrementalPipeline.attributionJoin(
        opens.toDF(), clicks.toDF(), horizon = "1 hour", watermark = "1 hour",
        joinType = "left_outer")
      .writeStream.outputMode("append").format("memory").queryName("attribo").start()
    // user 3 opens and never clicks; user 9 clicks with no open
    opens.addData(ev(3, "2024-01-01 10:00:00"))
    clicks.addData(ev(9, "2024-01-01 10:05:00"))
    q.processAllAvailable()
    // matched pair far ahead advances both watermarks past user 3's range
    opens.addData(ev(8, "2024-01-01 20:00:00"))
    clicks.addData(ev(8, "2024-01-01 20:10:00"))
    q.processAllAvailable()
    // one more advance so eviction-time outer emission flushes
    opens.addData(ev(7, "2024-01-01 23:00:00"))
    clicks.addData(ev(7, "2024-01-01 23:05:00"))
    q.processAllAvailable()
    val rows = spark.table("attribo").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        Option(r.getTimestamp(2)).map(_.toString)))
      .sortBy(_._1)
    q.stop()
    val u3 = rows.filter(_._1 == 3L)
    assert(u3.toSeq == Seq((3L, "2024-01-01 10:00:00.0", None)),
      s"expected exactly one null-click row for the lost open, got ${rows.toSeq}")
    assert(rows.exists(r => r._1 == 8L && r._3.contains("2024-01-01 20:10:00.0")),
      s"matched pair missing: ${rows.toSeq}")
    assert(!rows.exists(_._1 == 9L), s"open-less click leaked: ${rows.toSeq}")
  }

  test("streaming dedup keeps one row per key within watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup").toString
    val batch = graft.catalog.Q.t(spark, "/root/testdata/sf0.001", "events")
      .filter(col("user_id") < 5)
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = IncrementalPipeline.streamingDedup(stream, "10 days")
      .writeStream.outputMode("append").format("memory").queryName("dedup_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.sql("SELECT count(*), count(DISTINCT user_id || '|' || event_type) FROM dedup_out")
      .collect()(0)
    assert(out.getLong(0) == out.getLong(1), "one row per (user, type)")
    assert(out.getLong(0) > 0)
  }

  test("streaming dedup suppresses a late duplicate arriving in a LATER micro-batch") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft-latedup").toString
    val t0 = Timestamp.valueOf("2024-01-01 12:00:00")
    def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    // batch 1: one click per user 1..3
    Seq((1L, "click", t0), (2L, "click", t0), (3L, "click", t0))
      .toDF("user_id", "event_type", "ts")
      .coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(1100) // distinct mtime -> deterministic file order
    // batch 2: user 1 DUPLICATE 5 min later (inside the 30 min
    // watermark horizon -> keyed state must still remember and drop
    // it) + a genuinely new key
    Seq((1L, "click", at(5)), (4L, "click", at(5)))
      .toDF("user_id", "event_type", "ts")
      .coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = IncrementalPipeline.streamingDedup(stream, "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("latedup_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT user_id, count(*) FROM latedup_out GROUP BY 1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L),
      s"late duplicate must be suppressed across micro-batches, got $got")
  }

  test("stream-static enrichment joins each micro-batch to the dimension") {
    val dir = java.nio.file.Files.createTempDirectory("graft-enrich").toString
    val batch = graft.catalog.Q.t(spark, "/root/testdata/sf0.001", "events")
      .filter(col("user_id") < 10)
    batch.write.mode("overwrite").parquet(dir)
    // static dim: a tier per user, deliberately missing some users so the
    // left join's null path is exercised
    val dim = spark.range(0, 5).select(col("id").as("user_id"),
      concat(lit("tier-"), col("id") % 2).as("tier"))
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = IncrementalPipeline.enrichStream(stream, dim, "user_id")
      .writeStream.outputMode("append").format("memory").queryName("enriched")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql(
      """SELECT count(*) AS n,
         sum(CASE WHEN user_id < 5 AND tier IS NULL THEN 1 ELSE 0 END) AS missing_known,
         sum(CASE WHEN user_id >= 5 AND tier IS NOT NULL THEN 1 ELSE 0 END) AS hit_unknown
         FROM enriched""").collect()(0)
    assert(got.getLong(0) == batch.count()) // left join preserves the stream
    assert(got.getLong(1) == 0L)            // every dim-covered user enriched
    assert(got.getLong(2) == 0L)            // uncovered users stay null
  }

  test("streaming near-dup dedup: signature store drops cross-batch near-dups") {
    val base = java.nio.file.Files.createTempDirectory("graft-ndd").toString
    val (src, store, out) = (s"$base/src", s"$base/store", s"$base/out")
    val textA = (0 until 120).map(i => s"alpha$i").mkString(" ")
    val textANear = ("zeta0 zeta1" +: (2 until 120).map(i => s"alpha$i")).mkString(" ")
    val textB = (0 until 120).map(i => s"beta$i").mkString(" ")
    val textC = (0 until 120).map(i => s"gamma$i").mkString(" ")
    val schema = Seq((0L, "", "")).toDF("doc_id", "source", "text").schema

    def runBatch(rows: Seq[(Long, String, String)], cp: String): Unit = {
      rows.toDF("doc_id", "source", "text").write.mode("overwrite").parquet(src)
      val q = IncrementalPipeline.nearDupDedupSink(
        spark.readStream.schema(schema).parquet(src), store, out, cp).start()
      q.awaitTermination(120000)
    }

    // batch 1: A and B, plus an in-batch near-dup of A -> two survivors
    runBatch(Seq((1L, "s", textA), (2L, "s", textANear), (3L, "s", textB)),
      s"$base/cp1")
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 3L))
    // batch 2: another near-dup of A (cross-BATCH, caught by the store)
    // and a genuinely new doc C
    runBatch(Seq((4L, "s", textANear), (5L, "s", textC)), s"$base/cp2")
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 3L, 5L))
    // the store holds exactly the survivors' signatures
    assert(spark.read.parquet(store).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 3L, 5L))
  }

  test("crash mid-batch: replay from the checkpoint converges to exactly-once " +
    "(both partial states)") {
    // Round-9 verdict #5: the sinks' writes are per-batch atomic-in-effect
    // now — each lands in the batch's own batch_key partition with dynamic
    // overwrite, and store reads exclude the batch's own partition. This
    // test kills batch 1 in BOTH partial states and proves the restart
    // replays to exactly-once: no duplicate survivors, no lost drops.
    val base = java.nio.file.Files.createTempDirectory("graft-crash").toString
    val (src, store, out, cp) = (s"$base/src", s"$base/store", s"$base/out",
      s"$base/cp")
    val textA = (0 until 120).map(i => s"alpha$i").mkString(" ")
    val textANear = ("zeta0 zeta1" +: (2 until 120).map(i => s"alpha$i")).mkString(" ")
    val textB = (0 until 120).map(i => s"beta$i").mkString(" ")
    val textC = (0 until 120).map(i => s"gamma$i").mkString(" ")
    val schema = Seq((0L, "", "")).toDF("doc_id", "source", "text").schema
    def start(fp: IncrementalPipeline.Failpoint) =
      IncrementalPipeline.nearDupDedupSink(
        spark.readStream.schema(schema).parquet(src), store, out, cp, fp).start()
    def docsIn(path: String): Seq[Long] =
      spark.read.parquet(path).select("doc_id").as[Long].collect().sorted.toSeq

    // batch 0 commits normally: survivors A (1) and B (2)
    Seq((1L, "s", textA), (2L, "s", textB))
      .toDF("doc_id", "source", "text").write.mode("append").parquet(src)
    start(IncrementalPipeline.NoFailpoint).awaitTermination(120000)
    assert(docsIn(out) == Seq(1L, 2L))

    // batch 1 arrives: a cross-batch near-dup of A (3, must drop) + new C (4)
    Seq((3L, "s", textANear), (4L, "s", textC))
      .toDF("doc_id", "source", "text").write.mode("append").parquet(src)

    // SIDE 1 — output written, store missing: kill after the out write
    val q1 = start((site, bid) =>
      if (site == "out_written" && bid == 1L)
        throw new RuntimeException("injected crash: out written, store missing"))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination(120000); ()
    }
    assert(docsIn(out) == Seq(1L, 2L, 4L), "out partition must be written")
    assert(docsIn(store) == Seq(1L, 2L), "store write must be missing")

    // SIDE 2 — store written, output missing: on the replay, let both
    // writes land, then fabricate the output's loss (delete the batch's
    // out partition — the store-first crash state) and kill again
    val q2 = start((site, bid) =>
      if (site == "store_written" && bid == 1L) {
        new java.io.File(out).listFiles()
          .filter(f => f.isDirectory && f.getName.endsWith("_000000000001"))
          .foreach { d =>
            d.listFiles().foreach(f => assert(f.delete()))
            assert(d.delete())
          }
        throw new RuntimeException("injected crash: store written, out missing")
      })
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.awaitTermination(120000); ()
    }
    assert(docsIn(store) == Seq(1L, 2L, 4L), "store partition must be written")
    assert(docsIn(out) == Seq(1L, 2L), "out partition must be missing")

    // clean restart: batch 1 replays once more and commits
    start(IncrementalPipeline.NoFailpoint).awaitTermination(120000)
    // exactly-once: no duplicate survivors (each doc id once) ...
    assert(docsIn(out) == Seq(1L, 2L, 4L),
      s"duplicate or lost survivors after recovery: ${docsIn(out)}")
    assert(docsIn(store) == Seq(1L, 2L, 4L),
      s"duplicate or lost signatures after recovery: ${docsIn(store)}")
    // ... and no lost drops: the near-dup of A stayed dropped
    assert(!docsIn(out).contains(3L))

    // and the stream keeps working after recovery: batch 2 commits
    val textD = (0 until 120).map(i => s"delta$i").mkString(" ")
    Seq((5L, "s", textD), (6L, "s", textANear))
      .toDF("doc_id", "source", "text").write.mode("append").parquet(src)
    start(IncrementalPipeline.NoFailpoint).awaitTermination(120000)
    assert(docsIn(out) == Seq(1L, 2L, 4L, 5L))
  }

  test("crash between curation sink's three writes: replay converges") {
    // The 3-write sink: kill between the hash-store and sim-store writes,
    // restart, assert every output and both stores land exactly once.
    val base = java.nio.file.Files.createTempDirectory("graft-crash3").toString
    val (src, store, out, cp) = (s"$base/src", s"$base/store", s"$base/out",
      s"$base/cp")
    val textA = (0 until 120).map(i => s"alpha$i").mkString(" ")
    val textB = (0 until 120).map(i => s"beta$i").mkString(" ")
    val schema = Seq((0L, "", "")).toDF("doc_id", "source", "text").schema
    def start(fp: IncrementalPipeline.Failpoint) =
      IncrementalPipeline.curationSink(
        spark.readStream.schema(schema).parquet(src), store, out, cp,
        failpoint = fp).start()
    def docsIn(path: String): Seq[Long] =
      spark.read.parquet(path).select("doc_id").as[Long].collect().sorted.toSeq

    Seq((1L, "s", textA)).toDF("doc_id", "source", "text")
      .write.mode("append").parquet(src)
    start(IncrementalPipeline.NoFailpoint).awaitTermination(120000)

    Seq((2L, "s", textB), (3L, "s", textA)) // 3 = cross-batch exact dup
      .toDF("doc_id", "source", "text").write.mode("append").parquet(src)
    val q = start((site, bid) =>
      if (site == "hash_store_written" && bid == 1L)
        throw new RuntimeException("injected crash after hash-store write"))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000); ()
    }
    // partial state: out + hash store written, sim store missing
    assert(docsIn(out) == Seq(1L, 2L))
    assert(spark.read.parquet(s"$store/hashes").count() == 2L)
    assert(docsIn(s"$store/simhashes") == Seq(1L))

    start(IncrementalPipeline.NoFailpoint).awaitTermination(120000)
    assert(docsIn(out) == Seq(1L, 2L), "duplicate survivors after recovery")
    assert(spark.read.parquet(s"$store/hashes").count() == 2L,
      "hash store must hold each accepted hash exactly once")
    assert(docsIn(s"$store/simhashes") == Seq(1L, 2L))
    assert(!docsIn(out).contains(3L)) // the exact dup stayed dropped
  }

  test("streaming chunk dedup: store drops cross-batch repeated chunks " +
    "and keeps novel ones") {
    val base = java.nio.file.Files.createTempDirectory("graft-ckd").toString
    val (src, store, out) = (s"$base/src", s"$base/store", s"$base/out")
    // 2 chunks of 16 tokens each per text; B repeats A's FIRST chunk
    // (boilerplate) and adds a novel second chunk
    val chunkA1 = (0 until 16).map(i => s"head$i").mkString(" ")
    val chunkA2 = (0 until 16).map(i => s"bodya$i").mkString(" ")
    val chunkB2 = (0 until 16).map(i => s"bodyb$i").mkString(" ")
    val schema = Seq((0L, "", "")).toDF("doc_id", "source", "text").schema

    def runBatch(rows: Seq[(Long, String, String)], cp: String): Unit = {
      rows.toDF("doc_id", "source", "text").write.mode("overwrite").parquet(src)
      val q = IncrementalPipeline.chunkDedupSink(
        spark.readStream.schema(schema).parquet(src), store, out, cp).start()
      q.awaitTermination(120000)
    }

    // batch 1: doc 1 = A1+A2, doc 2 repeats A1 in-batch plus its own body
    runBatch(Seq((1L, "s", s"$chunkA1 $chunkA2"),
      (2L, "s", s"$chunkA1 $chunkB2")), s"$base/cp1")
    val b1 = spark.read.parquet(out)
      .select("doc_id", "n_chunks", "n_kept", "text_kept")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(b1(1L) == ((2L, 2L, s"$chunkA1 $chunkA2"))) // first doc keeps all
    assert(b1(2L) == ((2L, 1L, chunkB2))) // in-batch keep-first drops A1
    // batch 2: doc 3 repeats the SAME boilerplate (cross-batch, via the
    // store) plus a novel chunk; doc 4 repeats doc 2's body entirely
    val chunkC2 = (0 until 16).map(i => s"bodyc$i").mkString(" ")
    runBatch(Seq((3L, "s", s"$chunkA1 $chunkC2"),
      (4L, "s", chunkB2)), s"$base/cp2")
    val b2 = spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 3L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"),
          r.getAs[String]("text_kept")))).toMap
    assert(b2(3L) == ((2L, 1L, chunkC2))) // store dropped the boilerplate
    assert(b2(4L) == ((1L, 0L, "")))      // fully-duplicate doc -> empty
    // the store holds exactly the four distinct kept chunk hashes
    assert(spark.read.parquet(store).distinct().count() == 4)
  }

  test("streaming curation sink: quality + exact + near-dup across batches") {
    val base = java.nio.file.Files.createTempDirectory("graft-cur-sink").toString
    val (src, store, out) = (s"$base/src", s"$base/store", s"$base/out")
    val textA = (0 until 120).map(i => s"alpha$i").mkString(" ")
    val textANear = ("zeta0 zeta1" +: (2 until 120).map(i => s"alpha$i")).mkString(" ")
    val textB = (0 until 120).map(i => s"beta$i").mkString(" ")
    val textC = (0 until 120).map(i => s"gamma$i").mkString(" ")
    val schema = Seq((0L, "", "")).toDF("doc_id", "source", "text").schema

    def runBatch(rows: Seq[(Long, String, String)], cp: String): Unit = {
      rows.toDF("doc_id", "source", "text").write.mode("overwrite").parquet(src)
      val q = IncrementalPipeline.curationSink(
        spark.readStream.schema(schema).parquet(src), store, out, cp).start()
      q.awaitTermination(120000)
    }

    // batch 1: quality reject (too short), exact dup of A within the
    // batch, near-dup of A within the batch -> survivors A and B
    runBatch(Seq((1L, "s", textA), (2L, "s", textA), (3L, "s", textANear),
      (4L, "s", textB), (5L, "s", "hi there")), s"$base/cp1")
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 4L))

    // batch 2: exact dup of A (cross-batch, hash store), near-dup of A
    // (cross-batch, signature store), and a genuinely new doc C
    runBatch(Seq((6L, "s", textA), (7L, "s", textANear), (8L, "s", textC)),
      s"$base/cp2")
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 4L, 8L))

    // hash store: one md5 per exact-stage acceptance. Batch 1 stored
    // h(A), h(ANear), h(B); doc 3's near-dup drop does NOT un-store its
    // hash — which is exactly what blocks doc 7 (same text as 3) at the
    // exact stage in batch 2. Batch 2 adds only h(C): 4 total.
    assert(spark.read.parquet(s"$store/hashes").count() == 4L)
    // signature store: survivors of the near-dup stage per batch
    assert(spark.read.parquet(s"$store/simhashes").select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 4L, 8L))
  }

  test("streaming curation sink decontaminates against a static eval corpus") {
    val base = java.nio.file.Files.createTempDirectory("graft-cur-decon").toString
    val (src, store, out, evalP) = (s"$base/src", s"$base/store", s"$base/out",
      s"$base/eval")
    // eval doc shares a verbatim 20-token span with doc 11 (18 shared
    // trigrams >= default 8); docs 10/12 share nothing with it
    val evalSpan = (0 until 20).map(i => s"eval$i").mkString(" ")
    Seq((100L, "eval", s"padding starts here $evalSpan and trails off"))
      .toDF("doc_id", "source", "text").write.parquet(evalP)
    val textClean = (0 until 120).map(i => s"alpha$i").mkString(" ")
    val textContaminated =
      ((0 until 100).map(i => s"beta$i") :+ evalSpan).mkString(" ")
    val textClean2 = (0 until 120).map(i => s"gamma$i").mkString(" ")
    val schema = Seq((0L, "", "")).toDF("doc_id", "source", "text").schema
    Seq((10L, "s", textClean), (11L, "s", textContaminated),
      (12L, "s", textClean2))
      .toDF("doc_id", "source", "text").write.mode("overwrite").parquet(src)
    val q = IncrementalPipeline.curationSink(
      spark.readStream.schema(schema).parquet(src), store, out, s"$base/cp",
      evalDir = Some(evalP)).start()
    q.awaitTermination(120000)
    // contaminated doc 11 is dropped from the curated output...
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(10L, 12L))
    // ...but its content hash and signature ARE recorded (it was seen;
    // an exact twin later must still be recognized as a dup)
    assert(spark.read.parquet(s"$store/hashes").count() == 3L)
    assert(spark.read.parquet(s"$store/simhashes").select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(10L, 11L, 12L))
  }

  test("drift monitor: cusum survives trigger boundaries, alarms on the sustained shift") {
    import graft.streaming.DriftCount
    implicit val sql = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DriftCount]
    // ref = 10, h = 15: three on-target days keep cusum at 0, then a
    // sustained +8/day shift crosses h = 15 on its SECOND elevated day
    // — one day's excursion (8) never alarms, the drift does. The
    // shift spans a trigger boundary, so a pass requires the cusum
    // state to survive between micro-batches.
    val q = IncrementalPipeline.driftMonitor(input.toDF(), ref = 10L, threshold = 15L)
      .writeStream.outputMode("append").format("memory").queryName("drift").start()
    input.addData(DriftCount("buy", 1, 10), DriftCount("buy", 2, 9),
      DriftCount("buy", 3, 11), DriftCount("buy", 4, 18))
    q.processAllAvailable()
    val b1 = spark.table("drift").orderBy("day").collect()
    assert(b1.map(r => (r.getLong(1), r.getLong(3), r.getBoolean(4))).toSeq ==
      Seq((1L, 0L, false), (2L, 0L, false), (3L, 1L, false), (4L, 9L, false)))
    input.addData(DriftCount("buy", 5, 18), DriftCount("buy", 6, 18),
      DriftCount("buy", 4, 99), // stale re-delivery of day 4: ignored
      DriftCount("view", 5, 30)) // independent key starts its own state
    q.processAllAvailable()
    val b2 = spark.table("drift").orderBy("event_type", "day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getBoolean(4))).toSeq
    assert(b2.contains(("buy", 5L, 17L, true)), s"day 5 must alarm: $b2")
    assert(b2.contains(("buy", 6L, 25L, true)))
    assert(b2.count(_._2 == 4L) == 1, "stale day 4 must not re-emit")
    assert(b2.contains(("view", 5L, 20L, true)))
    q.stop()
  }

  test("drift fold matches a single-pass batch replay under any batching") {
    import graft.streaming.{DriftCount, DriftOut, DriftState}
    val days = (1L to 30L).map(d =>
      DriftCount("k", d, 10L + (if (d > 20) 7L else (d % 3) - 1L)))
    def localReplay(ref: Long): Seq[(Long, Long, Boolean)] = {
      var cs = 0L
      days.map { r =>
        cs = math.max(0L, cs + (r.c - ref)); (r.day, cs, cs > 15L)
      }
    }
    // the fold's contract, emulated across arbitrary batch boundaries
    // (GroupState's impl is private — the e2e test above exercises the
    // real state plumbing; this pins the arithmetic batching-invariance)
    def drive(batches: Seq[Seq[DriftCount]]): Seq[(Long, Long, Boolean)] = {
      var cur = DriftState(Long.MinValue, 0L)
      batches.flatMap { b =>
        val out = Seq.newBuilder[(Long, Long, Boolean)]
        b.sortBy(_.day).foreach { r =>
          if (r.day > cur.lastDay) {
            val cs = math.max(0L, cur.cusum + (r.c - 10L))
            out += ((r.day, cs, cs > 15L))
            cur = DriftState(r.day, cs)
          }
        }
        out.result()
      }
    }
    val oneBatch = drive(Seq(days))
    val manyBatches = drive(days.grouped(7).toSeq)
    assert(oneBatch == localReplay(10L))
    assert(manyBatches == localReplay(10L))
  }

  test("streaming heavy hitters: the MG superset guarantee holds across triggers") {
    implicit val sql = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val k = 10
    val q = IncrementalPipeline.streamingHeavyHitterCandidates(
        input.toDF().toDF("w"), k)
      .writeStream.outputMode("update").format("memory").queryName("hh").start()
    // zipf-ish stream split across two triggers so the sketch state
    // must survive in the state store between them
    def zipf(lo: Int, hi: Int) =
      (lo to hi).flatMap(i => Seq.fill(200 / i)(s"item_$i"))
    val part1 = zipf(1, 20)
    val part2 = zipf(1, 20) ++ Seq.fill(150)("item_1") // reinforce the head
    input.addData(part1: _*)
    q.processAllAvailable()
    input.addData(part2: _*)
    q.processAllAvailable()
    q.stop()
    val all = part1 ++ part2
    val heavy = all.groupBy(identity).collect {
      case (w, xs) if xs.size.toLong * k > all.size => w
    }.toSet
    // last update-mode emission = the candidates over the whole stream
    val lastCands = spark.table("hh").collect().last
      .getSeq[String](0).toSet
    assert(heavy.nonEmpty && heavy.subsetOf(lastCands),
      s"missing ${heavy -- lastCands} from $lastCands")
    assert(lastCands.size <= k - 1)
  }

  test("windowed heavy hitters: per-window supersets, late row merges, window seals") {
    import graft.streaming.SessionEvent
    implicit val sql = spark.sqlContext
    // reuse SessionEvent's (user_id, ts) shape: user_id doubles as the
    // item id, stringified to the `w` column the sketch wants
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent]
    def ev(item: Long, t: String) = SessionEvent(item, java.sql.Timestamp.valueOf(t))
    val words = input.toDF()
      .selectExpr("CAST(user_id AS STRING) AS w", "ts")
    val q = IncrementalPipeline.windowedHeavyHitterCandidates(words, k = 5)
      .writeStream.outputMode("append").format("memory").queryName("whh").start()
    // window 10:00-11:00 — item 1 heavy, plus a late row for it later
    input.addData(
      (1 to 20).map(_ => ev(1, "2024-01-01 10:05:00")) ++
        Seq(ev(2, "2024-01-01 10:10:00"), ev(3, "2024-01-01 10:20:00")): _*)
    q.processAllAvailable()
    // a late-but-inside row merges into the open 10:00 window
    input.addData(ev(1, "2024-01-01 10:45:00"))
    q.processAllAvailable()
    assert(spark.table("whh").isEmpty, "append mode: window not sealed yet")
    // advance the watermark past 12:00 -> the 10:00 window seals
    input.addData(ev(9, "2024-01-01 13:30:00"))
    q.processAllAvailable()
    val closedW = spark.table("whh").collect()
      .map(r => r.getTimestamp(0).toString -> r.getSeq[String](1).toSet).toMap
    q.stop()
    val w10 = closedW.keys.find(_.startsWith("2024-01-01 10:00")).get
    assert(closedW(w10).contains("1"),
      s"item 1 (21 of 23 rows) must be a candidate: $closedW")
    assert(closedW(w10).size <= 4)
  }

  test("streaming isotonic: pools merge backward, state survives triggers, keys independent") {
    import graft.streaming.IsoPoint
    implicit val sql = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[IsoPoint]
    val q = IncrementalPipeline.isotonicStream(input.toDF())
      .writeStream.outputMode("append").format("memory").queryName("iso").start()
    // y = 5, 3 across ONE trigger: the violator merges, frontier 4
    input.addData(IsoPoint("a", 1, 5, 1), IsoPoint("a", 2, 3, 1))
    q.processAllAvailable()
    // y = 4 in the NEXT trigger: merges into the surviving (8,2) pool
    // -> (12,3), frontier 4 — requires the pool stack to have crossed
    // the trigger boundary in the state store
    input.addData(IsoPoint("a", 3, 4, 1))
    q.processAllAvailable()
    // y = 10 starts a NEW pool (no violation); stale pos 2 is ignored;
    // an independent key starts its own stack
    input.addData(IsoPoint("a", 4, 10, 1), IsoPoint("a", 2, 999, 1),
      IsoPoint("b", 1, 7, 1))
    q.processAllAvailable()
    val got = spark.table("iso").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    q.stop()
    assert(got == Seq(
      ("a", 1L, 5000000L, 1), ("a", 2L, 4000000L, 1), ("a", 3L, 4000000L, 1),
      ("a", 4L, 10000000L, 2), ("b", 1L, 7000000L, 1)),
      s"got $got")
  }

  test("sieve-streaming selection: one pass, bounded state, proven fraction of OPT") {
    import graft.streaming.{IncrementalPipeline => IP, SieveDoc, SieveState}
    // universe 1..90; two 35-element "big" docs arrive LAST (after many
    // overlapping 8-element ones) — a one-pass selector must keep
    // threshold guesses alive to catch them
    val small = (0 until 20).map(i =>
      SieveDoc(i + 1L, 100L + i, (1L to 8L).map(e => (e + i * 4) % 60 + 1)))
    val big = Seq(
      SieveDoc(21L, 1L, (1L to 35L)),
      SieveDoc(22L, 2L, (36L to 70L)))
    val all = small ++ big
    val k = 2
    // brute-force streaming OPT over all k-subsets
    val opt = all.combinations(k).map(_.flatMap(_.elems).distinct.size).max
    // drive the pure core in three different batchings; outputs after
    // the LAST batch must be identical (determinism under triggers)
    def drive(batches: Seq[Seq[SieveDoc]]) = {
      var st = SieveState(Long.MinValue, 0L, Nil)
      var last: Option[graft.streaming.SieveOut] = None
      batches.foreach { b =>
        val (st2, out) = IP.sieveStep(k)(st, b); st = st2
        out.foreach(o => last = Some(o))
      }
      (st, last.get)
    }
    val (st1, one) = drive(Seq(all))
    val (_, many) = drive(all.grouped(3).toSeq)
    val (_, each) = drive(all.map(Seq(_)))
    assert(one == many && many == each, s"batching must not matter: $one / $many / $each")
    // the sieve guarantee: best sieve >= (1/2 - eps) OPT with eps = 1/4
    assert(one.objective * 4 >= opt.toLong,
      s"objective ${one.objective} must be >= OPT/4 (OPT = $opt)")
    // on this fixture the guesses actually catch both big docs
    assert(one.objective >= 60, s"expected the two big docs to win: $one")
    // state bounded: every sieve holds <= k items
    assert(st1.sieves.forall(_.ids.size <= k))
    assert(st1.sieves.nonEmpty && st1.sieves.size <= 40)
    // stale seq ignored (forward-only contract)
    val (st2, _) = IP.sieveStep(k)(st1, Seq(SieveDoc(1L, 999L, (1L to 90L))))
    assert(st2.sieves == st1.sieves, "a stale seq must not mutate the sieves")
  }

  test("sieve-streaming e2e: state survives triggers, objective never regresses") {
    import graft.streaming.SieveDoc
    implicit val sql = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SieveDoc]
    val q = IncrementalPipeline.sieveSelect(input.toDF(), k = 2)
      .writeStream.outputMode("append").format("memory").queryName("sieve").start()
    input.addData(SieveDoc(1, 10, Seq(1, 2, 3)), SieveDoc(2, 11, Seq(3, 4)))
    q.processAllAvailable()
    input.addData(SieveDoc(3, 12, (10L to 40L)))
    q.processAllAvailable()
    val rows = spark.table("sieve").orderBy("seq").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    q.stop()
    assert(rows.map(_._1) == Seq(2L, 3L), s"one snapshot per batch: $rows")
    assert(rows.map(_._2) == rows.map(_._2).sorted,
      s"objective must be monotone across triggers: $rows")
    assert(rows.last._2 >= 31L, "the 31-element doc must be captured")
  }

  test("streaming isotonic frontier equals the batch minimax fit on every prefix") {
    import graft.streaming.{IncrementalPipeline => IP, IsoPoint, IsoState}
    // a deterministic wiggly series with weights > 1 and negatives
    val ys = Seq(40L, -13L, 22L, 22L, 7L, 90L, 55L, 61L, -5L, 130L, 130L, 129L)
    val ws = Seq(1L, 2L, 1L, 3L, 1L, 2L, 1L, 1L, 4L, 1L, 2L, 1L)
    val pts = ys.indices.map(i => IsoPoint("k", i + 1L, ys(i), ws(i)))
    // drive the fold exactly as the executor does (the GroupState impl
    // is private; the e2e test above exercises the real state plumbing)
    def drive(batches: Seq[Seq[IsoPoint]]): Seq[(Long, Long)] = {
      var st = IsoState(Long.MinValue, Nil)
      batches.flatMap { b =>
        val out = Seq.newBuilder[(Long, Long)]
        b.sortBy(_.pos).foreach { r =>
          var top = graft.streaming.IsoPool(r.y_e2, r.w)
          var rest = st.pools
          while (rest.nonEmpty &&
              BigInt(rest.head.sy) * top.sw >= BigInt(top.sy) * rest.head.sw) {
            top = graft.streaming.IsoPool(rest.head.sy + top.sy,
              rest.head.sw + top.sw)
            rest = rest.tail
          }
          val fit = ((BigInt(1000000) * top.sy -
            (((BigInt(1000000) * top.sy % top.sw) + top.sw) % top.sw)) /
            top.sw).toLong
          out += ((r.pos, fit))
          st = IsoState(r.pos, top :: rest)
        }
        out.result()
      }
    }
    val streamed = drive(pts.grouped(3).toSeq)
    // batching invariance: one batch == many batches
    assert(drive(Seq(pts)) == streamed)
    // frontier equality: the emitted fit at pos p equals the BATCH
    // minimax operator's fit of the prefix 1..p evaluated at p
    streamed.foreach { case (p, fitStream) =>
      val prefix = pts.filter(_.pos <= p)
        .map(x => (x.key, x.pos, x.y_e2, x.w))
        .toDF("key", "pos", "y_e2", "w")
      val fitBatch = graft.operators.Isotonic.fitE6(prefix)
        .filter(col("pos") === p).select("fit_e6").collect()(0).getLong(0)
      assert(fitBatch == fitStream,
        s"prefix $p: stream $fitStream != batch $fitBatch")
    }
  }

  test("DGIM sliding count: batching-invariant, error-bounded, state-bounded") {
    import graft.streaming.{IncrementalPipeline => IP, EhEvent, EhState}
    val W = 64L
    val k = 4
    // deterministic bursty arrivals: content-derived gaps (0-4), with a
    // 30-unit silence every 50 events — ts non-decreasing by build
    val gaps = (1 to 400).map(i =>
      ((i * 2654435761L >>> 13) % 5) + (if (i % 50 == 0) 30L else 0L))
    val events = gaps.scanLeft(0L)(_ + _).tail.zipWithIndex.map {
      case (t, i) => EhEvent("h", i + 1L, t)
    }
    def drive(batches: Seq[Seq[EhEvent]]): Seq[(Long, Long, Long, Int)] = {
      var st = EhState(Long.MinValue, Nil)
      batches.flatMap { b =>
        val (st2, out) = IP.ehStep(W, k)("h", st, b)
        st = st2
        out.map(o => (o.seq, o.ts, o.est, o.n_buckets))
      }
    }
    val one = drive(Seq(events))
    val many = drive(events.grouped(7).toSeq)
    val each = drive(events.map(Seq(_)))
    assert(one == many && many == each, "batching must not matter")
    // error bound vs the exact windowed count at every emission
    one.foreach { case (seq, t, est, _) =>
      val exact = events.count(e => e.seq <= seq && e.ts > t - W).toLong
      assert(math.abs(est - exact) * (k - 1) <= exact,
        s"seq=$seq t=$t est=$est exact=$exact: rel err must be <= 1/(k-1)")
    }
    // state bound: <= k buckets per size, O(k log W) buckets total
    val maxBuckets = one.map(_._4).max
    assert(maxBuckets <= k * (64 - java.lang.Long.numberOfLeadingZeros(W) + 2),
      s"state must stay O(k log W), saw $maxBuckets buckets")
    // stale seq ignored (forward-only contract)
    val (stF, _) = IP.ehStep(W, k)("h", EhState(Long.MinValue, Nil), events)
    val (stG, outG) = IP.ehStep(W, k)("h", stF, Seq(EhEvent("h", 5L, 3L)))
    assert(outG.isEmpty && stG == stF, "stale seq must be a no-op")
  }

  test("DGIM sliding count: end-to-end through the state store, keys independent") {
    import graft.streaming.EhEvent
    implicit val sql = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EhEvent]
    val q = IncrementalPipeline.ehSlidingCount(input.toDF(), windowW = 10L, k = 2)
      .writeStream.outputMode("append").format("memory").queryName("eh").start()
    // 4 events inside one window for key a; one for key b
    input.addData(EhEvent("a", 1, 1), EhEvent("a", 2, 2), EhEvent("b", 1, 1))
    q.processAllAvailable()
    // next trigger: two more for a (state crossed the trigger), then a
    // far-future event that expires everything before it
    input.addData(EhEvent("a", 3, 3), EhEvent("a", 4, 4))
    q.processAllAvailable()
    input.addData(EhEvent("a", 5, 100))
    q.processAllAvailable()
    val got = spark.table("eh").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    q.stop()
    // hand-replayed DGIM with k=2: event 3 overflows size 1 (three
    // singletons), so the two oldest merge into a size-2 bucket and the
    // estimate drops to total - oldest/2 = 2; event 4 -> [1,1,2], est 3;
    // the ts=100 event expires everything -> exact 1 again
    assert(got == Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 2L),
      ("a", 4L, 3L), ("a", 5L, 1L), ("b", 1L, 1L)), s"got $got")
  }

  test("exact sliding distinct: end-to-end through the state store, keys independent") {
    import graft.streaming.SdEvent
    implicit val sql = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SdEvent]
    val q = IncrementalPipeline.slidingDistinct(input.toDF(), windowW = 10L)
      .writeStream.outputMode("append").format("memory").queryName("sd").start()
    input.addData(SdEvent("a", 1, 1, 7), SdEvent("a", 2, 2, 8), SdEvent("b", 1, 1, 7))
    q.processAllAvailable()
    // state crossed the trigger: a re-arrival of 7 must not double-count,
    // and the far-future event expires everything alive before it
    input.addData(SdEvent("a", 3, 3, 7), SdEvent("a", 4, 4, 9))
    q.processAllAvailable()
    input.addData(SdEvent("a", 5, 100, 7))
    q.processAllAvailable()
    val got = spark.table("sd").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    q.stop()
    assert(got == Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 2L),
      ("a", 4L, 3L), ("a", 5L, 1L), ("b", 1L, 1L)), s"got $got")
  }

  test("exact sliding median: end-to-end through the state store, both parities") {
    import graft.streaming.SmEvent
    implicit val sql = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SmEvent]
    val q = IncrementalPipeline.slidingMedian(input.toDF(), windowW = 10L)
      .writeStream.outputMode("append").format("memory").queryName("sm").start()
    input.addData(SmEvent("a", 1, 1, 10), SmEvent("a", 2, 2, 2))
    q.processAllAvailable()
    // heaps crossed the trigger; then a far-future event expires everything
    input.addData(SmEvent("a", 3, 3, 6))
    q.processAllAvailable()
    input.addData(SmEvent("a", 4, 100, 4))
    q.processAllAvailable()
    val got = spark.table("sm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    q.stop()
    // med2: {10} -> 20; {2,10} -> 12; {2,6,10} -> 12; after expiry {4} -> 8
    assert(got == Seq(("a", 1L, 20L), ("a", 2L, 12L), ("a", 3L, 12L),
      ("a", 4L, 8L)), s"got $got")
  }

  test("exact sliding mode: end-to-end through the state store, tie-break held") {
    import graft.streaming.MoEvent
    implicit val sql = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[MoEvent]
    val q = IncrementalPipeline.slidingMode(input.toDF(), windowW = 10L)
      .writeStream.outputMode("append").format("memory").queryName("mo").start()
    input.addData(MoEvent("a", 1, 1, 9), MoEvent("a", 2, 2, 3))
    q.processAllAvailable()
    // counts crossed the trigger; 9 doubles up, then expiry leaves {5}
    input.addData(MoEvent("a", 3, 3, 9))
    q.processAllAvailable()
    input.addData(MoEvent("a", 4, 100, 5))
    q.processAllAvailable()
    val got = spark.table("mo").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    q.stop()
    // (9,1); tie {9,3} -> smallest value (3,1); (9,2); after expiry (5,1)
    assert(got == Seq(("a", 1L, 9L, 1L), ("a", 2L, 3L, 1L),
      ("a", 3L, 9L, 2L), ("a", 4L, 5L, 1L)), s"got $got")
  }

  test("KMV streaming sample: batching-invariant, equals the batch selection, bounded") {
    import graft.streaming.{IncrementalPipeline => IP, KmvEvent, KmvState}
    val k = 8
    // 200 events over 60 distinct ids, with re-deliveries mixed in
    val events = (1 to 200).map(i => KmvEvent("s", i.toLong, (i * 37 % 60) + 1L))
    def drive(batches: Seq[Seq[KmvEvent]]) = {
      var st = KmvState(Long.MinValue, Nil)
      val outs = batches.flatMap { b =>
        val (st2, out) = IP.kmvStep(k)("s", st, b); st = st2; out
      }
      (st, outs)
    }
    val (stOne, one) = drive(Seq(events))
    val (stMany, many) = drive(events.grouped(13).toSeq)
    assert(stOne == stMany, "state must not depend on batching")
    assert(one.last == many.last, "final snapshot must not depend on batching")
    // every snapshot equals the batch selection over its prefix
    many.foreach { snap =>
      val ids = events.filter(_.seq <= snap.seq).map(_.id).distinct
      val want = ids.map(id => (IP.kmvHash48(id), id)).sorted.take(k)
      assert(snap.n_sample == want.size && snap.fingerprint == want.map(_._1).sum,
        s"prefix ${snap.seq}: stream snapshot must equal the batch k-min selection")
      assert(snap.kth_hash == (if (want.size < k) -1L else want.map(_._1).max))
    }
    // bounded state; stale re-delivery is a no-op
    assert(stOne.sample.size <= k)
    val (stAgain, outAgain) = IP.kmvStep(k)("s", stOne, Seq(KmvEvent("s", 3L, 999L)))
    assert(outAgain.isEmpty && stAgain == stOne)
  }

  test("KMV streaming sample: end-to-end, sample identical under reordered triggers") {
    import graft.streaming.KmvEvent
    implicit val sql = spark.sqlContext
    def run(name: String, batches: Seq[Seq[KmvEvent]]): (Int, Long, Long) = {
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[KmvEvent]
      val q = IncrementalPipeline.kmvSample(input.toDF(), k = 4)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val last = spark.table(name).collect()
        .map(r => (r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
        .maxBy(_._1)
      q.stop()
      (last._2, last._3, last._4)
    }
    val evs = (1 to 30).map(i => KmvEvent("k", i.toLong, i * 7L % 19 + 1))
    val a = run("kmv_a", Seq(evs))
    val b = run("kmv_b", evs.grouped(7).toSeq)
    assert(a == b, s"trigger shape must not move the sample: $a vs $b")
  }

  test("GK quantiles: rank error bounded, batching-invariant, state sublinear") {
    import graft.streaming.{IncrementalPipeline => IP, GkEvent, GkState}
    val eps = 0.05
    // deterministic scrambled values: heavy-tailed-ish, with duplicates
    val events = (1 to 2000).map { i =>
      val h = (i * 2654435761L) & 0x7fffffffL
      GkEvent("q", i.toLong, (h % 997) * (h % 7 + 1))
    }
    def drive(batches: Seq[Seq[GkEvent]]) = {
      var st = GkState(Long.MinValue, 0L, Nil)
      val outs = batches.flatMap { b =>
        val (st2, out) = IP.gkStep(eps)("q", st, b); st = st2; out
      }
      (st, outs)
    }
    val (stOne, _) = drive(Seq(events))
    val (stMany, many) = drive(events.grouped(17).toSeq)
    assert(stOne == stMany, "summary must be a pure function of the prefix")
    // rank-error audit at every snapshot: the estimate's true rank band
    // must come within eps*n of the target rank
    many.foreach { snap =>
      val prefix = events.filter(_.seq <= snap.seq).map(_.v)
      val n = prefix.size
      val e = math.floor(eps * n).toLong
      for ((phi, est) <- Seq((0.5, snap.p50), (0.9, snap.p90))) {
        val target = math.max(1L, math.ceil(phi * n).toLong)
        val lo = prefix.count(_ < est) + 1L
        val hi = prefix.count(_ <= est).toLong
        assert(lo <= target + e && hi >= target - e,
          s"n=$n phi=$phi est=$est rank band [$lo,$hi] target $target +- $e")
      }
    }
    // state bound: O((1/eps) log(eps n)) << n
    assert(stOne.summary.length < 200,
      s"2000 values must compress far below n, got ${stOne.summary.length} tuples")
    // stale no-op
    val (stAgain, outAgain) = IP.gkStep(eps)("q", stOne, Seq(GkEvent("q", 5L, 1L)))
    assert(outAgain.isEmpty && stAgain == stOne)
  }

  test("GK quantiles: end-to-end through the state store") {
    import graft.streaming.GkEvent
    implicit val sql = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[GkEvent]
    val q = IncrementalPipeline.gkQuantile(input.toDF(), eps = 0.1)
      .writeStream.outputMode("append").format("memory").queryName("gk").start()
    input.addData((1 to 50).map(i => GkEvent("a", i.toLong, i.toLong)): _*)
    q.processAllAvailable()
    input.addData((51 to 100).map(i => GkEvent("a", i.toLong, i.toLong)): _*)
    q.processAllAvailable()
    val last = spark.table("gk").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
      .maxBy(_._1)
    q.stop()
    // uniform 1..100: p50 within 10 ranks of 50, p90 within 10 of 90
    assert(last._2 == 100L)
    assert(math.abs(last._3 - 50L) <= 10 && math.abs(last._4 - 90L) <= 10,
      s"got $last")
  }
}
