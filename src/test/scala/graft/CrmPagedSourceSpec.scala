package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model.CrmSchema
import graft.sources.{CrmPagedSource, SlidingWindowLimiter}

/** The `crm-paged` DataSource V2 connector: the reference extractor's
  * architecture (cursor pagination, client-side rate limiting,
  * search-API filter pushdown, explicit-schema payload decoding) with
  * a JSON-lines file transport standing in for HTTPS. */
class CrmPagedSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val rawDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-crmsrc").toString
    // one part file: the page-plan arithmetic below assumes one
    // "portal" (pages never span part files)
    CrmFixture.emailEventsRaw(spark).coalesce(1).write.mode("overwrite")
      .json(s"$dir/email_events.json")
    CrmFixture.contactsRaw(spark).coalesce(1).write.mode("overwrite")
      .json(s"$dir/contacts.json")
    dir
  }

  private def readEvents(opts: (String, String)*) = {
    val r = spark.read.format("crm-paged").schema(CrmSchema.emailEvents)
      .option("path", s"$rawDir/email_events.json")
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("row parity with the plain JSON reader, nested payloads included") {
    val viaSource = readEvents("pageSize" -> "2")
      .select("event_type", "recipient", "created", "emailCampaignId",
        "url", "location.city")
      .collect().map(_.toString).sorted.toSeq
    val viaJson = spark.read.schema(CrmSchema.emailEvents)
      .json(s"$rawDir/email_events.json")
      .select("event_type", "recipient", "created", "emailCampaignId",
        "url", "location.city")
      .collect().map(_.toString).sorted.toSeq
    assert(viaSource == viaJson && viaSource.nonEmpty)
  }

  test("envelope payloads decode: properties map + association arrays") {
    val df = spark.read.format("crm-paged").schema(CrmSchema.envelope)
      .option("path", s"$rawDir/contacts.json").load()
    val viaJson = spark.read.schema(CrmSchema.envelope)
      .json(s"$rawDir/contacts.json")
    assert(df.count() == viaJson.count() && df.count() > 0)
    val props = df.select(expr("properties['email']").as("e"))
      .collect().map(_.getString(0)).filter(_ != null).sorted.toSeq
    val propsJ = viaJson.select(expr("properties['email']").as("e"))
      .collect().map(_.getString(0)).filter(_ != null).sorted.toSeq
    assert(props == propsJ && props.nonEmpty)
  }

  test("one InputPartition per API page (cursor pagination plan)") {
    // 4 fixture events, pageSize 2 -> 2 pages; pageSize 3 -> 2 pages
    assert(readEvents("pageSize" -> "2").rdd.getNumPartitions == 2)
    assert(readEvents("pageSize" -> "3").rdd.getNumPartitions == 2)
    assert(readEvents("pageSize" -> "100").rdd.getNumPartitions == 1)
  }

  test("filters and column pruning reach the source scan") {
    val df = readEvents().filter(col("event_type") === "OPEN")
      .select("event_type", "recipient")
    val scans = df.queryExecution.executedPlan.collectLeaves().collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    val desc = scans.head.scan.description()
    assert(desc.contains("EqualTo(event_type,OPEN)"),
      s"pushed filter missing from scan: $desc")
    // IsNotNull rides along from the filter's null-intolerance
    assert(desc.contains("IsNotNull(event_type)"), desc)
    // pruning: only the required columns are decoded at the source
    assert(scans.head.scan.readSchema().fieldNames.toSet ==
      Set("event_type", "recipient"), scans.head.scan.readSchema().simpleString)
    // and the result is right (Spark re-evaluates on top, per contract):
    // both OPEN events survive, including the null-recipient one
    assert(df.collect().map(r => Option(r.getString(1))).toSet ==
      Set(Some("alice@company1.com"), None))
  }

  test("pushed filters drop rows AT the source, before Spark sees them") {
    import org.apache.spark.sql.sources.{EqualTo, Filter}
    val scan = new graft.sources.CrmPagedSource()
      .getTable(CrmSchema.emailEvents, Array.empty,
        java.util.Map.of("path", s"$rawDir/email_events.json"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of()))
    val b = scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownFilters]
    b.pushFilters(Array[Filter](EqualTo("event_type", "OPEN")))
    val batch = scan.build().toBatch
    val emitted = batch.planInputPartitions().iterator.flatMap { p =>
      val r = batch.createReaderFactory().createReader(p)
      Iterator.continually(r).takeWhile(_.next()).map(_ => 1)
    }.sum
    val total = spark.read.schema(CrmSchema.emailEvents)
      .json(s"$rawDir/email_events.json").count()
    assert(emitted == 2 && total == 4,
      s"source must emit only matching rows: emitted=$emitted total=$total")
  }

  test("sliding-window limiter blocks the call that exceeds the window") {
    val lim = new SlidingWindowLimiter(2, windowMs = 300)
    val t0 = System.currentTimeMillis()
    lim.acquire(); lim.acquire() // fill the window
    val waited = lim.acquire()   // must block until the window slides
    val elapsed = System.currentTimeMillis() - t0
    assert(waited > 0 && elapsed >= 250, s"waited=$waited elapsed=$elapsed")
    // and a throttled end-to-end read still returns every row
    assert(readEvents("pageSize" -> "2", "maxRequestsPer10s" -> "100")
      .count() == 4)
  }

  test("shared limiter throttles a multi-page read end-to-end (wall-clock lower bound)") {
    // 6 records / pageSize 2 -> 3 pages = 3 simulated API calls. At
    // 1 call per 400 ms window the SHARED limiter (one per (path, rate,
    // window) per JVM) forces calls at t=0, ~400, ~800 no matter how
    // many reader threads run concurrently — the round-10 per-reader
    // limiter had an always-empty window and never blocked.
    val dir = java.nio.file.Files.createTempDirectory("graft-crmthrottle").toString
    val lines = (1 to 6).map(i =>
      s"""{"event_type":"OPEN","recipient":"u$i@x.com","created":"1718131200000","emailCampaignId":"1"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/feed.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    def read(throttled: Boolean) = {
      val r = spark.read.format("crm-paged").schema(CrmSchema.emailEvents)
        .option("path", s"$dir/feed.json").option("pageSize", "2")
      (if (throttled)
        r.option("maxRequestsPer10s", "1").option("rateWindowMs", "400")
      else r).load()
    }
    assert(read(throttled = false).count() == 6) // warm the part index
    val t0 = System.currentTimeMillis()
    assert(read(throttled = true).count() == 6)
    val elapsed = System.currentTimeMillis() - t0
    assert(elapsed >= 700,
      s"3 pages at 1 req/400ms must take >= ~800ms, took ${elapsed}ms — " +
        "the limiter is not shared across page readers")
  }

  test("replanning an unchanged feed does zero file reads (immutable-part index cache)") {
    import graft.sources.CrmPagedIO
    val dir = java.nio.file.Files.createTempDirectory("graft-crmidx").toString
    def rec(i: Int) =
      s"""{"event_type":"OPEN","recipient":"u$i@x.com","created":"1718131200000","emailCampaignId":"1"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part-a.json"),
      (1 to 700).map(rec).mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part-b.json"),
      (701 to 900).map(rec).mkString("\n").getBytes("UTF-8"))
    val parts = CrmPagedIO.partCounts(dir).map(_._1) // builds each index once
    assert(parts.size == 2 && parts.forall(p => CrmPagedIO.buildCount(p) == 1))
    def readAll() = spark.read.format("crm-paged")
      .schema(CrmSchema.emailEvents).option("path", dir)
      .option("pageSize", "100").load()
    // two full scans = two batch plans + 9 page readers each; all of it
    // hits the (path, length, mtime) cache — zero additional builds
    assert(readAll().count() == 900)
    assert(readAll().count() == 900)
    assert(parts.forall(p => CrmPagedIO.buildCount(p) == 1),
      parts.map(p => s"$p built ${CrmPagedIO.buildCount(p)}x").mkString(", "))
    // and the seek cursors are right: page 3 of part-a starts at record
    // 300 -> seek to the sampled offset of record 256, skip 44
    val (seekByte, skip) = CrmPagedIO.pageCursor(parts.head, 300L)
    assert(skip == 300 - 256 && seekByte > 0, s"seek=$seekByte skip=$skip")
  }

  test("numeric pushed filters coerce string payloads numerically (no lexicographic drops)") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft-crmnum").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/feed.json"),
      Seq("""{"v":"100"}""", """{"v":"99"}""", """{"v":"9"}""")
        .mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("v", LongType)))
    def read() = spark.read.format("crm-paged").schema(schema)
      .option("path", s"$dir/feed.json").load()
    // "100" > 99: lexicographic compare ("100" < "99") would drop it at
    // the source, unrecoverably; numeric coercion keeps it
    assert(read().filter(col("v") > 99L).collect().map(_.getLong(0)).toSeq
      == Seq(100L))
    // "9" < 10: lexicographic ("9" > "10") would drop it too
    assert(read().filter(col("v") < 10L).collect().map(_.getLong(0)).toSeq
      == Seq(9L))
    // unparsable payload vs numeric filter: indeterminate at the source
    // -> KEPT (Spark re-evaluates post-scan; exclusion is unrecoverable)
    import org.apache.spark.sql.sources.{GreaterThan, LessThan}
    import graft.sources.CrmPagedIO
    val junk = CrmPagedIO.parse("""{"v":"abc"}""")
    assert(CrmPagedIO.matches(junk, GreaterThan("v", 99L)))
    assert(CrmPagedIO.matches(junk, LessThan("v", 99L)))
  }

  test("streaming face: the offset is the cursor - triggers extract only new records") {
    // append-only portal feed with monotonically-named batch files
    val feed = java.nio.file.Files.createTempDirectory("graft-crmfeed").toString
    val cp = s"$feed-cp"
    val out = s"$feed-out"
    def writeBatch(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$feed/$name.json"),
        lines.mkString("\n").getBytes("UTF-8"))
    def runOnce(): Unit = {
      val q = spark.readStream.format("crm-paged")
        .schema(CrmSchema.emailEvents)
        .option("path", feed).option("pageSize", "2").load()
        .select("event_type", "recipient")
        .writeStream.format("parquet").option("path", out)
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000); ()
    }
    def ev(t: String, r: String) =
      s"""{"event_type":"$t","recipient":"$r","created":"1718131200000","emailCampaignId":"1"}"""

    writeBatch("batch-000", Seq(ev("OPEN", "a@x.com"), ev("CLICK", "b@x.com"),
      ev("OPEN", "c@x.com")))
    runOnce()
    assert(spark.read.parquet(out).count() == 3)

    // next run resumes from the checkpointed cursor: ONLY the new batch
    writeBatch("batch-001", Seq(ev("SENT", "d@x.com"), ev("OPEN", "e@x.com")))
    runOnce()
    val rows = spark.read.parquet(out).select("recipient").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(rows == Seq("a@x.com", "b@x.com", "c@x.com", "d@x.com", "e@x.com"),
      s"incremental extract must not re-read extracted records: $rows")
    // an empty run extracts nothing
    runOnce()
    assert(spark.read.parquet(out).count() == 5)
  }

  test("schema is mandatory (the portal contract is the authority)") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("crm-paged")
        .option("path", s"$rawDir/email_events.json").load()
    }
    assert(e.getMessage.contains("schema"))
  }
}
