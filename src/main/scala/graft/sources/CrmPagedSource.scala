package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Client-side sliding-window rate limiter — the CRM API discipline of
  * the reference's `utils/parallel_processor.py:19-69` (at most
  * `maxRequests` calls per `windowMs` window, callers block until a
  * slot frees). One instance per reader task: the portal's limit is
  * per-connection, matching the reference's per-worker limiter.
  * Serializable so a configured instance can ship inside a reader
  * factory. */
final class SlidingWindowLimiter(maxRequests: Int, windowMs: Long = 10000L)
    extends Serializable {
  require(maxRequests > 0, s"maxRequests must be positive, got $maxRequests")
  private val times = scala.collection.mutable.Queue.empty[Long]

  /** Blocks until a request slot is free; returns ms waited. */
  def acquire(): Long = synchronized {
    def prune(): Unit = {
      val cutoff = System.currentTimeMillis() - windowMs
      while (times.nonEmpty && times.head <= cutoff) { times.dequeue(); () }
    }
    prune()
    var waited = 0L
    if (times.size >= maxRequests) {
      val wait = times.head + windowMs - System.currentTimeMillis()
      if (wait > 0) { Thread.sleep(wait); waited = wait }
      prune()
    }
    times.enqueue(System.currentTimeMillis())
    waited
  }
}

/** `crm-paged` — a DataSource V2 connector with the reference
  * extractor's API shape (`extractors/base_extractor.py:85-199`):
  * cursor-paginated record fetches (`limit`/`after` — here one
  * InputPartition per page, so Spark parallelizes the page space the
  * way `parallel_processor` fans out cursor ranges), client-side
  * sliding-window rate limiting (one simulated API call per page), and
  * TRUE source-side pushdown — required-column pruning and supported
  * filters are applied while parsing the portal payload, before
  * anything reaches Spark, exactly what a live HubSpot search API call
  * does with `filter_groups` (`extract_with_search_filter`).
  *
  * The transport is a JSON-lines file/directory standing in for HTTPS
  * (this sandbox has no egress); every OTHER layer — TableProvider,
  * pushdown negotiation, page planning, per-page throttling, payload
  * decoding against an explicit `CrmSchema.*` schema — is the real
  * connector architecture a live transport would slot into.
  *
  * Options: `path` (file or directory of .json parts), `pageSize`
  * (records per simulated API call, default 100), `maxRequestsPer10s`
  * (0 = unthrottled, default 0).
  *
  * Usage:
  * {{{
  *   spark.read.format("crm-paged")
  *     .schema(CrmSchema.emailEvents)
  *     .option("path", rawDir + "/email_events.json")
  *     .option("pageSize", "500")
  *     .load()
  * }}}
  */
class CrmPagedSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "crm-paged"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "crm-paged requires an explicit .schema(...): the portal contract " +
        "(graft.model.CrmSchema.*) is the schema authority, exactly as in " +
        "the reference extractors")
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("crm-paged requires option 'path'"))
    val pageSize = Option(properties.get("pagesize"))
      .orElse(Option(properties.get("pageSize"))).map(_.toInt).getOrElse(100)
    val rate = Option(properties.get("maxrequestsper10s"))
      .orElse(Option(properties.get("maxRequestsPer10s"))).map(_.toInt).getOrElse(0)
    require(pageSize > 0, s"pageSize must be positive, got $pageSize")
    new CrmTable(schema, path, pageSize, rate)
  }
}

private[sources] class CrmTable(schema: StructType, path: String,
    pageSize: Int, rate: Int) extends Table with SupportsRead {
  override def name(): String = s"crm-paged($path)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CrmScanBuilder(schema, path, pageSize, rate)
}

private[sources] class CrmScanBuilder(fullSchema: StructType, path: String,
    pageSize: Int, rate: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  /** Top-level-field filters the simulated search API can evaluate on
    * the raw payload (the live twin maps these onto `filter_groups`). */
  private def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _) => fullSchema.fieldNames.contains(a)
    case IsNotNull(a) => fullSchema.fieldNames.contains(a)
    case IsNull(a) => fullSchema.fieldNames.contains(a)
    case GreaterThan(a, _) => fullSchema.fieldNames.contains(a)
    case LessThan(a, _) => fullSchema.fieldNames.contains(a)
    case StringStartsWith(a, _) => fullSchema.fieldNames.contains(a)
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(supported)
    // conservative contract (like the parquet source): Spark re-evaluates
    // everything post-scan; the push is a data-volume optimization
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new CrmScan(path, required, pushed, pageSize, rate)
}

/** One simulated API page: `file` + `start` are the cursor (the live
  * twin ships an opaque `after` token instead); a page never spans
  * part files, so a reader streams exactly one file and skips only its
  * own prefix — no cross-file re-scan. */
private[sources] case class CrmPage(pageIdx: Int, file: String, start: Long,
  len: Int) extends InputPartition

private[sources] class CrmScan(val path: String, val required: StructType,
    val pushed: Array[Filter], val pageSize: Int, val rate: Int)
    extends Scan with Batch with Serializable {
  override def readSchema(): StructType = required
  override def description(): String =
    s"CrmPagedScan path=$path pageSize=$pageSize " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"
  override def toBatch: Batch = this

  /** The one driver-side metadata call: per-part record counts (the
    * `total` field of a search response) decide the page plan. Pages
    * never span part files. */
  override def planInputPartitions(): Array[InputPartition] = {
    val counts = CrmPagedIO.partCounts(path)
    val pages = counts.flatMap { case (f, n) =>
      val nPages = ((n + pageSize - 1) / pageSize).toInt
      (0 until nPages).map { i =>
        val start = i.toLong * pageSize
        CrmPage(0, f, start, math.min(pageSize.toLong, n - start).toInt)
      }
    }.zipWithIndex.map { case (p, i) => p.copy(pageIdx = i) }
    if (pages.isEmpty) Array(CrmPage(0, counts.headOption.map(_._1)
      .getOrElse(path), 0L, 0))
    else pages.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CrmReaderFactory(path, required, pushed, rate)

  /** Incremental-extract face (the reference's ingest lookback, T6):
    * the stream offset IS the pagination cursor — the count of records
    * already extracted across the portal's append-only feed. Each
    * trigger plans pages over [start, end) only, so a restart resumes
    * from the checkpointed cursor exactly like a lookback extract
    * resumes from its `after` token. Contract: the feed is append-only
    * with monotonically-named batch files (new records never sort
    * before already-extracted ones). */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new CrmMicroBatchStream(path, required, pushed, pageSize, rate)
}

private[sources] case class CrmOffset(total: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = total.toString
}

private[sources] class CrmMicroBatchStream(path: String,
    required: StructType, pushed: Array[Filter], pageSize: Int, rate: Int)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private def feedTotal: Long = CrmPagedIO.partCounts(path).map(_._2).sum
  // Trigger.AvailableNow: the run's target is the feed size sampled
  // ONCE at start — records appended mid-run wait for the next run,
  // exactly like a lookback extract bounded by its start timestamp.
  private var availableTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(feedTotal)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    CrmOffset(availableTarget.getOrElse(feedTotal))
  override def reportLatestOffset(): Offset = CrmOffset(feedTotal)

  override def initialOffset(): Offset = CrmOffset(0L)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry point")
  override def deserializeOffset(json: String): Offset =
    CrmOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** Pages covering the global record range [start, end), never
    * spanning part files — the same page shape as the batch scan, just
    * windowed by the cursor. */
  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val lo = start.asInstanceOf[CrmOffset].total
    val hi = end.asInstanceOf[CrmOffset].total
    val pages = scala.collection.mutable.ArrayBuffer.empty[CrmPage]
    var base = 0L
    CrmPagedIO.partCounts(path).foreach { case (f, n) =>
      val from = math.max(lo, base)
      val until = math.min(hi, base + n)
      var pos = from
      while (pos < until) {
        val len = math.min(pageSize.toLong, until - pos).toInt
        pages += CrmPage(pages.size, f, pos - base, len)
        pos += len
      }
      base += n
    }
    pages.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CrmReaderFactory(path, required, pushed, rate)
}

private[sources] class CrmReaderFactory(path: String, required: StructType,
    pushed: Array[Filter], rate: Int) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new CrmPageReader(path, required, pushed, rate, p.asInstanceOf[CrmPage])
}

/** Reads ONE page (= one simulated API call): throttles, fetches the
  * page's records, evaluates the pushed filters on the raw payload and
  * decodes only the required columns. */
private[sources] class CrmPageReader(path: String, required: StructType,
    pushed: Array[Filter], rate: Int, page: CrmPage)
    extends PartitionReader[InternalRow] {
  private var it: Iterator[InternalRow] = _
  private var cur: InternalRow = _

  override def next(): Boolean = {
    if (it == null) {
      if (rate > 0) { new SlidingWindowLimiter(rate).acquire(); () }
      it = CrmPagedIO.readPage(page.file, page.start, page.len).iterator
        .map(CrmPagedIO.parse)
        .filter(n => pushed.forall(CrmPagedIO.matches(n, _)))
        .map(n => CrmPagedIO.toRow(n, required))
    }
    if (it.hasNext) { cur = it.next(); true } else false
  }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}

/** Payload IO + decoding, kept pure/static so the reader stays a thin
  * page cursor. */
private[sources] object CrmPagedIO {
  private val mapper = new ObjectMapper()

  private def partFiles(path: String): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).map(_.getPath)
        .filter(f => f.getName.endsWith(".json") || f.getName.endsWith(".txt"))
        .sortBy(_.getName).toSeq
    else Seq(p)
  }

  private def fileLines(f: Path): Iterator[String] = {
    val fs = f.getFileSystem(new org.apache.hadoop.conf.Configuration())
    scala.io.Source.fromInputStream(fs.open(f), "UTF-8").getLines()
      .filter(_.trim.nonEmpty)
  }

  /** (partFile, recordCount) pairs — the planner's one metadata pass. */
  def partCounts(path: String): Seq[(String, Long)] =
    partFiles(path).map(f => f.toString -> fileLines(f).size.toLong)

  def readPage(file: String, start: Long, len: Int): Seq[String] =
    fileLines(new Path(file)).slice(start.toInt, start.toInt + len).toSeq

  def parse(line: String): JsonNode = mapper.readTree(line)

  /** Pushed-filter evaluation on the raw payload — the simulated
    * `filter_groups`. Numeric payloads compare numerically, everything
    * else as the string the schema will read it as. */
  def matches(n: JsonNode, f: Filter): Boolean = {
    def field(a: String): Option[JsonNode] =
      Option(n.get(a)).filterNot(_.isNull)
    def cmp(a: String, v: Any): Option[Int] = field(a).map { node =>
      v match {
        case num: Number if node.isNumber =>
          java.lang.Double.compare(node.asDouble(), num.doubleValue())
        case _ => node.asText().compareTo(v.toString)
      }
    }
    f match {
      case EqualTo(a, v) => cmp(a, v).contains(0)
      case IsNotNull(a) => field(a).isDefined
      case IsNull(a) => field(a).isEmpty
      case GreaterThan(a, v) => cmp(a, v).exists(_ > 0)
      case LessThan(a, v) => cmp(a, v).exists(_ < 0)
      case StringStartsWith(a, v) =>
        field(a).exists(_.asText().startsWith(v))
      case _ => true
    }
  }

  /** Recursive JSON -> Catalyst decoding for the CRM schema surface:
    * strings (numbers arrive lenient-as-string, per the extractor
    * contract), booleans, integral/floating, structs, arrays, maps. */
  def toRow(n: JsonNode, schema: StructType): InternalRow =
    convertStruct(n, schema)

  private def convertStruct(n: JsonNode, st: StructType): GenericInternalRow =
    new GenericInternalRow(st.fields.map { f =>
      convert(if (n == null) null else n.get(f.name), f.dataType)
    }.asInstanceOf[Array[Any]])

  private def convert(n: JsonNode, dt: DataType): Any = {
    if (n == null || n.isNull) return null
    dt match {
      case StringType => UTF8String.fromString(n.asText())
      case BooleanType => n.asBoolean()
      case LongType => n.asLong()
      case IntegerType => n.asInt()
      case DoubleType => n.asDouble()
      case st: StructType => convertStruct(n, st)
      case ArrayType(et, _) =>
        new GenericArrayData(n.elements().asScala.map(convert(_, et)).toArray)
      case MapType(StringType, vt, _) =>
        val ks = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
        val vs = scala.collection.mutable.ArrayBuffer.empty[Any]
        n.fields().asScala.foreach { e =>
          ks += UTF8String.fromString(e.getKey)
          vs += convert(e.getValue, vt)
        }
        ArrayBasedMapData(ks.toArray, vs.toArray)
      case other =>
        throw new UnsupportedOperationException(
          s"crm-paged does not decode $other (CRM payloads are " +
            "string-lenient; cast downstream)")
    }
  }
}
