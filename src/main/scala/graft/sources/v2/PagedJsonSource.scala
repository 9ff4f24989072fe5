package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 reader for a *paged record service* — the scale-path
  * redesign of the reference's Dynamics 365 OData extract (SURVEY.md §7.4).
  *
  * The reference fetches the whole entity into worker memory
  * (`Template-to-MySQL/Dynamics365-to-MySQL-Method-1.py:58-73`), which
  * cannot hold at 100 TB. Here each server page (OData `$skiptoken` unit)
  * is one `InputPartition`: pages are fetched/parsed *inside executors*, in
  * parallel, never materialized on the driver.
  *
  * In this zero-egress harness the "service" is a directory of page files
  * (one JSON-lines file per page — the unwrapped OData `value` array); a
  * real deployment swaps the file read in [[PagedPartitionReader]] for an
  * HTTP GET of `nextLink` — partitioning, pushdown, and pruning are
  * identical.
  *
  * Pushdown surface (mirrors OData `$filter`/`$select`):
  * - `SupportsPushDownFilters`: =, <, <=, >, >=, IS NOT NULL on flat
  *   fields, evaluated page-side (≙ server-side `$filter`); anything else
  *   stays a Spark post-scan filter.
  * - `SupportsPushDownRequiredColumns`: ≙ `$select` projection.
  *
  * Records must be flat JSON objects of bool/number/string — exactly the
  * reference's entity shape (nested payloads: load as string and use
  * `from_json` downstream).
  */
class PagedJsonSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pages"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    if (PagedScan.isRaw(options.asScala.toMap)) return PagedScan.RawSchema
    PageFetchers.from(options) match {
      // metadata-only driver pass; data reads stay in executors
      case FilePageFetcher(path) => spark.read.json(path).schema
      case fetcher =>
        // remote service: infer from ONE sample page (no chain walk, no
        // full-entity fetch); pass an explicit schema to skip even this
        val first = fetcher.samplePage()
          .map(p => fetcher.fetch(p).toSeq).getOrElse(Seq.empty)
        spark.read.json(spark.createDataset(first)(
          org.apache.spark.sql.Encoders.STRING)).schema
    }
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedTable(schema, PageFetchers.from(properties),
      PagedScan.isRaw(properties.asScala.toMap))
}

class PagedTable(tableSchema: StructType, fetcher: PageFetcher, raw: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"graft_pages($fetcher)"
  override def schema(): StructType =
    if (raw) PagedScan.RawSchema else tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    if (raw) new RawPagedScanBuilder(fetcher)
    else new PagedScanBuilder(tableSchema, fetcher)
}

/** RAW payload mode (`option("raw", "true")`): every page line comes back
  * verbatim as one `record` string — the QUARANTINE ingest boundary. The
  * typed scan path hard-fails a malformed payload record by design (a
  * well-formed service contract); a scraped/drifting feed instead reads
  * raw and routes through [[graft.sources.JsonRecords.parseWithQuarantine]]
  * — the SAME 3-lane classifier (ok / schema_mismatch partial / malformed
  * retained) as the JSONL file boundary, one classifier for both ingest
  * paths. No pushdown in raw mode: nothing is parsed page-side, so every
  * predicate stays a Spark post-scan filter (never a trusted-pushdown
  * wrong-row hazard on unparseable records).
  */
class RawPagedScanBuilder(fetcher: PageFetcher) extends ScanBuilder {
  override def build(): Scan = RawPagedScan(fetcher)
}

case class RawPagedScan(fetcher: PageFetcher) extends Scan with Batch {
  override def readSchema(): StructType = PagedScan.RawSchema
  override def toBatch: Batch = this
  override def description(): String = s"graft-pages RAW $fetcher"
  override def planInputPartitions(): Array[InputPartition] =
    fetcher.planPages().zipWithIndex
      .map { case (f, i) => PagePartition(f, i): InputPartition }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    RawPagedReaderFactory(fetcher)
}

case class RawPagedReaderFactory(fetcher: PageFetcher) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = fetcher.fetch(partition.asInstanceOf[PagePartition].pageRef)
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) {
          current = new GenericInternalRow(Array[Any](UTF8String.fromString(it.next())))
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
}

class PagedScanBuilder(fullSchema: StructType, fetcher: PageFetcher)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  private var limit: Int = -1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition(PagedScan.isSupported)
    pushed = supported
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  // ≙ OData `$top`: each page reader stops after `limit` matching rows (a
  // correct per-partition overapproximation; Spark applies the global limit)
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def build(): Scan = PagedScan(fullSchema, required, fetcher, pushed, limit)
}

case class PagePartition(pageRef: String, pageIndex: Int) extends InputPartition

case class PagedScan(
    fullSchema: StructType,
    requiredSchema: StructType,
    fetcher: PageFetcher,
    pushed: Array[Filter],
    limit: Int = -1) extends Scan with Batch {

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this

  override def description(): String =
    s"graft-pages $fetcher ${PagedScan.toODataFilter(pushed).map(f => s"$$filter=$f").getOrElse("")}" +
      (if (limit >= 0) s" $$top=$limit" else "")

  override def planInputPartitions(): Array[InputPartition] =
    fetcher.planPages().zipWithIndex
      .map { case (f, i) => PagePartition(f, i): InputPartition }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    PagedReaderFactory(requiredSchema, fetcher, pushed, limit)
}

object PagedScan {
  /** The raw-mode wire schema: one verbatim payload line per row. */
  val RawSchema: StructType = StructType(Seq(StructField("record", StringType)))

  // getTable receives the ORIGINAL-case option map while inferSchema gets
  // the lowercased CaseInsensitiveStringMap (the PageFetchers.from gotcha)
  // — normalize keys here so the two callers can never disagree on raw
  private[v2] def isRaw(props: Map[String, String]): Boolean =
    props.collectFirst { case (k, v) if k.equalsIgnoreCase("raw") => v }
      .exists(_.equalsIgnoreCase("true"))

  /** Flat-field filters with primitive literals — the OData `$filter`
    * subset.
    */
  def isSupported(f: Filter): Boolean = f match {
    case EqualTo(_, v)            => isPrimitive(v)
    case GreaterThan(_, v)        => isPrimitive(v)
    case GreaterThanOrEqual(_, v) => isPrimitive(v)
    case LessThan(_, v)           => isPrimitive(v)
    case LessThanOrEqual(_, v)    => isPrimitive(v)
    case IsNotNull(_)             => true
    case _                        => false
  }
  private def isPrimitive(v: Any): Boolean = v match {
    case _: String | _: java.lang.Number | _: java.lang.Boolean => true
    case _ => false
  }

  /** Render pushed filters as the OData `$filter` expression the reference
    * hand-writes (`Template-to-MySQL/Dynamics365-to-MySQL-Method-2.py:68-69`).
    */
  def toODataFilter(filters: Array[Filter]): Option[String] = {
    def lit(v: Any): String = v match {
      case s: String => s"'$s'"
      case other     => String.valueOf(other)
    }
    val parts = filters.toSeq.collect {
      case EqualTo(a, v)            => s"$a eq ${lit(v)}"
      case GreaterThan(a, v)        => s"$a gt ${lit(v)}"
      case GreaterThanOrEqual(a, v) => s"$a ge ${lit(v)}"
      case LessThan(a, v)           => s"$a lt ${lit(v)}"
      case LessThanOrEqual(a, v)    => s"$a le ${lit(v)}"
      case IsNotNull(a)             => s"$a ne null"
    }
    if (parts.isEmpty) None else Some(parts.mkString(" and "))
  }
}

case class PagedReaderFactory(
    requiredSchema: StructType,
    fetcher: PageFetcher,
    pushed: Array[Filter],
    limit: Int = -1)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PagedPartitionReader(partition.asInstanceOf[PagePartition], fetcher,
      requiredSchema, pushed, limit)
}

/** Reads one page (via the [[PageFetcher]] seam — file or HTTP), applies
  * the pushed filters (≙ server-side `$filter`), projects required columns,
  * emits rows.
  */
class PagedPartitionReader(
    partition: PagePartition,
    fetcher: PageFetcher,
    requiredSchema: StructType,
    pushed: Array[Filter],
    limit: Int = -1) extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val base = fetcher.fetch(partition.pageRef)
    .map(mapper.readTree)
    .filter(node => pushed.forall(matches(node, _)))
  private val it = if (limit >= 0) base.take(limit) else base
  private var current: InternalRow = _

  private def field(node: JsonNode, name: String): Option[JsonNode] =
    Option(node.get(name)).filterNot(_.isNull)

  /** Spark TRUSTS pushed filters (it removes them post-scan), so page-side
    * evaluation must match Spark's comparison semantics EXACTLY:
    * - an integral-typed literal against an integral JSON value compares as
    *   LONG — round-1 sent everything through `asDouble()`, which collapses
    *   distinct longs above 2^53 into equality (silently wrong rows);
    * - a double/float-typed literal compares as double, because that IS how
    *   Spark reads the column (schema-driven double conversion on both
    *   sides — bit-for-bit the engine's own semantics);
    * - strings compare in UTF-8 BINARY order via [[UTF8String]] (Java's
    *   `String.compareTo` is UTF-16 code-unit order, which disagrees with
    *   Spark for supplementary characters);
    * - anything else (e.g. a fractional value in an integral column) is not
    *   comparable here → None → the row is kept only if the filter accepts
    *   elsewhere; [[matches]] treats None as non-matching, same as Spark's
    *   null-comparison semantics.
    */
  private def cmp(node: JsonNode, v: Any): Option[Int] = v match {
    // mirrors [[convert]]'s `asLong()` for integral columns, so the pushed
    // filter sees exactly the value Spark's post-scan plan would have seen
    case n @ (_: java.lang.Long | _: java.lang.Integer | _: java.lang.Short | _: java.lang.Byte)
        if node.isNumber =>
      Some(java.lang.Long.compare(node.asLong(), n.asInstanceOf[Number].longValue()))
    case n @ (_: java.lang.Double | _: java.lang.Float) if node.isNumber =>
      Some(java.lang.Double.compare(node.asDouble(), n.asInstanceOf[Number].doubleValue()))
    case s: String if node.isTextual =>
      Some(UTF8String.fromString(node.asText()).compareTo(UTF8String.fromString(s)))
    case b: java.lang.Boolean if node.isBoolean =>
      Some(java.lang.Boolean.compare(node.asBoolean(), b.booleanValue()))
    case _ => None
  }

  private def matches(node: JsonNode, f: Filter): Boolean = f match {
    case EqualTo(a, v)            => field(node, a).flatMap(cmp(_, v)).contains(0)
    case GreaterThan(a, v)        => field(node, a).flatMap(cmp(_, v)).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => field(node, a).flatMap(cmp(_, v)).exists(_ >= 0)
    case LessThan(a, v)           => field(node, a).flatMap(cmp(_, v)).exists(_ < 0)
    case LessThanOrEqual(a, v)    => field(node, a).flatMap(cmp(_, v)).exists(_ <= 0)
    case IsNotNull(a)             => field(node, a).isDefined
    case _                        => true
  }

  private def convert(node: JsonNode): InternalRow = {
    val row = new GenericInternalRow(requiredSchema.length)
    requiredSchema.fields.zipWithIndex.foreach { case (f, i) =>
      field(node, f.name) match {
        case None => row.setNullAt(i)
        case Some(v) =>
          f.dataType match {
            case LongType    => row.setLong(i, v.asLong())
            case IntegerType => row.setInt(i, v.asInt())
            case DoubleType  => row.setDouble(i, v.asDouble())
            case BooleanType => row.setBoolean(i, v.asBoolean())
            case StringType  => row.update(i, UTF8String.fromString(
              if (v.isTextual) v.asText() else v.toString))
            case _           => row.update(i, UTF8String.fromString(v.toString))
          }
      }
    }
    row
  }

  override def next(): Boolean =
    if (it.hasNext) { current = convert(it.next()); true } else false

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
