package graft.sources.paged

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 re-expression of the reference's paged ingestion
  * (base_assets.py `fetch_acled_data_paged`: offset/limit pages pulled
  * concurrently with asyncio, then concatenated).
  *
  * Spark-first shape: one `InputPartition` per page, so a cluster fetches
  * all pages in parallel with locality-free scheduling, retries are
  * per-task (Spark's own task retry = the reference's per-page retry
  * loop), and the result is a DataFrame immediately — no driver-side
  * concat. Column pruning is pushed into the reader so `select(a, b)`
  * never materializes unused fields.
  *
  * The page *fetch* itself is the sandbox stub boundary: [[PageFetcher]]
  * deterministically synthesizes the rows a page's HTTP response would
  * parse to (no network in this environment). Everything around it — the
  * provider, scan builder, pruning, partition planning, per-page readers —
  * is the real production plumbing.
  *
  * Usage: `spark.read.format("graft.sources.paged.PagedSource")
  *   .option("pages", 32).option("pageSize", 10000).option("seed", 7).load()`
  */
class PagedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PagedSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    // getTable receives the raw (case-preserving) option map; normalize
    val opts = new CaseInsensitiveStringMap(properties)
    new PagedTable(
      opts.getInt("pages", 8),
      opts.getInt("pageSize", 1000),
      opts.getLong("seed", 42L))
  }
}

object PagedSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("page", IntegerType, nullable = false)))
}

private[paged] class PagedTable(pages: Int, pageSize: Int, seed: Long)
    extends Table with SupportsRead {
  override def name(): String = s"paged($pages x $pageSize)"
  override def schema(): StructType = PagedSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(pages, pageSize, seed)
}

private[paged] class PagedScanBuilder(pages: Int, pageSize: Int, seed: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = PagedSource.schema
  private var pageFilters: Array[sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** Page pruning: filters on the `page` column skip whole input
    * partitions — i.e. whole HTTP pages are never fetched. This is the
    * incremental-load path: `.filter(col("page") >= lastCursor)` re-reads
    * only the tail pages, the way the reference's sensor cursor does.
    * Accepted filters are still re-evaluated by Spark (returned as
    * residuals) — pruning is an optimization, never a correctness bet. */
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    pageFilters = filters.filter(PagedScan.pagePredicate(_).isDefined)
    filters // all residual: Spark re-checks row-level
  }
  override def pushedFilters(): Array[sources.Filter] = pageFilters
  override def build(): Scan = new PagedScan(pages, pageSize, seed, required, pageFilters)
}

private[paged] object PagedScan {
  /** Compile a pushed filter on `page` to a per-page predicate. */
  def pagePredicate(f: sources.Filter): Option[Int => Boolean] = f match {
    case sources.EqualTo("page", v: Int)            => Some(_ == v)
    case sources.GreaterThan("page", v: Int)        => Some(_ > v)
    case sources.GreaterThanOrEqual("page", v: Int) => Some(_ >= v)
    case sources.LessThan("page", v: Int)           => Some(_ < v)
    case sources.LessThanOrEqual("page", v: Int)    => Some(_ <= v)
    case sources.In("page", vs) if vs.forall(_.isInstanceOf[Int]) =>
      Some(p => vs.contains(p))
    case _ => None
  }
}

private[paged] class PagedScan(pages: Int, pageSize: Int, seed: Long,
                               required: StructType,
                               pageFilters: Array[sources.Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val preds = pageFilters.flatMap(PagedScan.pagePredicate)
    (0 until pages)
      .filter(p => preds.forall(_(p)))
      .map(p => PagePartition(p, pageSize, seed): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(required.fieldNames)
}

private[paged] case class PagePartition(page: Int, pageSize: Int, seed: Long)
    extends InputPartition

private[paged] class PagedReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PagedReader(p, fields)
  }
}

private[paged] class PagedReader(p: PagePartition, fields: Array[String])
    extends PartitionReader[InternalRow] {
  private val rows = PageFetcher.fetch(p.page, p.pageSize, p.seed)
  private var i = -1
  override def next(): Boolean = { i += 1; i < rows.length }
  override def get(): InternalRow = {
    val r = rows(i)
    InternalRow.fromSeq(fields.toSeq.map {
      case "event_id"   => r.eventId
      case "ts"         => r.tsMicros
      case "event_type" => UTF8String.fromString(r.eventType)
      case "value"      => r.value
      case "page"       => p.page
    })
  }
  override def close(): Unit = ()
}

/** The stubbed page fetch: in production this is the HTTP GET for
  * `?offset=page*pageSize&limit=pageSize` plus response parsing; here it
  * synthesizes the same shape deterministically from (page, i, seed) so
  * reads are reproducible and testable offline. */
private[paged] object PageFetcher {
  private val types = Array("click", "view", "purchase", "signup")
  final case class Fetched(eventId: Long, tsMicros: Long, eventType: String, value: Double)
  private val baseMicros = 1704067200000000L // 2024-01-01T00:00:00Z

  def fetch(page: Int, pageSize: Int, seed: Long): Array[Fetched] =
    Array.tabulate(pageSize) { i =>
      val id = page.toLong * pageSize + i
      // LCG mix — stays far below overflow, stable across JVMs
      val h = (id * 6364136223846793005L + seed) >>> 16
      Fetched(
        eventId = id,
        tsMicros = baseMicros + id * 1000000L,
        eventType = types((h % 4).toInt),
        value = (h % 10000).toDouble / 100.0)
    }
}
