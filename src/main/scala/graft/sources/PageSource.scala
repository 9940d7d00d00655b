package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 for the reference's paginated listing scan (reference
  * src/extract.py:119-201): one row per page `(page INT, html STRING)`,
  * one input partition per page, fixture-backed by a directory of
  * `page-N.html` files (offline environment — a live build would fetch
  * the URL from [[graft.etl.Extract.pageUrl]] inside the partition
  * reader, giving per-partition fetch parallelism with the
  * [[graft.etl.RateLimiter]] applied per task).
  *
  * Implements `SupportsPushDownLimit`: the reference's `num_pages`
  * bound (reference configs/extract.yaml:46) and early-exit semantics
  * (src/extract.py:171-173) become a LIMIT that reaches the source, so
  * `spark.read.format(...).load().limit(3)` plans exactly 3 page
  * partitions instead of scanning everything and discarding — at crawl
  * scale, the difference between 3 HTTP fetches and all of them.
  *
  * Usage: `spark.read.format("graft.sources.PageSource")
  *   .option("path", dir).load()`
  */
class PageSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PageSource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PageTable(properties.get("path"))
}

object PageSource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("html", StringType, nullable = false)))

  /** Observability hook for tests: pages planned by the last scan. */
  @volatile var lastPlannedPages: Int = -1

  private[sources] def listPages(path: String): Array[(Int, java.io.File)] = {
    val re = "page-(\\d+)\\.html".r
    val files = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
    files.flatMap { f =>
      f.getName match {
        case re(n) => Some((n.toInt, f))
        case _ => None
      }
    }.sortBy(_._1)
  }
}

class PageTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"pages($path)"
  override def schema(): StructType = PageSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PageScanBuilder(path)
}

class PageScanBuilder(path: String) extends ScanBuilder with SupportsPushDownLimit {
  private var limit: Int = Int.MaxValue
  /** Fully pushed: each page partition emits exactly one row, so
    * taking `limit` pages IS the limit — no residual needed. */
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed: Boolean = false
  override def build(): Scan = new PageScan(path, limit)
}

class PageScan(path: String, limit: Int) extends Scan with Batch {
  override def readSchema(): StructType = PageSource.SCHEMA
  override def toBatch: Batch = this
  override def description(): String = s"PageScan(path=$path, pageLimit=$limit)"
  override def planInputPartitions(): Array[InputPartition] = {
    val planned = PageSource.listPages(path).take(limit)
      .map { case (n, f) => PagePartition(n, f.getAbsolutePath): InputPartition }
    PageSource.lastPlannedPages = planned.length
    planned
  }
  override def createReaderFactory(): PartitionReaderFactory = PageReaderFactory
}

case class PagePartition(page: Int, file: String) extends InputPartition

object PageReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val pp = p.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = {
        val html = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pp.file)),
          java.nio.charset.StandardCharsets.UTF_8)
        InternalRow(pp.page, UTF8String.fromString(html))
      }
      override def close(): Unit = ()
    }
  }
}
