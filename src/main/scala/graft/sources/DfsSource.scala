package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-dfs`: a DataSourceV2 connector over the engine's chunk store —
  * the idiomatic Spark home for the reference DFS's READ semantics
  * (reference `Client/client_v1.py:172-175` reassembles chunks in
  * manifest order; `Master/masterhandler.py:29-31` maps a logical file to
  * its chunk list). A store directory is what [[graft.mr.MapReduce.write]]
  * produces: visible part files whose NAME order is the manifest order,
  * each holding contiguous text lines.
  *
  * Design for the cluster:
  *  - one InputPartition PER CHUNK — the reference's chunk-per-worker
  *    placement expressed as Spark's native parallelism unit;
  *  - manifest order exposed AS DATA (`chunk_id`, `line_no`), not as an
  *    implicit row order, so any downstream shuffle can reconstruct the
  *    byte order with `ORDER BY chunk_id, line_no` — implicit ordering
  *    would not survive Spark's execution model and silently breaks at
  *    scale;
  *  - column pruning pushed into the reader (a `count()` never
  *    materializes line text — `SupportsPushDownRequiredColumns`);
  *  - file-size statistics reported to the optimizer
  *    (`SupportsReportStatistics`), so AQE/broadcast planning sees the
  *    store's true size instead of defaulting to "huge".
  *
  * Registered as `spark.read.format("graft-dfs").load(dir)` via the
  * DataSourceRegister service file.
  */
class DfsDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-dfs"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DfsTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "graft-dfs requires a store directory: .load(dir)")
    new DfsTable(path)
  }
}

object DfsTable {
  val Schema: StructType = StructType(Seq(
    StructField("chunk_id", IntegerType, nullable = false),
    StructField("line_no", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** Visible files of the store dir in NAME order (= manifest order; the
    * `_`/`.`-prefixed markers the MR writer leaves are metadata, exactly
    * Spark's own hidden-file convention). Returns (chunk id, path, bytes).
    */
  def chunks(dir: String, conf: Configuration): Seq[(Int, String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && { val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".") })
      .sortBy(_.getPath.getName)
      .zipWithIndex
      .map { case (s, i) => (i, s.getPath.toString, s.getLen) }
  }
}

class DfsTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-dfs:$path"
  override def schema(): StructType = DfsTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
    : ScanBuilder = new DfsScanBuilder(path)
}

class DfsScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = DfsTable.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new DfsScan(path, required)
}

class DfsScan(path: String, required: StructType) extends Scan with Batch
    with SupportsReportStatistics {
  // listed ONCE on the driver with the session's Hadoop conf
  private lazy val files = DfsTable.chunks(path,
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft-dfs $path"

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(files.map(_._3).sum)
    override def numRows(): util.OptionalLong = util.OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] =
    files.map { case (id, f, _) => DfsChunk(id, f): InputPartition }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new DfsReaderFactory(required)
}

/** One chunk = one Spark partition (serialized to executors). */
case class DfsChunk(chunkId: Int, file: String) extends InputPartition

class DfsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
    : PartitionReader[InternalRow] = {
    val chunk = p.asInstanceOf[DfsChunk]
    new PartitionReader[InternalRow] {
      private val path = new Path(chunk.file)
      private val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(
          path.getFileSystem(new Configuration()).open(path),
          java.nio.charset.StandardCharsets.UTF_8))
      private var line: String = _
      private var lineNo = -1L
      // the projection is fixed per-scan: resolve field positions once,
      // not per row
      private val fields = required.fieldNames

      override def next(): Boolean = {
        line = reader.readLine()
        lineNo += 1
        line != null
      }

      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toSeq.map {
          case "chunk_id" => chunk.chunkId
          case "line_no" => lineNo
          case "value" => UTF8String.fromString(line)
        })

      override def close(): Unit = reader.close()
    }
  }
}
