package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
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
/** Java-serializable Hadoop Configuration carrier: factories are
  * serialized to executors, so the driver's session conf (object-store
  * credentials, custom fs schemes) must ride along explicitly — a bare
  * `new Configuration()` on the executor would silently drop every
  * driver-side setting. Same write/readFields recipe Spark's own
  * (package-private) SerializableConfiguration uses.
  */
class SerializableHadoopConf(@transient private var conf: Configuration)
    extends Serializable {
  def value: Configuration = conf
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

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

  // the WRITE path hands the incoming frame's (value)-only schema to
  // getTable; reads always infer the full 3-column schema
  override def supportsExternalMetadata(): Boolean = true
}

object DfsTable {
  /** Data schema: the line text. Placement (`chunk_id`, `line_no`) is
    * exposed as METADATA columns — Spark's own `_metadata` idiom — so
    * writes validate against `value` alone while reads can still
    * reconstruct manifest order by selecting the metadata by name.
    */
  val Schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false)))

  private[sources] def metaCol(colName: String, dt: org.apache.spark.sql.types.DataType)
    : MetadataColumn = new MetadataColumn {
    override def name(): String = colName
    override def dataType(): org.apache.spark.sql.types.DataType = dt
    override def isNullable: Boolean = false
    override def comment(): String =
      "graft-dfs placement: manifest order = (chunk_id, line_no)"
  }

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

class DfsTable(path: String) extends Table with SupportsRead
    with SupportsWrite with SupportsMetadataColumns {
  override def name(): String = s"graft-dfs:$path"
  override def schema(): StructType = DfsTable.Schema
  override def metadataColumns(): Array[MetadataColumn] = Array(
    DfsTable.metaCol("chunk_id", IntegerType),
    DfsTable.metaCol("line_no", LongType))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
    : ScanBuilder = new DfsScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new DfsWriteBuilder(path, info.schema())
}

class DfsScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private var required: StructType = DfsTable.Schema
  private var chunkFilters: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Accept filters over the `chunk_id` placement column for CHUNK
    * PRUNING (the reference's chunk-lookup-by-manifest, expressed as
    * planning-time partition elimination). ALL filters are returned as
    * residual — Spark re-evaluates them post-scan, so pruning is purely
    * an optimization and unsupported shapes cost nothing.
    */
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    chunkFilters = filters.filter(_.references.sameElements(
      Array("chunk_id")))
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    chunkFilters
  override def build(): Scan = new DfsScan(path, required, chunkFilters)
}

class DfsScan(path: String, required: StructType,
    chunkFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends Scan with Batch with SupportsReportStatistics {
  // listed ONCE on the driver with the session's Hadoop conf
  private lazy val files = DfsTable.chunks(path,
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  /** Planning-time evaluation of a pushed chunk_id predicate against a
    * concrete chunk id — conservative: anything unrecognized keeps the
    * chunk (Spark re-applies every filter post-scan).
    */
  private def keeps(f: org.apache.spark.sql.sources.Filter, id: Int)
      : Boolean = {
    import org.apache.spark.sql.sources._
    def v(x: Any): Option[Long] = x match {
      case n: Number => Some(n.longValue)
      case _ => None
    }
    f match {
      case EqualTo("chunk_id", x) => v(x).forall(id.toLong == _)
      case GreaterThan("chunk_id", x) => v(x).forall(id.toLong > _)
      case GreaterThanOrEqual("chunk_id", x) => v(x).forall(id.toLong >= _)
      case LessThan("chunk_id", x) => v(x).forall(id.toLong < _)
      case LessThanOrEqual("chunk_id", x) => v(x).forall(id.toLong <= _)
      case In("chunk_id", xs) => xs.flatMap(v).contains(id.toLong) ||
        xs.exists(v(_).isEmpty)
      case And(l, r) => keeps(l, id) && keeps(r, id)
      case Or(l, r) => keeps(l, id) || keeps(r, id)
      case _ => true
    }
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft-dfs $path"

  private lazy val kept =
    files.filter { case (id, _, _) => chunkFilters.forall(keeps(_, id)) }

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(kept.map(_._3).sum)
    override def numRows(): util.OptionalLong = util.OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] =
    kept.map { case (id, f, _) => DfsChunk(id, f): InputPartition }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new DfsReaderFactory(required,
      new SerializableHadoopConf(org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration))
}

/** One chunk = one Spark partition (serialized to executors). */
case class DfsChunk(chunkId: Int, file: String) extends InputPartition

/** WRITE side: each Spark partition becomes one chunk, partition order
  * = manifest order (the reference's chunk-per-worker WRITE,
  * `Client/client_v1.py:96-115`). Exactly-once via the standard
  * temp-then-rename commit: tasks write to `_temp/part-<pid>-<task>`,
  * only files named in COMMITTED task messages are renamed to their
  * final `part-%05d` slot (a speculative/retried attempt's file is
  * never referenced and is swept with the temp dir), so readers see
  * each chunk exactly once. Input must carry a `value` string column
  * (other columns rejected up front, not silently dropped).
  */
class DfsWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    require(schema.fieldNames.sameElements(Array("value"))
      && schema.fields.head.dataType == StringType,
      s"graft-dfs writes a single `value` string column; got $schema")
    new Write { write =>
      override def toBatch: BatchWrite = new DfsBatchWrite(path, doTruncate)
    }
  }
}

case class DfsCommit(partitionId: Int, tempFile: String)
  extends WriterCommitMessage

class DfsBatchWrite(dir: String, truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
    : DataWriterFactory = new DfsWriterFactory(dir,
      new SerializableHadoopConf(org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf =
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (truncate && fs.exists(p)) {
      DfsTable.chunks(dir, conf).foreach { case (_, f, _) =>
        fs.delete(new Path(f), false) }
    }
    fs.mkdirs(p)
    // append lands AFTER the existing manifest (new chunks extend the
    // file, the reference's MR-output append at masterhandler.py:171)
    val base = if (truncate) 0 else DfsTable.chunks(dir, conf).size
    messages.collect { case DfsCommit(pid, temp) =>
      val dest = new Path(p, f"part-${base + pid}%05d")
      // rename reports failure via its RETURN VALUE (name collision,
      // cross-fs temp) — ignoring it would silently drop a committed
      // chunk; fail the job instead of losing data
      if (!fs.rename(new Path(temp), dest))
        throw new java.io.IOException(
          s"graft-dfs commit: rename $temp -> $dest failed")
    }
    fs.delete(new Path(p, "_temp"), true) // uncommitted attempts swept
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf =
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
    new Path(dir, "_temp").getFileSystem(conf)
      .delete(new Path(dir, "_temp"), true)
  }
}

class DfsWriterFactory(dir: String, conf: SerializableHadoopConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
    : DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val temp = new Path(dir, s"_temp/part-$partitionId-$taskId")
    private val fs = temp.getFileSystem(conf.value)
    private val out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(fs.create(temp, true),
        java.nio.charset.StandardCharsets.UTF_8))

    override def write(row: InternalRow): Unit = {
      out.write(row.getUTF8String(0).toString)
      out.write('\n')
    }

    override def commit(): WriterCommitMessage = {
      out.close()
      DfsCommit(partitionId, temp.toString)
    }

    override def abort(): Unit = {
      out.close()
      fs.delete(temp, false)
    }

    override def close(): Unit = ()
  }
}

class DfsReaderFactory(required: StructType, conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
    : PartitionReader[InternalRow] = {
    val chunk = p.asInstanceOf[DfsChunk]
    new PartitionReader[InternalRow] {
      private val path = new Path(chunk.file)
      private val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(
          path.getFileSystem(conf.value).open(path),
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
