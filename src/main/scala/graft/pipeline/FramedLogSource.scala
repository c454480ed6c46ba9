package graft.pipeline

import java.io.RandomAccessFile
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{BinaryType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource-v2 micro-batch source that TAILS one append-only
  * length-framed binary log — the Spark-native form of the reference's
  * connector-source protocol (SURVEY §2.4 #31,
  * core/source/connector_source/ + docs/proposals/connector-protocol-v3.md):
  * its "points of reference" are resumable positions in an external
  * at-least-once stream, realized here as FRAME-ALIGNED BYTE OFFSETS
  * checkpointed by Spark's offset log. Unlike the `binaryFile`-backed
  * [[FramedFileSource]] (whole files as the replay unit), this source
  * resumes mid-file and picks up frames appended after the query started —
  * the live-tail contract of the reference's connector sources.
  *
  * Schema: `offset BIGINT, payload BINARY` — decode stays in the DSL
  * (the [[FramedDecoder]] the TCP/file sources share). Offsets advance
  * only over COMPLETE frames; a partially-written trailing frame is left
  * for the next batch (a writer appends frame-atomically, so this is the
  * reference's EOS-pending state, not an error).
  *
  * Scale notes: one log = one reader per micro-batch (a log file is a
  * serial byte stream — the reference parallelizes by running N source
  * actors over N streams; run N instances of this source and `merge`).
  * `maxBytesPerTrigger` bounds a micro-batch. Header walking happens on
  * the driver but reads only 4-byte headers via seek, not payloads.
  */
object FramedLog {
  val ShortName = "graft-framed-log"
  val Schema: StructType = new StructType()
    .add("offset", LongType, nullable = false)
    .add("payload", BinaryType, nullable = false)

  /** Walk frame headers from `from`, returning the last complete-frame end
    * ≤ the current file length, advancing at most `maxBytes`. */
  private[pipeline] def frameAlignedEnd(path: String, from: Long, maxBytes: Long): Long = {
    val f = new RandomAccessFile(path, "r")
    try {
      val len = f.length()
      var pos = from
      var end = from
      while (pos + 4 <= len && (end - from) < maxBytes) {
        f.seek(pos)
        val payloadLen = f.readInt() // big-endian u32, the TcpSink framing
        require(payloadLen >= 0, s"negative frame length at $pos in $path")
        if (pos + 4 + payloadLen <= len) { pos += 4 + payloadLen; end = pos }
        else pos = len // partial trailing frame: wait for the writer
      }
      end
    } finally f.close()
  }
}

final class FramedLogTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = FramedLog.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new FramedLogTable(properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = false
}

final class FramedLogTable(options: Map[String, String]) extends Table with SupportsRead {
  private val path = options.getOrElse("path",
    throw new IllegalArgumentException("graft-framed-log requires a 'path' option"))
  override def name(): String = s"${FramedLog.ShortName}:$path"
  override def schema(): StructType = FramedLog.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new FramedLogScan(path,
        options.get("maxBytesPerTrigger").map(_.toLong).getOrElse(Long.MaxValue))
    }
}

final class FramedLogScan(path: String, maxBytesPerTrigger: Long) extends Scan {
  override def readSchema(): StructType = FramedLog.Schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FramedLogMicroBatchStream(path, maxBytesPerTrigger)
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val end = FramedLog.frameAlignedEnd(path, 0L, Long.MaxValue)
      Array(FramedLogPartition(path, 0L, end))
    }
    override def createReaderFactory(): PartitionReaderFactory = new FramedLogReaderFactory
  }
}

/** Offset = frame-aligned byte position (the connector protocol's
  * point-of-reference). */
final case class BytePos(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

final class FramedLogMicroBatchStream(path: String, maxBytesPerTrigger: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  @volatile private var availableNowCap: Option[Long] = None

  override def initialOffset(): Offset = BytePos(0L)
  override def deserializeOffset(json: String): Offset = BytePos(json.toLong)
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(FramedLog.frameAlignedEnd(path, 0L, Long.MaxValue))
  override def reportLatestOffset(): Offset =
    BytePos(FramedLog.frameAlignedEnd(path, 0L, Long.MaxValue))
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("latestOffset(start, limit) is used")
  override def latestOffset(start: Offset, readLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val from = start.asInstanceOf[BytePos].pos
    val end = FramedLog.frameAlignedEnd(path, from, maxBytesPerTrigger)
    BytePos(availableNowCap.fold(end)(math.min(end, _)))
  }
  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BytePos].pos
    val e = end.asInstanceOf[BytePos].pos
    if (e <= s) Array.empty else Array(FramedLogPartition(path, s, e))
  }
  override def createReaderFactory(): PartitionReaderFactory = new FramedLogReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class FramedLogPartition(path: String, start: Long, end: Long)
    extends InputPartition

final class FramedLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FramedLogPartition]
    new PartitionReader[InternalRow] {
      private val f = new RandomAccessFile(p.path, "r")
      private var pos = p.start
      private var row: InternalRow = _
      override def next(): Boolean =
        if (pos >= p.end) false
        else {
          f.seek(pos)
          val len = f.readInt()
          require(pos + 4 + len <= p.end, s"frame at $pos crosses batch end ${p.end}")
          val payload = new Array[Byte](len)
          f.readFully(payload)
          row = new GenericInternalRow(Array[Any](pos, payload))
          pos += 4 + len
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = f.close()
    }
  }
}

/** DSL SourceConfig over the v2 source: decode each frame with the same
  * [[FramedDecoder]] contract the file/TCP paths use. */
final case class FramedLogSource[T](
    path: String,
    decoder: FramedDecoder[T],
    maxBytesPerTrigger: Long = Long.MaxValue)(implicit enc: Encoder[T])
    extends SourceConfig[T] {
  def load(spark: SparkSession): Dataset[(T, Long)] = {
    val reader = spark.readStream
      .format(classOf[FramedLogTableProvider].getName)
      .option("path", path)
    val df = (if (maxBytesPerTrigger != Long.MaxValue)
      reader.option("maxBytesPerTrigger", maxBytesPerTrigger.toString) else reader).load()
    val dec = decoder
    val tupEnc = Encoders.tuple(enc, Encoders.scalaLong)
    df.select("payload").as[Array[Byte]](Encoders.BINARY)
      .map { bytes => val t = dec.decode(bytes); (t, dec.eventTimeNs(t)) }(tupEnc)
  }
}
