package graft.testkit

import java.nio.charset.StandardCharsets.UTF_8
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Test double registered under format name `kafka` (ServiceLoader,
  * `META-INF/services/org.apache.spark.sql.sources.DataSourceRegister`):
  * a DSv2 micro-batch source exposing the real connector's wire schema
  * (key/value binary, topic, partition, offset, timestamp, timestampType)
  * and serving exactly ONE micro-batch of fixture payloads — three valid
  * JSON ticks (one omitting `isLive`), one malformed payload, one
  * tombstone (null value). The connector jars (`spark-sql-kafka-0-10`)
  * are not vendorable in this offline build, so this is what lets the
  * [[graft.sources.TickSource.Kafka]] payload→Tick parse path actually
  * EXECUTE in `sbt test` instead of staying dead code behind a
  * resolution-failure contract test.
  *
  * Test-classpath only — production `format("kafka")` resolution is
  * unaffected (no double on the main classpath).
  */
class KafkaSourceDouble extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaSourceDouble.kafkaWireSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KafkaDoubleTable
}

object KafkaSourceDouble {
  /** The real connector's read schema (spark-sql-kafka-0-10's fixed
    * output), which [[graft.sources.TickSource.Kafka]] consumes.
    */
  val kafkaWireSchema: StructType = StructType.fromDDL(
    "key BINARY, value BINARY, topic STRING, partition INT, offset BIGINT, " +
      "timestamp TIMESTAMP, timestampType INT")

  /** One batch of (key, value-json) payloads: two fully-formed ticks, one
    * omitting isLive (must coalesce true), one malformed (must drop), one
    * tombstone null value (must drop).
    */
  val payloads: Seq[(String, String)] = Seq(
    "U1" -> """{"key":"U1","ts":"2016-01-01T00:00:05.000Z","bidPrice":1.25,"askPrice":1.26,"isLive":true}""",
    "U2" -> """{"key":"U2","ts":"2016-01-01T00:00:07.000Z","bidPrice":2.5,"askPrice":2.6,"isLive":false}""",
    "U3" -> """{"key":"U3","ts":"2016-01-01T00:01:11.000Z","bidPrice":3.75,"askPrice":3.8}""",
    "U4" -> "definitely-not-json",
    "U5" -> null)
}

private class KafkaDoubleTable extends Table with SupportsRead {
  override def name(): String = "kafka-test-double"
  override def schema(): StructType = KafkaSourceDouble.kafkaWireSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = KafkaSourceDouble.kafkaWireSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new KafkaDoubleStream
      }
    }
}

private case class KafkaDoubleOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** Offset 0 → 1 exactly once: one micro-batch carrying every fixture row. */
private class KafkaDoubleStream extends MicroBatchStream {
  override def initialOffset(): Offset = KafkaDoubleOffset(0L)
  override def latestOffset(): Offset = KafkaDoubleOffset(1L)
  override def deserializeOffset(json: String): Offset =
    KafkaDoubleOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    if (start.asInstanceOf[KafkaDoubleOffset].v >=
        end.asInstanceOf[KafkaDoubleOffset].v) Array.empty
    else Array(KafkaDoublePartition())
  override def createReaderFactory(): PartitionReaderFactory =
    new KafkaDoubleReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private case class KafkaDoublePartition() extends InputPartition

private class KafkaDoubleReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = KafkaSourceDouble.payloads.iterator.zipWithIndex
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (!it.hasNext) false
        else {
          val ((k, v), i) = it.next()
          cur = new GenericInternalRow(Array[Any](
            k.getBytes(UTF_8),
            if (v == null) null else v.getBytes(UTF_8),
            UTF8String.fromString("ticks"),
            0,
            i.toLong,
            1451606400000000L + i * 1000000L, // micros
            0))
          true
        }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
}
