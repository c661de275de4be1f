package graft.sources

import java.io.ByteArrayInputStream
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file ingestion WITHOUT the spark-avro datasource
  * (not on this classpath — only avro core ships with the Spark
  * distribution here): files arrive through the built-in `binaryFile`
  * source and decode per partition with the stock Avro
  * `DataFileStream` — the same documented `mapPartitions` exception
  * as `operators.Multimodal` (binary container decode has no
  * Expression form), with the Spark side (schema projection, typed
  * rows, distribution across files) fully declarative.
  *
  * Scope and limits, stated loudly:
  *   - one file = one decode unit (binaryFile is not splittable);
  *     parallelism comes from the NUMBER of files, which is how Avro
  *     landing zones are laid out in practice. A multi-GB single file
  *     belongs in spark-avro or a pre-split step.
  *   - supported field types: the Avro primitives (string/int/long/
  *     float/double/boolean/bytes) plus the two common logical
  *     mappings a LongType-or-TimestampType/DateType target implies
  *     (timestamp-micros, epoch-day date). Anything else fails with
  *     the field name — silent null-filling of a mis-typed column is
  *     how bad data enters a lake.
  *   - fields absent from a record read as null (schema evolution's
  *     add-column case); the TARGET schema drives projection, extra
  *     Avro fields are ignored.
  */
object AvroSource {

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(path)
      .select("path", "content").as[(String, Array[Byte])]
    val fields = schema.fields.map(f => (f.name, f.dataType)) // serializable
    val decoded = files.mapPartitions { it =>
      it.flatMap { case (file, bytes) =>
        val stream = new DataFileStream[GenericRecord](
          new ByteArrayInputStream(bytes), new GenericDatumReader[GenericRecord]())
        new Iterator[Row] {
          def hasNext: Boolean = { val h = stream.hasNext; if (!h) stream.close(); h }
          def next(): Row = {
            val rec = stream.next()
            Row.fromSeq(fields.toSeq.map { case (name, dt) =>
              convert(rec.getSchema.getField(name) match {
                case null => null
                case f => rec.get(f.pos())
              }, dt, s"$file#$name")
            })
          }
        }
      }
    }(Encoders.row(schema))
    decoded.toDF()
  }

  private def convert(v: Any, dt: DataType, where: String): Any = (v, dt) match {
    case (null, _) => null
    case (s: CharSequence, StringType) => s.toString
    case (n: java.lang.Number, IntegerType) => n.intValue()
    case (n: java.lang.Number, LongType) => n.longValue()
    case (n: java.lang.Number, FloatType) => n.floatValue()
    case (n: java.lang.Number, DoubleType) => n.doubleValue()
    case (b: java.lang.Boolean, BooleanType) => b.booleanValue()
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (b: Array[Byte], BinaryType) => b
    // avro logical types arrive as plain numbers from the generic
    // reader: micros since epoch for timestamps, days for dates
    case (n: java.lang.Number, TimestampType) =>
      // java.sql types: the external row format Encoders.row expects
      // under the default (non-java8-datetime) session config
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(n.longValue(), 1000000L),
        Math.floorMod(n.longValue(), 1000000L) * 1000L))
    case (n: java.lang.Number, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(n.longValue()))
    case (other, want) => throw new IllegalArgumentException(
      s"avro: cannot convert ${other.getClass.getSimpleName} to " +
        s"${want.simpleString} at $where")
  }
}
