package graft.io

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => AvroSchema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro read/write without spark-avro (not shipped in this image): the
  * classic Hadoop-input-format bridge over avro-mapred, converted to
  * DataFrame rows at the partition level (no driver involvement).
  *
  * Mirrors Pangool's Avro integration (reference: tuplemr/avro/AvroInputFormat
  * usage in core/src/main/java/com/datasalt/pangool/tuplemr/avro/), which did
  * the same tuple<->GenericRecord bridging on Hadoop.
  *
  * Supported field types: the Pangool primitive set (int, long, float,
  * double, boolean, string, bytes) — nested records were out of scope for
  * Pangool tuples too.
  */
object AvroSource {

  /** Read an Avro container file directory into a DataFrame with `schema`.
    * GenericRecords are converted to Row inside each partition — records
    * never cross a shuffle un-converted.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val fieldNames = schema.fields.map(_.name)
    val fieldTypes = schema.fields.map(_.dataType)
    val rdd = spark.sparkContext
      .newAPIHadoopFile(path, classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable])
      .mapPartitions(_.map { case (k, _) =>
        val rec = k.datum()
        Row.fromSeq(fieldNames.zip(fieldTypes).map { case (n, t) =>
          fromAvro(rec.get(n), t)
        }.toSeq)
      })
    spark.createDataFrame(rdd, schema)
  }

  /** Write a DataFrame as an Avro container file directory. */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val avroJson = toAvroSchema(schema).toString // Schema isn't serializable → ship JSON
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, toAvroSchema(schema))
    df.rdd.mapPartitions { it =>
      val avro = new AvroSchema.Parser().parse(avroJson)
      it.map { row =>
        val rec = new GenericData.Record(avro)
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, toAvro(row.get(i), f.dataType))
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  private def fromAvro(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case (x, _) => x
  }

  private def toAvro(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (x, _) => x
  }

  /** StructType → Avro record schema (nullable fields become unions). */
  def toAvroSchema(schema: StructType): AvroSchema = {
    val fields = schema.fields.foldLeft(
      SchemaBuilder.record("GraftRecord").namespace("graft").fields()) { (b, f) =>
      val base = f.dataType match {
        case IntegerType => AvroSchema.create(AvroSchema.Type.INT)
        case LongType    => AvroSchema.create(AvroSchema.Type.LONG)
        case FloatType   => AvroSchema.create(AvroSchema.Type.FLOAT)
        case DoubleType  => AvroSchema.create(AvroSchema.Type.DOUBLE)
        case BooleanType => AvroSchema.create(AvroSchema.Type.BOOLEAN)
        case StringType  => AvroSchema.create(AvroSchema.Type.STRING)
        case BinaryType  => AvroSchema.create(AvroSchema.Type.BYTES)
        case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
      }
      if (f.nullable)
        b.name(f.name)
          .`type`(AvroSchema.createUnion(List(AvroSchema.create(AvroSchema.Type.NULL), base).asJava))
          .withDefault(null)
      else b.name(f.name).`type`(base).noDefault()
    }
    fields.endRecord()
  }
}
