package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink over the Hadoop `avro-mapred` input/
  * output formats.
  *
  * This Spark distribution ships avro-core + avro-mapred but NOT the
  * `spark-avro` connector module, so `spark.read.format("avro")` is
  * unavailable; the classic public fallback is
  * `newAPIHadoopFile[AvroKeyInputFormat]` / `saveAsNewAPIHadoopFile
  * [AvroKeyOutputFormat]` with the record schema carried in the job conf.
  * The RDD hop is confined to (de)serialization at the file boundary —
  * everything downstream is an ordinary DataFrame, and the conversion is
  * per-partition with no shuffle on the Avro objects (GenericRecord is
  * not serializable; rows are materialized before anything could move).
  *
  * Scale shape: splittable container files (sync markers), one task per
  * split, schema resolved once per task — the standard 100 TB ingest path
  * for Kafka-adjacent Avro drops.
  */
object Avro {

  /** Avro record schema mirroring a (flat, primitively-typed) StructType.
    * Nullable fields map to `union {null, T}` with null first, the Avro
    * convention for optional fields.
    */
  def avroSchemaFor(st: StructType, name: String): Schema = {
    def prim(dt: DataType): Schema = dt match {
      case LongType    => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case other => throw new IllegalArgumentException(
        s"unsupported Avro field type: $other")
    }
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      val base = prim(f.dataType)
      val typ =
        if (f.nullable)
          Schema.createUnion(java.util.List.of(
            Schema.create(Schema.Type.NULL), base))
        else base
      fields.add(new Schema.Field(f.name, typ, null, null))
    }
    val rec = Schema.createRecord(name, null, "graft", false)
    rec.setFields(fields)
    rec
  }

  def write(df: DataFrame, path: String): Unit = {
    val st = df.schema
    val schemaJson = avroSchemaFor(st, "graft_record").toString
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    val n = st.fields.length
    df.rdd.mapPartitions { rows =>
      // parse once per task; Schema is not serializable, the JSON is
      val sch = new Schema.Parser().parse(schemaJson)
      rows.map { r =>
        val rec = new GenericData.Record(sch)
        var i = 0
        while (i < n) { rec.put(i, r.get(i)); i += 1 }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(
      path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  def read(spark: SparkSession, path: String, st: StructType): DataFrame = {
    val schemaJson = avroSchemaFor(st, "graft_record").toString
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("avro.schema.input.key", schemaJson)
    val fields = st.fields
    val rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable], conf)
      .map { case (k, _) =>
        // copy IMMEDIATELY: the record reader reuses the Avro object, and
        // Utf8 must become String before Spark sees it
        val rec = k.datum()
        Row.fromSeq(fields.indices.map { i =>
          val v = rec.get(i)
          fields(i).dataType match {
            case StringType => if (v == null) null else v.toString
            case BinaryType => if (v == null) null
              else {
                val bb = v.asInstanceOf[java.nio.ByteBuffer]
                val out = new Array[Byte](bb.remaining()); bb.get(out); out
              }
            case _ => v
          }
        })
      }
    spark.createDataFrame(rdd, st)
  }
}
