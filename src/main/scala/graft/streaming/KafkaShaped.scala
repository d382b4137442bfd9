package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S4 — Kafka-shaped streaming source, simulated over files.
  *
  * The sandbox has no Kafka broker, so the stream is a file-source
  * microbatch reader over JSONL "topic files" whose rows carry exactly
  * the Kafka record frame: `(key, value, topic, partition, offset,
  * timestamp)` — the contract the reference's consumer tests pin
  * (`tests/integration/test_producer_integration.py:78-130`; topics
  * `src/config/settings.py:27-30`). Swapping in a real broker is the
  * one-line change to `spark.readStream.format("kafka")` with the same
  * downstream frame.
  *
  * T7 (backpressure, `producer.py:124-139` analog): rate limiting is the
  * source option `maxFilesPerTrigger` here (`maxOffsetsPerTrigger` on a
  * real Kafka source) — the Spark-native form of bounded ingest.
  */
object KafkaShaped {

  val schema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType)))

  /** Streaming reader over a directory of JSONL topic files. */
  def fileStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n)).json(dir)
  }

  /** The wire serialization of an entity frame — one JSON string per
    * row with the explicit microsecond timestampFormat (the default
    * truncates to millis and would silently lose payload precision
    * through the round trip). Shared by the producer file writer and
    * any metrics that measure produced bytes, so both describe the SAME
    * bytes. */
  def valueJson(df: DataFrame): org.apache.spark.sql.Column =
    to_json(struct(df.columns.map(col).toIndexedSeq: _*),
      Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"))

  /** Producer-side helper (S3 analog for the file simulation): serialize
    * an entity frame to keyed JSON records with lineage columns and
    * append them as one topic file. `offsetBase` plays the broker's role
    * of assigning monotone offsets per partition. */
  def writeTopicFile(df: DataFrame, keyCol: String, topic: String,
      nPartitions: Int, offsetBase: Long, dir: String): Unit = {
    val keyed = df
      .withColumn("key", col(keyCol).cast("string"))
      .withColumn("value", valueJson(df))
      .withColumn("topic", lit(topic))
      .withColumn("partition", pmod(xxhash64(col("key")), lit(nPartitions)).cast("int"))
      .withColumn("offset",
        lit(offsetBase) + row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("partition")).orderBy(col("key"))).cast("long"))
      .withColumn("timestamp", current_timestamp())
      .select("key", "value", "topic", "partition", "offset", "timestamp")
    keyed.coalesce(1).write.mode("append").json(dir)
  }
}
