package graft.sources

import graft.functions.{AvroCodec, Confluent}
import graft.registry.SchemaRegistryClient
import graft.schema.FixedSchema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Consumer-side decode of Confluent-framed Avro messages.
  *
  * Re-expresses `decodeAvroBinary` (`kafkaavro/consumer.go:178-189`):
  * reject magic byte ≠ 0, read the 4-byte big-endian schema id, fetch the
  * schema by id from the registry (driver-side, memoized — the executors
  * never talk to the registry), decode the remaining bytes. With a live
  * cluster the input frame comes from
  * `spark.readStream.format("kafka")`; offline it is any DataFrame with a
  * binary `value` column. Kafka commit semantics are replaced by
  * Structured Streaming checkpointing (strictly stronger).
  */
object KafkaConsume {

  /** Distinct schema ids present in the frame — metadata-scale collect
    * (the set of schema versions, not the data). */
  def schemaIds(framed: DataFrame, valueCol: String = "value"): Seq[Int] =
    framed.select(Confluent.schemaId(col(valueCol)).as("sid"))
      .distinct().collect().map(_.getInt(0)).toSeq

  /** Decode a framed `value` column into typed rows. Handles schema
    * evolution the same way the reference does — per-message schema id →
    * registry lookup (cached) — by decoding each id group with its own
    * schema and unioning by column name. Messages with a bad magic byte
    * are rejected like `consumer.go:180` ("unknown magic byte"). */
  def decode(framed: DataFrame, registry: SchemaRegistryClient,
      target: FixedSchema, valueCol: String = "value"): DataFrame = {
    val ok = framed.filter(Confluent.hasMagic(col(valueCol)))
    val ids = schemaIds(ok, valueCol)
    require(ids.nonEmpty, "no decodable messages (empty input or bad magic bytes)")
    val outType = target.sparkSchema
    val parts = ids.map { id =>
      val writerJson = registry.getById(id)
      ok.filter(Confluent.schemaId(col(valueCol)) === id)
        .select(AvroCodec.from_avro(Confluent.payload(col(valueCol)), writerJson, outType).as("r"))
        .select(col("r.*"))
    }
    parts.reduce(_ unionByName _)
  }
}
