package graft.streaming

import graft.functions.AvroCodec
import graft.registry.SchemaRegistryClient
import graft.schema.FixedSchema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Streaming twin of [[graft.sources.KafkaConsume.decode]] — the
  * reference's consumer IS a stream (`kafkaavro/consumer.go`'s poll
  * loop); this is its Structured-Streaming form: a live framed `value`
  * stream (Kafka source, file stream, or a test MemoryStream) decodes
  * through the SAME per-message id-dispatched
  * [[AvroCodec.AvroDecodeRows]] generator the batch path uses, so the
  * batch oracle pins the streaming decode arithmetic.
  *
  * Stateless: no watermark, no state store, no stream-side shuffle —
  * each micro-batch is one codegen'd map/generate pass, junk messages
  * (bad magic, unknown id, truncated frame) drop per batch exactly
  * like the batch path. `knownIds` is REQUIRED: the batch path's
  * fallback id DISCOVERY is a driver collect over the data, which a
  * streaming plan cannot run — and a production consumer knows its ids
  * from config anyway (the reference carries the id in config,
  * SURVEY.md §2.4). Mixed flat/optional writer ids resolve per
  * message; pass `nullable = true` when any registered writer uses the
  * `["null", T]` optional schema so the reader schema carries the
  * unions too. */
object AvroStream {

  def decodeStream(framed: DataFrame, registry: SchemaRegistryClient,
      target: FixedSchema, knownIds: Seq[Int],
      valueCol: String = "value", nullable: Boolean = false): DataFrame = {
    require(framed.isStreaming,
      "decodeStream expects a streaming frame; use KafkaConsume.decode for batch")
    require(knownIds.nonEmpty,
      "decodeStream needs explicit writer-schema ids: data-driven id " +
        "discovery is a driver-side collect a streaming plan cannot run")
    val schemasById = knownIds.map(id => id -> registry.getById(id)).toMap
    val readerJson = if (nullable) target.nullableAvroJson else target.avroJson
    framed.select(AvroCodec.from_avro_rows(col(valueCol), schemasById,
      readerJson, target.sparkSchema))
  }
}
