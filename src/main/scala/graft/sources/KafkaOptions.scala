package graft.sources

/** Consumer/producer configuration surface mirroring the reference's
  * env-driven setup and functional options
  * (`kafkaavro/consumer.go:59-104`, `kafkaavro/producer.go:59-99`,
  * `kafkaavro/option.go:11-133`).
  *
  * The same env names the reference documents are read (they are part
  * of its public interface): KAFKA_BROKER, KAFKA_SCHEMA_REGISTRY,
  * KAFKA_GROUP_ID, and the SSL triple KAFKA_CA_FILE / KAFKA_KEY_FILE /
  * KAFKA_CERTIFICATE_FILE. On a cluster these feed
  * `format("kafka")` options; offline they only need to parse and
  * validate, which is what the spec covers.
  */
final case class KafkaOptions(
    broker: String,
    schemaRegistryUrl: String,
    groupId: Option[String] = None,
    caFile: Option[String] = None,
    keyFile: Option[String] = None,
    certificateFile: Option[String] = None,
    // reference option.go surface: pluggable overrides
    sessionTimeoutMs: Int = 6000,
    autoOffsetReset: String = "earliest",
    // Non-message event dispatch (≡ `eventHandler`,
    // `kafkaavro/consumer.go:132-144`: poll events that are not
    // messages go to a pluggable handler, default log). Spark's dual:
    // consumer-level notifications surface as streaming-query
    // lifecycle/progress events — adapt with KafkaOptions.listener.
    eventHandler: KafkaOptions.ConsumerEvent => Unit = KafkaOptions.logHandler) {

  /** ≡ `WithEventHandler` (`kafkaavro/option.go:108-112`). */
  def withEventHandler(h: KafkaOptions.ConsumerEvent => Unit): KafkaOptions =
    copy(eventHandler = h)

  def sslEnabled: Boolean = caFile.isDefined || keyFile.isDefined || certificateFile.isDefined

  /** Options map for `spark.readStream/read.format("kafka")`.
    *
    * SSL (r16): the env surface takes librdkafka-style PEM FILE paths
    * (the reference's interface), but Spark's kafka source forwards
    * `kafka.*` to the JVM client, which has no `ssl.ca.location` /
    * `ssl.key.location` / `ssl.certificate.location` configs — it
    * LOGS-and-DROPS unknown keys, silently connecting with the
    * default truststore and no client cert. The JVM client does
    * accept PEM CONTENT inline (`ssl.truststore.certificates`,
    * `ssl.keystore.key`, `ssl.keystore.certificate.chain` with the
    * PEM store types), so the files are read here, at config time on
    * the driver, and passed as content. */
  def toSourceOptions(topics: Seq[String]): Map[String, String] = {
    def pem(path: String): String =
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8)
    val base = Map(
      "kafka.bootstrap.servers" -> broker,
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> autoOffsetReset,
      "kafka.session.timeout.ms" -> sessionTimeoutMs.toString)
    val group = groupId.map(g => "kafka.group.id" -> g)
    val ssl =
      if (!sslEnabled) Nil
      else Seq(
        Some("kafka.security.protocol" -> "SSL"),
        caFile.map(f => "kafka.ssl.truststore.type" -> "PEM"),
        caFile.map(f => "kafka.ssl.truststore.certificates" -> pem(f)),
        keyFile.map(f => "kafka.ssl.keystore.type" -> "PEM"),
        keyFile.map(f => "kafka.ssl.keystore.key" -> pem(f)),
        certificateFile.map(f => "kafka.ssl.keystore.certificate.chain" -> pem(f))).flatten
    base ++ group ++ ssl
  }
}

object KafkaOptions {

  /** The non-message events a consumer can observe — the counterpart of
    * the reference's `kafka.Event` cases that are not `*kafka.Message`
    * (rebalances, errors, informational events). In Spark these arrive
    * through the streaming-query listener bus rather than a poll loop. */
  sealed trait ConsumerEvent { def description: String }
  object ConsumerEvent {
    final case class Started(queryId: String) extends ConsumerEvent {
      def description: String = s"query $queryId started"
    }
    final case class Progress(queryId: String, batchId: Long, numInputRows: Long)
        extends ConsumerEvent {
      def description: String = s"query $queryId batch $batchId: $numInputRows rows"
    }
    final case class Terminated(queryId: String, error: Option[String])
        extends ConsumerEvent {
      def description: String =
        s"query $queryId terminated${error.map(e => s" with error: $e").getOrElse("")}"
    }
  }

  /** Default handler, like the reference's `log.Println(event)`
    * fallback (`kafkaavro/consumer.go:111-115`). */
  val logHandler: ConsumerEvent => Unit =
    e => System.err.println(s"[graft-kafka] ${e.description}")

  /** Adapt an event handler to the streaming listener bus: register
    * with `spark.streams.addListener(KafkaOptions.listener(opts))`. */
  def listener(opts: KafkaOptions): org.apache.spark.sql.streaming.StreamingQueryListener =
    new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        opts.eventHandler(ConsumerEvent.Started(e.id.toString))
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        opts.eventHandler(ConsumerEvent.Progress(
          e.progress.id.toString, e.progress.batchId, e.progress.numInputRows))
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        opts.eventHandler(ConsumerEvent.Terminated(e.id.toString, e.exception))
    }

  /** Build from the environment, as `NewConsumer`/`NewProducer` do.
    * Missing required vars is an error naming the variable, matching the
    * reference's fail-fast setup. */
  def fromEnv(env: Map[String, String] = sys.env): KafkaOptions = {
    def required(name: String): String = env.getOrElse(name,
      throw new IllegalArgumentException(s"missing required env var $name"))
    KafkaOptions(
      broker = required("KAFKA_BROKER"),
      schemaRegistryUrl = required("KAFKA_SCHEMA_REGISTRY"),
      groupId = env.get("KAFKA_GROUP_ID"),
      caFile = env.get("KAFKA_CA_FILE"),
      keyFile = env.get("KAFKA_KEY_FILE"),
      certificateFile = env.get("KAFKA_CERTIFICATE_FILE"))
  }

  /** Topic existence check seam (≡ `EnsureTopics`,
    * `kafkaavro/consumer.go:193-212`): fails fast when a subscribed
    * topic is absent instead of silently consuming nothing. Backed by an
    * AdminClient on a live cluster; by a fake offline. */
  trait TopicAdmin {
    def existingTopics(): Set[String]
    final def ensureTopics(topics: Seq[String]): Unit = {
      val missing = topics.filterNot(existingTopics())
      require(missing.isEmpty, s"topics do not exist: ${missing.mkString(", ")}")
    }
  }

  final class InMemoryTopicAdmin(topics: Set[String]) extends TopicAdmin {
    override def existingTopics(): Set[String] = topics
  }
}
