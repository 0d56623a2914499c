package graft

import graft.ops.SetOps
import graft.sources.KafkaOptions

/** Set-op breadth invariants + the env-driven Kafka option surface. */
class SetOpsAndOptionsSpec extends SparkSpec {

  test("approx_count_distinct within 2% of exact per group") {
    SetOps.qApproxDistinctRaw(spark, sf).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_custs").toDouble
      val exact = r.getAs[Long]("exact_custs").toDouble
      assert(math.abs(approx - exact) / exact <= 0.02,
        s"approx $approx vs exact $exact for ${r.get(0)}")
    }
  }

  test("q_approx_distinct oracle row reports every group in bound") {
    val rows = SetOps.qApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Boolean]("approx_within_bound")))
  }

  test("semi + anti partition the customer set") {
    val rows = SetOps.qSemiAnti(spark, sf).collect()
    val total = rows.map(r => r.getAs[Long]("n_with_orders") + r.getAs[Long]("n_without_orders")).sum
    assert(total == spark.read.parquet(s"$sf/customer.parquet").count())
  }

  test("set ops satisfy |union| = |A| + |B| - |intersect| over key sets") {
    val m = SetOps.qSetOps(spark, sf).collect()
      .map(r => r.getAs[String]("set_op") -> r.getAs[Long]("n_custkeys")).toMap
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    def n(status: String) = orders.filter(org.apache.spark.sql.functions.col("o_orderstatus") === status)
      .select("o_custkey").distinct().count()
    assert(m("union") == n("O") + n("F") - m("intersect"))
    assert(m("except_o_minus_f") == n("O") - m("intersect"))
  }

  test("KafkaOptions.fromEnv reads the reference env surface and fails fast") {
    // the env surface takes PEM file PATHS (librdkafka-style, the
    // reference's interface); toSourceOptions must hand the JVM client
    // PEM CONTENT under the configs it actually recognizes
    val ca = java.nio.file.Files.createTempFile("graft-ca", ".pem")
    val caPem = "-----BEGIN CERTIFICATE-----\nMIIB...\n-----END CERTIFICATE-----\n"
    java.nio.file.Files.writeString(ca, caPem)
    val env = Map(
      "KAFKA_BROKER" -> "broker:9092",
      "KAFKA_SCHEMA_REGISTRY" -> "http://reg:8081",
      "KAFKA_GROUP_ID" -> "g1",
      "KAFKA_CA_FILE" -> ca.toString)
    val o = KafkaOptions.fromEnv(env)
    assert(o.broker == "broker:9092" && o.groupId.contains("g1") && o.sslEnabled)
    val src = o.toSourceOptions(Seq("t1", "t2"))
    assert(src("subscribe") == "t1,t2" && src("kafka.security.protocol") == "SSL")
    assert(src("kafka.ssl.truststore.type") == "PEM")
    assert(src("kafka.ssl.truststore.certificates") == caPem,
      "the JVM client needs the PEM content, not a librdkafka path key")
    assert(!src.contains("kafka.ssl.ca.location"),
      "librdkafka-style keys are silently dropped by the JVM client")
    val e = intercept[IllegalArgumentException](KafkaOptions.fromEnv(Map.empty))
    assert(e.getMessage.contains("KAFKA_BROKER"))
  }

  test("ensureTopics fails fast on a missing topic (EnsureTopics parity)") {
    val admin = new KafkaOptions.InMemoryTopicAdmin(Set("a", "b"))
    admin.ensureTopics(Seq("a"))
    val e = intercept[IllegalArgumentException](admin.ensureTopics(Seq("a", "zzz")))
    assert(e.getMessage.contains("zzz"))
  }

  test("event-handler seam dispatches non-message events (WithEventHandler parity)") {
    import graft.sources.KafkaOptions.ConsumerEvent
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[ConsumerEvent]()
    val opts = KafkaOptions(broker = "b:9092", schemaRegistryUrl = "mem:")
      .withEventHandler(seen.add(_))
    val listener = KafkaOptions.listener(opts)
    spark.streams.addListener(listener)
    try {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-events").toString
      Seq(1L, 2L, 3L).toDF("v").write.mode("overwrite").parquet(dir)
      val q = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.LongType))))
        .parquet(dir)
        .writeStream.format("noop")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      // the listener bus is async: poll briefly for the lifecycle events
      val deadline = System.nanoTime() + 15e9.toLong
      def kinds = seen.toArray(Array.empty[ConsumerEvent]).map(_.getClass.getSimpleName).toSet
      while (System.nanoTime() < deadline &&
        !(kinds.contains("Started") && kinds.contains("Terminated"))) Thread.sleep(100)
      assert(kinds.contains("Started"), s"events seen: $kinds")
      assert(kinds.contains("Terminated"), s"events seen: $kinds")
    } finally spark.streams.removeListener(listener)
  }
}
