package graft.streaming

import graft.SparkSpec

/** Wire-level Kafka coverage status, made explicit and machine-checked.
  *
  * The reference's Kafka source and exactly-once sink
  * (WindowingOperations.java:47-60, EventTimeOperations.java:182-208)
  * need two things this sandbox lacks by construction: the
  * spark-sql-kafka connector jar (absent from /opt/spark/jars and every
  * local cache) and a broker (no kafka-server jar, zero network egress
  * to fetch one). The wire path therefore CANNOT run here — coverage is
  * the MemoryStream downstream transforms (StreamingWindowSpec) and the
  * injected-transport exactly-once content tests (KafkaExactlyOnceSpec).
  *
  * This spec pins that status: it probes the data-source registry for
  * "kafka". Today the probe confirms the connector is absent (so the
  * documented gap is real, not an oversight). If a future environment
  * DOES bundle the connector, the probe FAILS loudly — a demand that the
  * real embedded-broker round-trip test be written to replace it.
  */
class KafkaWireSpec extends SparkSpec {

  test("kafka connector availability matches the documented wire-coverage status") {
    val available =
      try {
        // Triggers DataSource provider lookup before any option validation
        // or broker contact; throws DATA_SOURCE_NOT_FOUND if unregistered.
        spark.readStream
          .format("kafka")
          .option("kafka.bootstrap.servers", "localhost:9999")
          .option("subscribe", "probe")
          .load()
        true
      } catch {
        case e: Exception
            if Option(e.getMessage).exists(m =>
              m.contains("DATA_SOURCE_NOT_FOUND") || m.toLowerCase.contains("failed to find")) =>
          false
      }
    assert(
      !available,
      "spark-sql-kafka connector is now on the classpath: replace this probe " +
        "with an embedded-broker wire E2E (kafkaSource -> IdempotentKafkaSink " +
        "round-trip, exactly-once assertion across an injected restart)")
  }
}
