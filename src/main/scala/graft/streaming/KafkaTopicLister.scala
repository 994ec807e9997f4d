package graft.streaming

/** S3 closure — the Kafka AdminClient topic scan behind [[Discovery]]'s
  * `() => Seq[String]` injection point (reference:
  * lib/discovery/Discovery.js:87 `getTopicList()`).
  *
  * The sandbox ships no kafka-clients jar (and the offline resolver
  * cannot fetch one), so the adapter binds to the AdminClient API via
  * reflection: it compiles and is spec-covered without Kafka on the
  * classpath, and on a real cluster (where spark-sql-kafka +
  * kafka-clients are present) it is a plain
  * `AdminClient.create(props).listTopics().names().get(timeout)` call.
  * Nothing hides behind the reflection — one create, one listTopics,
  * one close.
  *
  * Usage: `new Discovery(...).discoverTopics(new KafkaTopicLister(bs))`.
  */
final class KafkaTopicLister(bootstrapServers: String, timeoutMs: Long = 30000L)
    extends (() => Seq[String]) {

  /** One topic scan. Throws ClassNotFoundException when kafka-clients
    * is absent (fail fast — a silent empty list would read as "all
    * topics deleted" to the discovery diff).
    */
  override def apply(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val cl = Class.forName(KafkaTopicLister.AdminClientClass)
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bootstrapServers)
    props.put("request.timeout.ms", timeoutMs.toString)
    val admin = cl.getMethod("create", classOf[java.util.Properties]).invoke(null, props)
    try {
      val result = cl.getMethod("listTopics").invoke(admin)
      val namesFuture = result.getClass.getMethod("names").invoke(result)
      val names = namesFuture.getClass
        .getMethod("get", classOf[Long], classOf[java.util.concurrent.TimeUnit])
        .invoke(namesFuture, java.lang.Long.valueOf(timeoutMs),
          java.util.concurrent.TimeUnit.MILLISECONDS)
      names.asInstanceOf[java.util.Set[String]].asScala.toSeq.sorted
    } finally cl.getMethod("close").invoke(admin)
  }
}

object KafkaTopicLister {
  private[streaming] val AdminClientClass = "org.apache.kafka.clients.admin.AdminClient"

  /** True when kafka-clients is on the classpath (deploy environments);
    * false in the sandbox, where the specs assert the fail-fast path.
    */
  def isAvailable: Boolean =
    try { Class.forName(AdminClientClass); true }
    catch { case _: ClassNotFoundException => false }
}
