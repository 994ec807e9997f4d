package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Extraction
import graft.operators.Extraction.FieldCol
import graft.functions.SchemaFlatten

class MessageSourcesSpec extends SparkSpec {

  private def writeLines(suffix: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("src").toString
    Files.write(java.nio.file.Paths.get(s"$dir/part-0.$suffix"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("jsonl source reads the message shape and applies the malformed guard") {
    val dir = writeLines("json", Seq(
      """{"topic":"t1","key":"k1","value":"{\"v\":1}","ts":"2024-01-01T00:00:00.000Z"}""",
      """{"topic":null,"key":"k2","value":"{\"v\":2}","ts":"2024-01-01T00:00:01.000Z"}""",
      """{"topic":"t1","key":"k3","value":null,"ts":"2024-01-01T00:00:02.000Z"}""",
    ))
    val out = MessageSources.jsonl(spark, dir).collect()
    assert(out.length == 1) // null topic and null value both dropped (F1)
    assert(out.head.getString(0) == "t1" && out.head.getString(1) == "k1")
  }

  test("csv source round-trips the same schema") {
    val dir = writeLines("csv", Seq(
      "topic,key,value,ts",
      """t2,kA,"{""v"":7}",2024-01-01T01:00:00.000Z""",
    ))
    val out = MessageSources.csv(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "t2")
    assert(out.head.getString(2) == """{"v":7}""")
  }

  test("orc source round-trips the message shape with the F1 guard") {
    import java.sql.Timestamp
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("orcsrc").toString
    Seq(
      ("t3", "k1", """{"v":9}""", new Timestamp(1704067200000L)),
      (null.asInstanceOf[String], "k2", """{"v":2}""", new Timestamp(1704067201000L)),
    ).toDF("topic", "key", "value", "ts").write.mode("overwrite").orc(dir)
    val out = MessageSources.orc(spark, dir).collect()
    assert(out.length == 1) // F1 drops the null-topic row
    assert(out.head.getString(0) == "t3" && out.head.getString(2) == """{"v":9}""")
  }

  test("eventsAsMessages feeds the extraction pipeline end-to-end") {
    val sf = "/root/testdata/sf0.001"
    val msgs = MessageSources.eventsAsMessages(spark, sf)
    val long = Extraction.longFormat(
      msgs,
      topic = col("topic"),
      ts = col("ts"),
      fields = Seq(
        FieldCol("value", SchemaFlatten.jsonByPath(col("value"), "value").try_cast("double")),
        FieldCol("props.k", SchemaFlatten.jsonByPath(col("value"), "props.k").try_cast("double")),
      ),
    )
    val n = long.filter(col("path") === "value").count()
    val expected = graft.queries.Tables.events(spark, sf)
      .filter(col("event_type").isNotNull && col("value").isNotNull).count()
    assert(n == expected, s"message-replay extraction lost rows: $n vs $expected")
  }

  test("streaming jsonl source drives a micro-batch query") {
    val dir = writeLines("json", Seq(
      """{"topic":"s1","key":"k","value":"{\"v\":5}","ts":"2024-01-01T00:00:00.000Z"}""",
    ))
    val q = MessageSources.jsonlStream(spark, dir)
      .writeStream.format("memory").queryName("file_msgs").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("file_msgs").count() == 1)
    } finally q.stop()
  }
}

class CorpusSinkSpec extends SparkSpec {

  test("partitioned corpus write: pruned dirs, bounded files, faithful read-back") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.queries.Tables.documents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("corpus").toString + "/docs"
    CorpusSink.write(docs, out, maxRecordsPerFile = 10L)
    // one directory per source value (partition pruning surface)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("source=")).toSet
    assert(dirs.size == 20, s"expected 20 source partitions, got ${dirs.size}")
    // maxRecordsPerFile: a 25-doc source must split into >= 3 files
    val oneDir = new java.io.File(out, dirs.head)
    val files = oneDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(files >= 3, s"maxRecordsPerFile not honored: $files files")
    // faithful read-back (partition column round-trips)
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    val a = docs.select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val b = back.select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(a == b)
  }
}
