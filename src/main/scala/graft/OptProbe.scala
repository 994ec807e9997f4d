package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Developer measurement tool for the optimization rounds (guide §1):
  * per-query wall times under the EXACT bench session config, a
  * noop-sink variant (computes every column, §1.4), and a per-stage
  * breakdown (executor run/CPU time, shuffle bytes, spill) so the time
  * goes somewhere attributable instead of being guessed at.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.OptProbe q_profile q_self_repeat"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_PROBE_RUNS (default 3),
  *      SPARK_GRAFT_PROBE_NOOP=1 to also time the noop sink.
  */
object OptProbe {
  private class StageLog extends SparkListener {
    case class Row(id: Int, name: String, tasks: Int, runMs: Long, cpuMs: Long,
      shufReadMb: Double, shufWriteMb: Double, spillMb: Double, inputMb: Double)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val tm = si.taskMetrics
      if (tm != null) rows += Row(si.stageId, si.name.takeWhile(_ != '\n').take(80),
        si.numTasks, tm.executorRunTime, tm.executorCpuTime / 1000000,
        tm.shuffleReadMetrics.totalBytesRead / 1e6,
        tm.shuffleWriteMetrics.bytesWritten / 1e6,
        tm.diskBytesSpilled / 1e6,
        tm.inputMetrics.bytesRead / 1e6)
    }
    def dumpAndClear(): Unit = {
      rows.sortBy(-_.runMs).take(12).foreach { r =>
        println(f"  stage ${r.id}%4d tasks=${r.tasks}%3d run=${r.runMs}%6dms cpu=${r.cpuMs}%6dms " +
          f"sr=${r.shufReadMb}%8.2fMB sw=${r.shufWriteMb}%8.2fMB spill=${r.spillMb}%6.1fMB in=${r.inputMb}%7.2fMB  ${r.name}")
      }
      println(f"  TOTAL stages=${rows.size} run=${rows.map(_.runMs).sum}%dms cpu=${rows.map(_.cpuMs).sum}%dms")
      rows.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "3").toInt.max(1)
    val doNoop = sys.env.get("SPARK_GRAFT_PROBE_NOOP").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus, 2]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "1m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val log = new StageLog
    spark.sparkContext.addSparkListener(log)

    // same warm-up as Bench so first-query numbers are comparable
    {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy(col("l_returnflag")).agg(count(lit(1))).collect()
      import spark.implicits._
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val tiny = Seq.tabulate(8)(i => Array(i.toDouble, (7 - i).toDouble))
        .toDF("a").select(array_to_vector($"a").as("features"))
      new KMeans().setK(2).setSeed(1L).setMaxIter(1).fit(tiny)
    }

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"unknown query: $name")
        case Some(fn) =>
          println(s"\n===================== $name =====================")
          val times = (1 to runs).map { i =>
            spark.sparkContext.setJobDescription(s"$name count run$i")
            val t0 = System.nanoTime()
            val df = fn(spark, sfDir)
            val tBuild = (System.nanoTime() - t0) / 1e9
            df.queryExecution.executedPlan // force analysis+optimization+physical planning
            val tPlan = (System.nanoTime() - t0) / 1e9 - tBuild
            val n = df.count()
            val dt = (System.nanoTime() - t0) / 1e9
            spark.catalog.clearCache()
            if (i < runs) log.rows.clear() // keep only the last run's stages
            (dt, n, tBuild, tPlan)
          }
          println(f"count():  ${times.map(_._1).map(t => f"$t%.3f").mkString(" ")} s   rows=${times.head._2}")
          println(f"build:    ${times.map(_._3).map(t => f"$t%.3f").mkString(" ")} s   plan: ${times.map(_._4).map(t => f"$t%.3f").mkString(" ")} s")
          log.dumpAndClear()
          if (doNoop) {
            val nt = (1 to runs).map { i =>
              spark.sparkContext.setJobDescription(s"$name noop run$i")
              val t0 = System.nanoTime()
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              val dt = (System.nanoTime() - t0) / 1e9
              spark.catalog.clearCache()
              if (i < runs) log.rows.clear()
              dt
            }
            println(f"noop:     ${nt.map(t => f"$t%.3f").mkString(" ")} s")
            log.dumpAndClear()
          }
      }
    }
    spark.stop()
  }
}
