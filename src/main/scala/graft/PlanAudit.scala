package graft

import org.apache.spark.sql.SparkSession

/** Developer tool: dump the formatted physical plan of every registered
  * query so scan pruning, filter pushdown, broadcast choices, and
  * whole-stage-codegen coverage can be audited (the 100 TB design
  * review). Usage: runMain graft.PlanAudit [sfDir] [queryName...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val which = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (which.isEmpty || which(name)) {
        println(s"\n===================== $name =====================")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"plan failed: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
