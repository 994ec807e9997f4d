package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** CUSUM change-point localization on planted series — the oracle gate
  * proves cross-engine parity on the corpus; this pins the LOCATION
  * math: the peak |CUSUM| must land exactly on the last pre-shift
  * observation, and flat / noise-only series must not flag.
  */
class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("cpev").toString
    rows.map { case (id, tpe, v) =>
      (id, new Timestamp(1700000000000L + id * 1000), id % 7, tpe, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("level shift localizes to the last pre-shift event with ratio 0.5; flat series never flags") {
    // shift: 20 x 1.0 then 20 x 5.0 (mean 3): S_k = -2k bottoms at
    // k=20 -> |S|=40; total abs dev = 40*2 = 80 -> ratio 0.5
    val shift = (1L to 20L).map((_, "shift", 1.0)) ++ (21L to 40L).map((_, "shift", 5.0))
    val flat = (101L to 120L).map((_, "flat", 2.5))
    val dir = writeEvents(shift ++ flat)
    val rows = DriftQueries.changepoint(spark, dir).collect()
      .map(r => r.getAs[String]("topic") -> r).toMap
    val s = rows("shift")
    assert(s.getAs[Long]("cp_event_id") == 20L, s"wrong location: $s")
    assert(s.getAs[Double]("cusum_stat") == 40.0)
    assert(s.getAs[Double]("cp_ratio") == 0.5)
    assert(s.getAs[Boolean]("changed"))
    val f = rows("flat")
    assert(f.getAs[Double]("total_abs_dev") == 0.0)
    assert(f.getAs[Double]("cp_ratio") == 0.0)
    assert(!f.getAs[Boolean]("changed"), "constant series must not flag")
  }

  test("alternating noise stays far under the ratio threshold") {
    // +-1 around mean 0: every prefix sum is -1 or 0 -> stat 1,
    // tad = n -> ratio 1/n
    val noise = (1L to 40L).map(i => (i, "noise", if (i % 2 == 1) -1.0 else 1.0))
    val dir = writeEvents(noise)
    val r = DriftQueries.changepoint(spark, dir).collect().head
    assert(r.getAs[Double]("cp_ratio") <= 0.05, s"noise ratio too high: $r")
    assert(!r.getAs[Boolean]("changed"))
  }
}
