package graft.core

/** Human duration strings <-> seconds.
  *
  * Re-expresses the juration subset the reference DSL accepts
  * (reference: lib/dsl/DSLHandler.js:79-86 parses window strings such as
  * "30s"/"1m"/"15m"/"1h"/"12h"/"2d"/"1w"; lib/dsl/DSLHandler.js:221
  * stringifies seconds back for the anomaly record's humanWindow field).
  */
object Durations {

  private val unitSeconds: Map[String, Long] = Map(
    "s" -> 1L,
    "m" -> 60L,
    "h" -> 3600L,
    "d" -> 86400L,
    "w" -> 604800L,
  )

  private val Pattern = """^\s*(\d+)\s*([smhdw])\s*$""".r

  /** "15m" -> Some(900); invalid strings -> None (the reference skips
    * unparseable windows rather than failing: lib/dsl/DSLHandler.js:79-86).
    */
  def parseSeconds(s: String): Option[Long] = s match {
    case Pattern(n, u) => unitSeconds.get(u).map(_ * n.toLong)
    case _             => None
  }

  /** Seconds -> human string, largest-exact-unit-first (juration-style
    * stringify used for Anomaly.humanWindow, lib/dsl/DSLHandler.js:221).
    * 900 -> "15m", 604800 -> "1w", 90 -> "1m30s".
    */
  def human(seconds: Long): String = {
    if (seconds == 0L) return "0s"
    val units = Seq("w" -> 604800L, "d" -> 86400L, "h" -> 3600L, "m" -> 60L, "s" -> 1L)
    val sb = new StringBuilder
    var rem = seconds
    units.foreach { case (u, sz) =>
      if (rem >= sz) { sb.append(rem / sz).append(u); rem %= sz }
    }
    sb.toString
  }
}
