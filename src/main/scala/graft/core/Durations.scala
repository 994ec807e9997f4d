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

  private val Group = """\s*(\d+)\s*([smhdw])\s*""".r

  /** "15m" -> Some(900); compound strings sum their parts like juration
    * ("1m30s" -> 90, so `parseSeconds(human(x)) == x` round-trips);
    * invalid strings -> None (the reference skips unparseable windows
    * rather than failing: lib/dsl/DSLHandler.js:79-86).
    */
  def parseSeconds(s: String): Option[Long] = {
    if (s == null) return None
    val groups = Group.findAllMatchIn(s).toSeq
    val matchedLen = groups.map(_.matched.length).sum
    // every character must belong to a (number, unit) group — trailing
    // garbage or a bare number rejects the whole string
    if (groups.isEmpty || matchedLen != s.length) None
    else Some(groups.map(m => m.group(1).toLong * unitSeconds(m.group(2))).sum)
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
