package graft.core

import org.scalatest.funsuite.AnyFunSuite

class DurationsSpec extends AnyFunSuite {
  test("parses the juration subset the reference DSL accepts") {
    assert(Durations.parseSeconds("30s").contains(30L))
    assert(Durations.parseSeconds("1m").contains(60L))
    assert(Durations.parseSeconds("15m").contains(900L))
    assert(Durations.parseSeconds("1h").contains(3600L))
    assert(Durations.parseSeconds("12h").contains(43200L))
    assert(Durations.parseSeconds("2d").contains(172800L))
    assert(Durations.parseSeconds("1w").contains(604800L))
  }

  test("invalid windows are rejected, not thrown (reference skips them)") {
    assert(Durations.parseSeconds("").isEmpty)
    assert(Durations.parseSeconds("15x").isEmpty)
    assert(Durations.parseSeconds("m").isEmpty)
    assert(Durations.parseSeconds("1 month").isEmpty)
  }

  test("stringify round-trips whole units") {
    assert(Durations.human(900L) == "15m")
    assert(Durations.human(604800L) == "1w")
    assert(Durations.human(90L) == "1m30s")
    assert(Durations.human(0L) == "0s")
  }

  test("compound durations parse (juration) and parse(human(x)) round-trips") {
    assert(Durations.parseSeconds("1m30s").contains(90L))
    assert(Durations.parseSeconds("1w2d3h4m5s")
      .contains(604800L + 2 * 86400L + 3 * 3600L + 4 * 60L + 5L))
    assert(Durations.parseSeconds("1m 30s").contains(90L))
    assert(Durations.parseSeconds("1m30").isEmpty)  // trailing bare number
    assert(Durations.parseSeconds("30").isEmpty)    // bare number
    assert(Durations.parseSeconds("1m30x").isEmpty) // bad trailing unit
    // property: every emitted human string parses back to its input
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val x = 1L + (rnd.nextLong() % (2L * 604800L)).abs
      assert(Durations.parseSeconds(Durations.human(x)).contains(x), s"round-trip failed for $x")
    }
  }
}

class DslSpec extends AnyFunSuite {
  test("parse skips invalid windows and empty fields like _parseDSL") {
    val dsl = Dsl.parse(Map(
      "t1" -> Map("a.b" -> Seq("1m", "bogus", "1h"), "c" -> Seq("nope")),
      "t2" -> Map(),
    ))
    assert(dsl.topics.map(_.topic) == Seq("t1"))
    assert(dsl.forTopic("t1").get.fields == Seq(FieldConfig("a.b", Seq(60L, 3600L))))
  }

  test("retention = max window across fields (DSLHandler.js:91)") {
    val dsl = Dsl.parse(Map("t" -> Map("a" -> Seq("1m"), "b" -> Seq("1w", "1h"))))
    assert(dsl.forTopic("t").get.retentionSeconds == 604800L)
  }

  test("static config wins over discovered fields (DSLHandler.js:329-335)") {
    val statc = Dsl.parse(Map("t" -> Map("a" -> Seq("1m"))))
    val discovered = Dsl.parse(Map("t" -> Map("a" -> Seq("1h"), "b" -> Seq("1h")), "u" -> Map("x" -> Seq("15m"))))
    val merged = statc.mergeDiscovered(discovered)
    assert(merged.forTopic("t").get.fields.toSet ==
      Set(FieldConfig("a", Seq(60L)), FieldConfig("b", Seq(3600L))))
    assert(merged.forTopic("u").isDefined)
  }
}
