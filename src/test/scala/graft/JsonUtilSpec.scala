package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shared escaper feeds both driver-parsed artifacts
  * (oracle_sql.json, the bench contract line); every escape must
  * round-trip through a real JSON parser (Jackson, shipped with
  * Spark), including the BPE control-char sentinels and
  * builder-authored SQL with quotes/backslashes/newlines.
  */
class JsonUtilSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private val nasty = Seq(
    "plain",
    "quotes \" and \\ backslashes \\\\",
    "newline\nand\rtab\tmix",
    s"sentinels ${graft.pipeline.Bpe.WrapL}wrapped${graft.pipeline.Bpe.WrapR} here",
    "all low controls: " + (0 until 0x20).map(_.toChar).mkString,
    "unicode: café ∑ 中文",
    "",
  )

  test("quote() round-trips arbitrary strings through a JSON parser") {
    nasty.foreach { s =>
      val parsed = mapper.readTree(JsonUtil.quote(s))
      assert(parsed.isTextual && parsed.asText == s, s"round-trip failed for ${s.take(30)}")
    }
  }

  test("escaped payloads embed in objects without breaking the parse") {
    val obj = nasty.zipWithIndex
      .map { case (s, i) => s"${JsonUtil.quote(s"k$i")}: ${JsonUtil.quote(s)}" }
      .mkString("{", ",", "}")
    val parsed = mapper.readTree(obj)
    nasty.zipWithIndex.foreach { case (s, i) =>
      assert(parsed.get(s"k$i").asText == s)
    }
  }
}
