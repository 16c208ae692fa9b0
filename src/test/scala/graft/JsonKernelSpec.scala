package graft

import graft.functions.JsonKernelFunctions.jsonLong
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Agreement of `graft_json_long(json, k)` with the built-in
  * composition `get_json_object(json, '$.k').cast("long")` — the
  * executable contract for the q16 JSON fast path. The kernel is an
  * evaluation strategy only, so the two must agree row-for-row on
  * every input, including the ones designed to break a naive
  * substring scan.
  */
class JsonKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(inputs: Seq[String], key: String = "k"): Unit = {
    val df = inputs.toDF("j")
    val rows = df.select(
      col("j"),
      jsonLong(col("j"), key).as("got"),
      get_json_object(col("j"), s"$$.$key").cast("long").as("want")).collect()
    val bad = rows.filter(r => r.get(1) != r.get(2))
    assert(bad.isEmpty, bad.map(r =>
      s"${r.getString(0)}: got=${r.get(1)} want=${r.get(2)}").mkString("\n"))
  }

  test("plain integers, signs, whitespace, missing key") {
    check(Seq(
      """{"k": 42}""",
      """{"k":0}""",
      """{"k": -7}""",
      """{ "k" : 123456789012 }""",
      """{"a": 1, "k": 2, "b": 3}""",
      """{"a": 1}""", // missing
      """{}""",
      """{"k": 9223372036854775807}""", // Long.MaxValue
      """{"k": -9223372036854775808}""", // Long.MinValue
      """{"k": 9223372036854775808}""", // overflow -> null
      """{"k": -9223372036854775809}""")) // underflow -> null
  }

  test("non-integer scalars are null like the cast makes them") {
    check(Seq(
      """{"k": 1.5}""",
      """{"k": 1e3}""",
      """{"k": true}""",
      """{"k": false}""",
      """{"k": null}""",
      """{"k": "text"}""",
      """{"k": "42"}""", // quoted integer -> the cast parses it
      """{"k": " 42 "}""", // the cast trims
      """{"k": "+7"}""", // the cast takes a leading +
      """{"k": "007"}""", // cast accepts leading zeros in strings
      """{"k": "1.5"}""",
      """{"k": ""}"""))
  }

  test("nested objects and arrays: only the top level matches") {
    check(Seq(
      """{"a": {"k": 1}, "k": 2}""",
      """{"a": {"k": 1}}""", // k only nested -> null
      """{"a": [1, 2, {"k": 3}], "k": 4}""",
      """{"k": {"x": 1}}""", // object value -> null
      """{"k": [1, 2]}""", // array value -> null
      """{"a": "}", "k": 5}""", // brace inside a string
      """{"a": "\"k\": 9", "k": 6}""", // decoy key inside a string value
      """{"a": [[[{"b": [1]}]]], "k": 7}"""))
  }

  test("duplicate keys: first non-null occurrence wins (JSON null is skipped)") {
    check(Seq(
      """{"k": 1, "k": 2}""",
      """{"k": "x", "k": 2}""", // "x" matches (casts null), 2 never reached
      """{"k": null, "k": 2}""", // null match keeps scanning -> 2
      """{"k": null, "k": "341", "k": 5}""",
      """{"k": true, "k": 2}""", // boolean matches and stops -> null
      """{"k": {"a": 1}, "k": 2}""", // object matches and stops -> null
      """{"k": null}"""))
  }

  test("float normalization: Jackson re-renders through Double.toString") {
    check(Seq(
      """{"k": 1e3}""", // -> "1000.0" -> 1000
      """{"k": 1E-2}""", // -> "0.01" -> 0
      """{"k": 1.999}""", // -> truncates -> 1
      """{"k": -2.5}""", // -> -2
      """{"k": 12345678.5}""", // >= 1e7 -> E-notation -> null
      """{"k": 9999999.5}""", // < 1e7 -> "9999999.5" -> 9999999
      """{"k": 1.5e300}""",
      """{"k": 1e999}""", // overflows to Infinity -> null
      """{"k": -0.0}""",
      """{"k": 0.001}""",
      """{"k": 0.0001}""", // -> "1.0E-4" -> null
      """{"k": 100000000000000000000}""")) // big int text -> cast overflow null
  }

  test("strictness: an error anywhere in the object nulls the result") {
    check(Seq(
      """{"k": 1, "a": 01}""", // error AFTER the match
      """{"k": 1, "a": {"b": 02}}""", // nested error after the match
      """{"a": {"b": 01}, "k": 2}""", // nested error before the match
      """{"k": 1, "a": 1.5.5}""",
      """{"k": 1, "a": +5}""",
      """{"k": 1 """, // EOF after match, object never closes
      """{"k": 2, }""", // trailing comma
      """{"k": 2} trailing garbage""", // AFTER the close: ignored
      """{"k": 2}[1,2""",
      "{\"k\": 1, \"a\": \"bad\\escape\"}",
      "{\"k\": 1, \"a\": \"bad\\u00zzescape\"}"))
  }

  test("deep nesting agrees with Jackson's depth limit") {
    def deep(n: Int) =
      """{"k": 7, "a": """ + ("[" * n) + "1" + ("]" * n) + "}"
    check(Seq(deep(5), deep(900), deep(1100), deep(2000)))
  }

  test("escapes and unicode in keys and values") {
    check(Seq(
      "{\"\\u006b\": 11}", // \u006b escape decodes to key k
      "{\"\\u006B\": 12}", // uppercase hex digits
      "{\"\\u00zz\": 1, \"k\": 2}", // invalid \u -> malformed key
      """{"k\n": 1, "k": 2}""", // escaped-suffix key is a different key
      """{"kk": 1, "k": 2}""",
      """{"K": 1, "k": 2}""", // case-sensitive
      """{"été": 1, "k": 3}""", // multi-byte sibling key
      "{\"k\": \"\\u0034\\u0032\"}", // "42" via escapes
      "{\"a\": \"café\", \"k\": 9}"))
    check(Seq("""{"été": 21, "k": 1}"""), key = "été")
  }

  test("malformed documents are null") {
    check(Seq(
      "",
      "   ",
      "not json",
      """[1, 2, 3]""", // non-object root
      """42""",
      """{"k": }""",
      """{"k" 1}""",
      """{"k": 1""", // unterminated... (jackson may still yield 1: see below)
      """{k: 1}""", // unquoted key
      """{"a": 01, "k": 2}""", // leading zero before the key -> parse error
      """{"k": 01}""", // leading zero at the key
      """{"a": 1 "k": 2}""", // missing comma
      """{"a": "unterminated"""))
  }

  test("value skimming stops at structural bytes, not spaces only") {
    check(Seq(
      """{"a":1,"k":2}""",
      """{"a":[1,2],"k":[3]}""",
      """{"a":{"b":{"c":1}},"k":8}""",
      "{\"a\": \"line\\nbreak\", \"k\": 10}",
      "{\"a\": \"tab\\t\", \"k\": -11}"))
  }

  test("fuzz: random documents agree with the built-in composition") {
    val rnd = new Random(17)
    val keys = Seq("k", "kk", "a", "K")
    def randValue(depth: Int): String = rnd.nextInt(if (depth > 2) 6 else 8) match {
      case 0 => rnd.nextLong().toString
      case 1 => s""""${rnd.nextInt(1000)}""""
      case 2 => "null"
      case 3 => "true"
      case 4 => (rnd.nextDouble() * 100).toString
      case 5 => s""""w${rnd.nextInt(100)}""""
      case 6 => "{" + Seq.fill(rnd.nextInt(3))(
        s""""${keys(rnd.nextInt(keys.length))}": ${randValue(depth + 1)}""").mkString(", ") + "}"
      case 7 => "[" + Seq.fill(rnd.nextInt(3))(randValue(depth + 1)).mkString(", ") + "]"
    }
    val docs = (1 to 2000).map { _ =>
      val n = rnd.nextInt(5)
      "{" + Seq.fill(n)(
        s""""${keys(rnd.nextInt(keys.length))}": ${randValue(0)}""").mkString(", ") + "}"
    }
    check(docs)
  }

  test("SQL registration: the extension name resolves and matches") {
    Seq("""{"k": 5}""").toDF("j").createOrReplaceTempView("json_kernel_probe")
    val r = spark.sql(
      "SELECT graft_json_long(j, 'k') AS v FROM json_kernel_probe").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(5L))
  }
}
