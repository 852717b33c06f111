package graft

import graft.functions.JsonLongKey
import org.apache.spark.sql.functions._

/** Native graft_json_long scanner: known edge cases + randomized parity
  * with get_json_object(json, '$.key')::long. */
class JsonLongKeySpec extends SparkSpec {

  import spark.implicits._

  test("known cases: top-level match, escapes, nesting, non-integers") {
    def c(json: String) = Option(JsonLongKey.compute(json, "k")).map(_.toLong)
    assert(c("""{"k":7}""").contains(7L))
    assert(c("""{"a":1,"k":-3}""").contains(-3L))
    assert(c("""{ "k" : 42 , "z": 0 }""").contains(42L))
    assert(c("""{"k":"42"}""").contains(42L)) // quoted integer unwraps
    assert(c("""{"a":2}""").isEmpty) // missing
    assert(c("""{"k":1.5}""").isEmpty) // non-integer
    assert(c("""{"k":true}""").isEmpty)
    assert(c("""{"k":null}""").isEmpty)
    assert(c("""{"k":{"x":1}}""").isEmpty) // object value
    assert(c("""{"k":[1,2]}""").isEmpty) // array value
    // the SAME key nested deeper must NOT match — top level only
    assert(c("""{"o":{"k":9},"k":2}""").contains(2L))
    assert(c("""{"o":{"k":9}}""").isEmpty)
    assert(c("""{"arr":[{"k":5}],"k":6}""").contains(6L))
    // a string VALUE containing "k": must not confuse the scanner
    assert(c("""{"a":"\"k\":99,","k":8}""").contains(8L))
    assert(c("""{"a":"{not json}","k":8}""").contains(8L))
    // first occurrence wins on duplicate keys (Jackson streaming rule)
    assert(c("""{"k":1,"k":2}""").contains(1L))
    // malformed input → null, never a throw
    assert(c("""not json""").isEmpty)
    assert(c("""{"k" 7}""").isEmpty)
    assert(c("""""").isEmpty)
    assert(c("""[1,2,3]""").isEmpty)
  }

  test("two instances in one projection (distinct codegen locals)") {
    val out = Seq((1L, """{"k":1,"z":2}"""), (2L, """{"z":5}"""))
      .toDF("id", "j")
      .select($"id",
        call_function("graft_json_long", $"j", lit("k")).as("a"),
        call_function("graft_json_long", $"j", lit("z")).as("b"))
      .orderBy($"id")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    assert(out == Seq((1L, Some(1L), Some(2L)), (2L, None, Some(5L))))
  }

  test("property: parity with get_json_object(...)::long on random JSON") {
    val rnd = new scala.util.Random(17)
    def randString(): String =
      Seq.fill(rnd.nextInt(8))("ab\\\"k:,{}"(rnd.nextInt(9))).mkString
    def randValue(depth: Int): String = rnd.nextInt(if (depth > 1) 4 else 6) match {
      case 0 => rnd.nextInt(2000).toString
      case 1 => "\"" + randString().replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case 2 => "null"
      case 3 => "true"
      case 4 => "{" + Seq.fill(rnd.nextInt(3))(
        s""""f${rnd.nextInt(5)}":${randValue(depth + 1)}""").mkString(",") + "}"
      case 5 => "[" + Seq.fill(rnd.nextInt(3))(randValue(depth + 1)).mkString(",") + "]"
    }
    val jsons = Seq.tabulate(200) { i =>
      val fields = scala.collection.mutable.ArrayBuffer[String]()
      (0 until rnd.nextInt(4)).foreach(j => fields += s""""a$j":${randValue(1)}""")
      // the target key holds an INTEGER (or is absent) — the cast side
      // of the oracle comparison is only defined for integral values
      if (i % 3 != 0) fields.insert(rnd.nextInt(fields.size + 1),
        s""""k":${rnd.nextInt(100000) - 50000}""")
      (i.toLong, "{" + fields.mkString(",") + "}")
    }
    val df = jsons.toDF("id", "j")
    val viaJackson = df.select($"id",
        get_json_object($"j", "$.k").cast("long").as("v"))
      .as[(Long, Option[Long])].collect().toMap
    val viaNative = df.select($"id",
        call_function("graft_json_long", $"j", lit("k")).as("v"))
      .as[(Long, Option[Long])].collect().toMap
    assert(viaNative == viaJackson)
  }
}
