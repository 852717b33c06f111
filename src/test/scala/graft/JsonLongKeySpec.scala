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
    // Long-range edges: exact bounds parse, anything beyond → null
    // (matching non-ANSI cast), never a silently wrapped value
    assert(c("""{"k":9223372036854775807}""").contains(Long.MaxValue))
    assert(c("""{"k":-9223372036854775808}""").contains(Long.MinValue))
    assert(c("""{"k":9223372036854775808}""").isEmpty)
    assert(c("""{"k":-9223372036854775809}""").isEmpty)
    assert(c("""{"k":99999999999999999999}""").isEmpty)
    assert(c("""{"k":"99999999999999999999"}""").isEmpty)
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
    // codegen fallback DISABLED: if the generated code (incl. the
    // hoisted key reference object) failed janino compilation, this
    // would throw instead of silently running interpreted
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val out = Seq((1L, """{"k":1,"z":2}"""), (2L, """{"z":5}"""))
        .toDF("id", "j")
        .select($"id",
          call_function("graft_json_long", $"j", lit("k")).as("a"),
          call_function("graft_json_long", $"j", lit("z")).as("b"))
        .orderBy($"id")
        .as[(Long, Option[Long], Option[Long])].collect().toSeq
      assert(out == Seq((1L, Some(1L), Some(2L)), (2L, None, Some(5L))))
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("fuzz: arbitrary garbage never throws (hand-written scanner)") {
    val rnd = new scala.util.Random(99)
    val alphabet = """{}[]":,\ab0-9.eE 😀""" + "\u0000"
    (0 until 2000).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(40))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      JsonLongKey.compute(s, "k") // must return (Long|null), never throw
    }
    // truncated-at-every-prefix valid JSON
    val full = """{"a":"x\"y","k":-42,"o":{"k":[1,{"z":"}"}]}}"""
    (0 to full.length).foreach(i => JsonLongKey.compute(full.take(i), "k"))
    assert(Option(JsonLongKey.compute(full, "k")).map(_.toLong).contains(-42L))
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
      // of the oracle comparison is only defined for integral values.
      // Every 5th integer comes from the Long-range EDGE pool so the
      // overflow→null path is parity-tested too (round-7 advice: the
      // old [-50000,50000) draw never exercised it)
      val edgePool = Seq("9223372036854775807", "-9223372036854775808",
        "9223372036854775808", "-9223372036854775809",
        "99999999999999999999", "-99999999999999999999",
        "18446744073709551616")
      if (i % 3 != 0) {
        val v = if (i % 5 == 0) edgePool(rnd.nextInt(edgePool.size))
                else (rnd.nextInt(100000) - 50000).toString
        fields.insert(rnd.nextInt(fields.size + 1), s""""k":$v""")
      }
      (i.toLong, "{" + fields.mkString(",") + "}")
    }
    val df = jsons.toDF("id", "j")
    // try_cast = the non-ANSI cast semantics graft_json_long matches
    // (null on overflow); a plain cast THROWS under Spark 4's default
    // ANSI mode once the edge pool is in play
    val viaJackson = df.select($"id",
        expr("try_cast(get_json_object(j, '$.k') as long)").as("v"))
      .as[(Long, Option[Long])].collect().toMap
    val viaNative = df.select($"id",
        call_function("graft_json_long", $"j", lit("k")).as("v"))
      .as[(Long, Option[Long])].collect().toMap
    assert(viaNative == viaJackson)
  }
}
