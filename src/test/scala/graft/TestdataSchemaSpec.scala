package graft

/** Early-warning tripwire for driver testdata regeneration: pins the
  * Spark-visible schema (name + type, in order) of every testdata table
  * at sf0.001. The r12 regeneration silently changed `events.ts` from
  * TIMESTAMP(NANOS) to timestamp-micros NTZ and four queries failed at
  * plan time for three rounds before anyone noticed (round-14 verdict
  * #1); this spec turns the NEXT such drift into a named red test the
  * first time `sbt test` runs. On failure: fix `Tables` (and any query
  * assuming the old type), then re-pin here.
  *
  * Raw `spark.read` schemas — deliberately NOT through `Tables.events`,
  * whose normalization would mask exactly the drift this guards
  * (TablesSpec covers the normalized view).
  */
class TestdataSchemaSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp_ntz",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  expected.foreach { case (table, exp) =>
    test(s"$table parquet schema is unchanged since the r15 pin") {
      // tripwire, not a unit test: requires driver testdata. Off-sandbox
      // the suite cancels ("canceled") instead of going red.
      assume(new java.io.File(s"$sf/$table.parquet").exists(),
        s"driver testdata absent at $sf — tripwire only runs on-sandbox")
      // NOTE on the legacy nanos conf: SparkSpec shares ONE session across
      // suites and Tables.events sets nanosAsLong session-wide, so whether
      // this raw read sees it depends on suite order. Either way a NANOS
      // regeneration reds this test — with the conf set, `ts` reads as
      // bigint (≠ pinned timestamp_ntz); without it, the read throws —
      // only the failure SHAPE differs, not the tripwire.
      val got = spark.read.parquet(s"$sf/$table.parquet")
        .schema.map(f => f.name -> f.dataType.simpleString)
      assert(got == exp,
        s"\nTESTDATA DRIFT in $table.parquet — driver regenerated with a " +
          s"new schema.\n  got:      $got\n  expected: $exp\n" +
          "Update graft.Tables (and any query assuming the old type), " +
          "run the full verify gate, then re-pin this spec.")
    }
  }
}
