package graft

import graft.ext.Quantize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def enc(vecs: (Long, Seq[Double])*) =
    Quantize.sq8Encode(vecs.toDF("vec_id", "emb"), "emb")

  test("sq8Encode: codes are tinyint, extremes map to -128/127") {
    val df = enc((1L, Seq(-2.0, 0.0, 3.0)))
    assert(df.schema("qcode").dataType == ArrayType(ByteType, containsNull = true))
    val r = df.select($"qmin", $"qmax", $"qcode").as[(Double, Double, Seq[Byte])]
      .head()
    assert(r._1 == -2.0 && r._2 == 3.0)
    assert(r._3.head == -128.toByte && r._3.last == 127.toByte)
    assert(r._3(1) == (math.round((0.0 + 2.0) * 255.0 / 5.0) - 128).toByte)
  }

  test("sq8 roundtrip error bounded by span / 510 per coordinate") {
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 50).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextDouble() * 4 - 2)))
    val rows = enc(vecs: _*)
      .select($"emb", $"qmax" - $"qmin",
        Quantize.sq8Decode($"qcode", $"qmin", $"qmax"))
      .as[(Seq[Double], Double, Seq[Double])].collect()
    for ((emb, span, rec) <- rows; (x, xh) <- emb.zip(rec))
      assert(math.abs(x - xh) <= span / 510.0 + 1e-12,
        s"$x vs $xh (span $span)")
  }

  test("sq8: zero-span vector decodes exactly") {
    val r = enc((1L, Seq(0.7, 0.7, 0.7)))
      .select(Quantize.sq8Decode($"qcode", $"qmin", $"qmax"))
      .as[Seq[Double]].head()
    assert(r == Seq(0.7, 0.7, 0.7))
  }

  test("sq8: encode is deterministic and per-row (no shuffle in plan)") {
    val df = enc((1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 4.0)))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(df.collect().toSeq == df.collect().toSeq)
  }
}
