package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature over a document's distinct 3-word shingles:
  * `graft_minhash_sig(text)` → struct(sh array<string>, m array<long>)
  * where `sh` is the distinct shingle set (first-occurrence order) and
  * `m(j) = min over shingles of ((id28 · a_j + b_j) mod P)` with
  * id28 = first 7 md5 hex chars of the shingle — value-identical to
  * the declarative shingleRows → hash28 → 16 min-aggregates shape
  * (same tokenizer split("\\s+", -1), same md5 prefix, same
  * [[graft.ext.TextOps.hashA]]/hashB/MinhashPrime constants;
  * parity-tested in TextOpsSpec). NULL when the document has fewer
  * than 3 words — the declarative form drops such docs at the explode,
  * so callers filter `isNotNull` to reproduce the frame exactly.
  *
  * Why native: the declarative signature aggregate shuffles ONE ROW
  * PER (doc, shingle) — the corpus's full token volume — through a
  * 17-column aggregate. This is a per-row O(tokens · numHashes) loop
  * (md5 per distinct shingle) with ZERO shuffle: the MinHash signature
  * step of the near-dup pipeline becomes a pure map projection, the
  * same argument as [[SimHash60]] and [[CharEntropy]].
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_sig expects string, got ${t.simpleString}")
    }

  override def dataType: DataType = MinHashSig.schema

  // null for < 3 words, independent of child nullability
  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(s: Any): Any =
    MinHashSig.compute(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSig.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  val K = graft.ext.TextOps.ShingleK
  val NumHashes = graft.ext.TextOps.NumHashes
  val Prime = graft.ext.TextOps.MinhashPrime
  private val A = graft.ext.TextOps.hashA.toArray
  private val B = graft.ext.TextOps.hashB.toArray

  val schema: StructType = StructType(Seq(
    StructField("sh", ArrayType(StringType, containsNull = false)),
    StructField("m", ArrayType(LongType, containsNull = false))))

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 7 hex chars of md5(s) as a base-16 number — identical to
    * `conv(substring(md5(s), 1, 7), 16, 10)` ([[graft.ext.TextOps.hash28]]):
    * bytes 0–2 big-endian shifted left 4, plus byte 3's high nibble. */
  def hash28(s: String): Long = {
    val md = md5.get()
    md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    digest28(md)
  }

  private def digest28(md: java.security.MessageDigest): Long = {
    val d = md.digest() // resets the digest for the next shingle
    val v = ((d(0) & 0xFFL) << 16) | ((d(1) & 0xFFL) << 8) | (d(2) & 0xFFL)
    (v << 4) | ((d(3) & 0xFF) >>> 4)
  }

  /** The distinct-shingle arm of [[compute]], shared with the
    * shingle-set-only [[ShingleSet]] expression: distinct K-word
    * shingles of the UTF-8 buffer in first-occurrence order, or null
    * when the text has fewer than K tokens (callers map null to the
    * same "no shingles" frame the declarative explode produces).
    * Tokens are [[SimHash60.tokenRanges]] byte runs; each shingle's
    * bytes are materialized once, slices joined by ' '. */
  def shingleSet(s: UTF8String): java.util.LinkedHashSet[UTF8String] = {
    val bytes = s.getBytes
    val (starts, ends, ntok) = SimHash60.tokenRanges(bytes)
    if (ntok < K) return null
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var t = 0
    while (t <= ntok - K) {
      var len = K - 1
      var j = 0
      while (j < K) { len += ends(t + j) - starts(t + j); j += 1 }
      val g = new Array[Byte](len)
      var p = 0
      j = 0
      while (j < K) {
        if (j > 0) { g(p) = ' '; p += 1 }
        val l = ends(t + j) - starts(t + j)
        System.arraycopy(bytes, starts(t + j), g, p, l)
        p += l
        j += 1
      }
      seen.add(UTF8String.fromBytes(g))
      t += 1
    }
    seen
  }

  /** Byte-level form (round 10, same argument as [[SimHash60.compute]]):
    * tokens are maximal non-whitespace BYTE runs of the UTF-8 buffer
    * ([[SimHash60.tokenRanges]] — the shared single copy of the
    * `split("\\s+", -1)` empty-token semantics); each shingle's bytes
    * are materialized ONCE — token slices joined by ' ' — and shared
    * by the md5 id, the distinct set (UTF8String hashes its bytes),
    * and the output array, replacing the old decode → regex split →
    * StringBuilder → String-set → re-encode → fromString chain that
    * paid two codec passes per shingle. Input contract: well-formed
    * UTF-8 (see [[SimHash60.tokenRanges]]). */
  def compute(s: UTF8String): InternalRow = {
    val seen = shingleSet(s)
    if (seen == null) return null
    val md = md5.get()
    val mins = new Array[Long](NumHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val sh = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var c = 0
    while (it.hasNext) {
      val g = it.next()
      sh(c) = g
      md.update(g.getBytes)
      val id = digest28(md)
      var j = 0
      while (j < NumHashes) {
        val v = (id * A(j) + B(j)) % Prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      c += 1
    }
    InternalRow(new GenericArrayData(sh), new GenericArrayData(mins))
  }
}
