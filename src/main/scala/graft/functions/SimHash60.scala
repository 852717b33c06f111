package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 60-bit SimHash (Charikar 2002) over a document's
  * whitespace tokens: `graft_simhash(text)` — the frequency-weighted
  * per-bit token vote, bit b set iff Σ_tokens (±1 by bit b of the
  * token's 60-bit md5 hash) > 0.
  *
  * Bit-for-bit identical to the declarative formulation
  * (`explode(split(text,'\\s+'))` → `hash60` → 60 conditional sums →
  * bit reassembly; parity-tested in NativeAggSpec): tokens come from
  * Java `split("\\s+", -1)` (the same Pattern semantics as Spark's
  * `split`, keeping leading/trailing empty tokens), and the per-token
  * hash is the first 15 hex chars of md5 read base-16 — bytes 0–6
  * big-endian shifted left 4, plus byte 7's high nibble.
  *
  * Why native: the declarative shape shuffles ONE ROW PER TOKEN
  * through a 60-column aggregate (at 100 TB that is ~10^13 shuffle
  * rows even with map-side combine); this is a per-row
  * O(tokens · (md5 + 60)) loop inside whole-stage codegen with ZERO
  * shuffle — the signature step of a near-dup pipeline becomes a pure
  * map projection. Same argument as [[CharEntropy]]/[[ByteHistogram]].
  * Null in → null out (the declarative form instead drops the row at
  * the explode; callers treat null text as "no signature" either way).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash expects string, got ${t.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(s: Any): Any =
    SimHash60.compute(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {

  val Bits = 60

  // MessageDigest is stateful and not thread-safe; one per executor
  // thread, reset per token by digest()
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex chars of md5(token) as a base-16 number — identical
    * to `conv(substring(md5(s), 1, 15), 16, 10)` ([[graft.ext.TextOps.hash60]]). */
  def hash60(token: String): Long = {
    val md = md5.get()
    md.update(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    digest60(md)
  }

  private def digest60(md: java.security.MessageDigest): Long = {
    val d = md.digest() // resets the digest for the next token
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) & 0xFF) >>> 4)
  }

  /** `\s` without UNICODE_CHARACTER_CLASS is exactly the six ASCII
    * separators — and ASCII bytes never occur inside a multi-byte
    * UTF-8 sequence, so tokenizing on raw UTF-8 bytes is equivalent
    * to tokenizing the decoded string. Shared with [[MinHashSig]]. */
  private[functions] def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Token byte ranges reproducing `split("\\s+", -1)` — the ONE copy
    * of the subtle empty-token semantics both signature expressions
    * share: a leading separator yields one empty token, a trailing one
    * yields one empty token, interior runs collapse, and the empty
    * string is a single empty token. Returns (starts, ends, count);
    * the arrays may be longer than count.
    *
    * Input contract (also the bit-identity contract of the byte-level
    * hashing): `bytes` is WELL-FORMED UTF-8, which parquet/Spark
    * string columns guarantee. On malformed bytes (a binary column
    * cast around validation) the old decode path would have replaced
    * invalid sequences with U+FFFD before hashing; the byte path
    * hashes them as-is. */
  private[functions] def tokenRanges(bytes: Array[Byte]): (Array[Int], Array[Int], Int) = {
    val n = bytes.length
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var ntok = 0
    def addTok(a: Int, b: Int): Unit = {
      if (ntok == starts.length) {
        starts = java.util.Arrays.copyOf(starts, ntok * 2)
        ends = java.util.Arrays.copyOf(ends, ntok * 2)
      }
      starts(ntok) = a; ends(ntok) = b; ntok += 1
    }
    if (n == 0) addTok(0, 0)
    else {
      if (isWs(bytes(0))) addTok(0, 0)
      var i = 0
      while (i < n) {
        while (i < n && isWs(bytes(i))) i += 1
        if (i < n) {
          val st = i
          while (i < n && !isWs(bytes(i))) i += 1
          addTok(st, i)
        }
      }
      if (isWs(bytes(n - 1))) addTok(n, n)
    }
    (starts, ends, ntok)
  }

  /** The byte-level twin of `text.split("\\s+", -1)` + [[hash60]] per
    * token + per-bit vote: tokens are maximal runs of non-whitespace
    * BYTES ([[tokenRanges]]) fed to md5 as slices of the UTF-8
    * buffer — the same bytes the old path re-encoded per token through
    * decode(toString) → regex split → String alloc → getBytes, which
    * profiling showed was the streaming near-dup throughput ceiling
    * (SCALE.md round 10: the projection arm, not the state store).
    * Split-semantics parity is spec-pinned on adversarial fixtures;
    * input contract: well-formed UTF-8 (see [[tokenRanges]]). */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val (starts, ends, ntok) = tokenRanges(bytes)
    val votes = new Array[Int](Bits)
    val md = md5.get()
    var t = 0
    while (t < ntok) {
      md.update(bytes, starts(t), ends(t) - starts(t))
      val h = digest60(md)
      var b = 0
      while (b < Bits) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
