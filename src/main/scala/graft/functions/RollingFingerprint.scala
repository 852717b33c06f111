package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd rolling document fingerprint:
  * h := (h * 31 + codepoint) mod 1e9+7 over the string's code points,
  * h0 = 0 (empty string → 0).
  *
  * Replaces the `transform(split(text,"")) + aggregate` higher-order
  * composition on the q32 hot path: HOFs are interpreted and build a
  * per-row array of single-char strings before folding (per-element
  * boxing + allocation); this is one primitive-long loop over the
  * decoded code points inside whole-stage codegen. The HOF form is
  * kept ([[graft.ext.TextOps.rollingFingerprintHof]]) and parity-tested.
  *
  * Semantics match the DuckDB oracle exactly (ascii(substr(text,i,1))
  * yields the i-th CODE POINT): supplementary-plane characters hash as
  * one code point — the old split("")-based form split them into
  * surrogate halves, an undocumented divergence this expression fixes.
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  private val Mult = 31L
  private val Mod = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_fingerprint expects string, got ${dt.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * Mult + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $str = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $str.length()) {
         |  int $cp = $str.codePointAt($i);
         |  $h = ($h * ${Mult}L + $cp) % ${Mod}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}
