package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen'd
  * expression — the canonicalization step a multilingual corpus
  * pipeline needs before hashing/dedup (the same text arrives both
  * precomposed and decomposed from real crawls; without NFC they hash
  * apart and every downstream dedup/fingerprint silently misses the
  * pair). Spark has no built-in normalizer; a native expression keeps
  * the scan whole-stage-codegen'd where a UDF would break it.
  *
  * java.text.Normalizer implements Unicode Standard Annex #15 —
  * normalization is fully specified by the standard, so any compliant
  * engine (DuckDB's nfc_normalize, ICU) produces identical bytes.
  */
case class UnicodeNorm(child: Expression, form: Normalizer.Form)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_unicode_norm requires a string input, got $t")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    UnicodeNorm.norm(s.asInstanceOf[UTF8String], form.ordinal())

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ord = form.ordinal()
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.UnicodeNorm.norm($c, $ord);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNorm = copy(child = newChild)

  override def prettyName: String = "graft_unicode_norm"
}

object UnicodeNorm {
  private val forms = Normalizer.Form.values()

  /** Shared by interpreted eval and codegen. Already-normalized text
    * (the overwhelming common case — ASCII and most crawled UTF-8 is
    * NFC) short-circuits on the quick check without allocating.
    */
  def norm(s: UTF8String, formOrdinal: Int): UTF8String = {
    val form = forms(formOrdinal)
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  /** Column-level entry point; requires GraftExtensions. */
  def apply(c: Column, form: String): Column =
    org.apache.spark.sql.functions.call_function("graft_unicode_norm",
      c, org.apache.spark.sql.functions.lit(form))

  /** Registry builder: second argument must be a literal form name. */
  def fromArgs(exprs: Seq[Expression]): UnicodeNorm = {
    require(exprs.length == 2, "graft_unicode_norm(text, 'NFC')")
    val form = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
        try Normalizer.Form.valueOf(v.toString.toUpperCase)
        catch {
          case _: IllegalArgumentException =>
            throw new IllegalArgumentException(
              s"graft_unicode_norm: unknown form '$v' (NFC|NFD|NFKC|NFKD)")
        }
      case o => throw new IllegalArgumentException(
        s"graft_unicode_norm: form must be a string literal, got $o")
    }
    UnicodeNorm(exprs.head, form)
  }
}
