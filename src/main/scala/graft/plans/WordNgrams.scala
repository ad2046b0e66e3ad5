package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram strings from a token array in one pass:
  * out[i] = concat_ws(" ", toks[i..i+n-1]) for i in 0..len-n. The HOF
  * form (`transform(sequence(0, size-n), i => concat_ws(" ",
  * slice(toks, i+1, n)))`) walks an index array through an
  * interpreted lambda, materializing a slice array per element — on
  * the shingle scan that feeds every dedup/decontamination pipeline
  * this is the dominant per-row cost. Output strings are
  * byte-identical (UTF8String.concatWs is the same kernel concat_ws
  * compiles to, including its skip-null semantics), so downstream
  * hashes, oracle mirrors and frozen probe constants are unaffected.
  *
  * Callers keep the short-text fallback (`when(size(toks) < n,
  * array(trimmed))`) engine-side; this expression only covers the
  * len >= n branch (it returns an empty array when len < n).
  */
case class WordNgrams(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1, s"WordNgrams: n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_word_ngrams requires array<string>, got $t")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_word_ngrams"

  private val sep = UTF8String.fromString(" ")

  /** Tight loop shared by eval and codegen. */
  def ngrams(toks: ArrayData): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    // concatWs copies bytes and does not retain its inputs — one
    // buffer serves every window (no per-shingle allocation)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) {
        parts(j) = if (toks.isNullAt(i + j)) null
          else toks.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    ngrams(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordNgrams", this,
      classOf[WordNgrams].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.ngrams($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {

  def fromArgs(exprs: Seq[Expression]): WordNgrams = {
    require(exprs.length == 2,
      "graft_word_ngrams expects (tokens, n)")
    require(exprs(1).foldable && exprs(1).dataType == IntegerType,
      "graft_word_ngrams: n must be an int literal")
    WordNgrams(exprs.head,
      exprs(1).eval(null).asInstanceOf[Int])
  }

  /** Column-level entry point; requires the session to be built with
    * `spark.sql.extensions=graft.plans.GraftExtensions`.
    */
  def apply(toks: Column, n: Int): Column =
    F.call_function("graft_word_ngrams", toks, F.lit(n))
}
