package graft.plans

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}

/** Native Catalyst expression: dot product of two float-vector columns
  * accumulated in double, folding left-to-right — semantically
  * identical (bit-for-bit) to
  * `aggregate(zip_with(a, b, (x,y) => double(x)*double(y)), 0.0, +)`
  * but with real whole-stage codegen: higher-order functions run
  * interpreted closures per element, this emits one tight JVM loop.
  * The hot path of brute-force ANN (Similarity) at 100 TB.
  */
case class FloatVecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_fvec_dot requires array<float> inputs, got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {
  /** Column-level entry point; requires the session to be built with
    * `spark.sql.extensions=graft.plans.GraftExtensions`.
    */
  def apply(a: Column, b: Column): Column =
    F.call_function("graft_fvec_dot", a, b)
}

/** Engine extensions registered through the public
  * `SparkSessionExtensions` mechanism
  * (`.config("spark.sql.extensions", "graft.plans.GraftExtensions")`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_fvec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "graft_fvec_dot"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_token_jaccard"),
      new ExpressionInfo(classOf[TokenJaccard].getName, "graft_token_jaccard"),
      (exprs: Seq[Expression]) => TokenJaccard(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_centroid_argmax"),
      new ExpressionInfo(classOf[CentroidArgmax].getName,
        "graft_centroid_argmax"),
      (exprs: Seq[Expression]) => CentroidArgmax.fromArgs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKPairs].getName, "graft_topk"),
      (exprs: Seq[Expression]) => TopKPairs.fromArgs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_plane_sigs"),
      new ExpressionInfo(classOf[PlaneSigs].getName, "graft_plane_sigs"),
      (exprs: Seq[Expression]) => PlaneSigs.fromArgs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_affine_minhash"),
      new ExpressionInfo(classOf[AffineMinHash].getName,
        "graft_affine_minhash"),
      (exprs: Seq[Expression]) => AffineMinHash.fromArgs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "graft_word_ngrams"),
      (exprs: Seq[Expression]) => WordNgrams.fromArgs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_freq_sketch"),
      new ExpressionInfo(classOf[FreqSketch].getName, "graft_freq_sketch"),
      (exprs: Seq[Expression]) => FreqSketch.fromArgs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_unicode_norm"),
      new ExpressionInfo(classOf[UnicodeNorm].getName, "graft_unicode_norm"),
      (exprs: Seq[Expression]) => UnicodeNorm.fromArgs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_earliest_k"),
      new ExpressionInfo(classOf[EarliestK].getName, "graft_earliest_k"),
      (exprs: Seq[Expression]) => EarliestK.fromArgs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_hll_regs"),
      new ExpressionInfo(classOf[HllRegs].getName, "graft_hll_regs"),
      (exprs: Seq[Expression]) => HllRegs.fromArgs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_hll_regs_state"),
      new ExpressionInfo(classOf[HllRegsState].getName,
        "graft_hll_regs_state"),
      (exprs: Seq[Expression]) => HllRegs.stateFromArgs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_hll_regs_union"),
      new ExpressionInfo(classOf[HllRegsUnion].getName,
        "graft_hll_regs_union"),
      (exprs: Seq[Expression]) => HllRegs.unionFromArgs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_hll_est"),
      new ExpressionInfo(classOf[HllEstimate].getName, "graft_hll_est"),
      (exprs: Seq[Expression]) => HllRegs.estFromArgs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_top_row"),
      new ExpressionInfo(classOf[TopRow].getName, "graft_top_row"),
      (exprs: Seq[Expression]) => TopRow.fromArgs(exprs)))
  }
}
