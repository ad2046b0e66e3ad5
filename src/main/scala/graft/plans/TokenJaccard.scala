package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaccard similarity of two string
  * arrays treated as SETS — |A∩B| / |A∪B| in one hash-set pass,
  * replacing the `array_distinct`+`array_intersect`+`array_union`+
  * `size` chain (each of which builds intermediate arrays per row).
  * Inputs need not be pre-distinct. Result only depends on set
  * cardinalities (int/int division) so it is deterministic and
  * engine-portable by construction.
  */
case class TokenJaccard(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"token_jaccard requires array<string> inputs, got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    TokenJaccard.compute(x, y)
  }

  // Single hot helper shared by interpreted eval and codegen.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.TokenJaccard.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenJaccard =
    copy(left = newLeft, right = newRight)
}

object TokenJaccard {
  def compute(x: ArrayData, y: ArrayData): Double = {
    val sa = new java.util.HashSet[UTF8String]()
    var i = 0
    val nx = x.numElements()
    while (i < nx) { if (!x.isNullAt(i)) sa.add(x.getUTF8String(i)); i += 1 }
    var inter = 0
    val seenB = new java.util.HashSet[UTF8String]()
    var j = 0
    val ny = y.numElements()
    while (j < ny) {
      if (!y.isNullAt(j)) {
        val v = y.getUTF8String(j)
        if (seenB.add(v) && sa.contains(v)) inter += 1
      }
      j += 1
    }
    val union = sa.size + seenB.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Column-level entry point; requires GraftExtensions. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_token_jaccard", a, b)
}
