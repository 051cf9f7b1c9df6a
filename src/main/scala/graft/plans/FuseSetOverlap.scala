package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, ArrayUnion, Cast, Expression, GetStructField, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}
import graft.functions.SetOverlap

/** Optimizer fusion: `size(array_intersect(a, b))` and
  * `size(array_union(a, b))` over the SAME pair in the same operator
  * each build their own hash sets per row — the classic Jaccard shape
  * (`floor(1000 * |A∩B| / |A∪B|)`) pays the set construction twice.
  * When BOTH appear, rewrite each to a field of ONE
  * [[graft.functions.SetOverlap]] kernel call; whole-stage codegen's
  * subexpression elimination then collapses the two semantically-equal
  * kernels into a single sorted-merge pass per row. Count semantics
  * are bit-identical to the builtins (SetOverlap's parity spec: same
  * distinct-set counts, same null-element convention, null-in →
  * null-out either road).
  *
  * Guards: fires only for the kernel's element types (array<long> /
  * array<string>), only under non-legacy `size(null)` semantics
  * (legacy -1 would need its own wrapper), and never for a LONE
  * intersect or union (no second set build to save; the builtin is
  * fine alone).
  *
  * Injected via `injectOptimizerRule` — plain `spark.sql` / DataFrame
  * user code gets the fused road without knowing the kernel exists.
  * The library's own operators call the kernel directly; this rule is
  * for the code users bring.
  */
object FuseSetOverlap extends Rule[LogicalPlan] {

  private def supported(a: Expression, b: Expression): Boolean =
    (a.dataType, b.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _)) =>
        lt == rt && (lt == LongType || lt == StringType)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case node =>
      val inters = scala.collection.mutable.ArrayBuffer.empty[(Expression, Expression)]
      val unions = scala.collection.mutable.ArrayBuffer.empty[(Expression, Expression)]
      node.expressions.foreach(_.foreach {
        case Size(ArrayIntersect(a, b), false) if supported(a, b) => inters += ((a, b))
        case Size(ArrayUnion(a, b), false)     if supported(a, b) => unions += ((a, b))
        case _ => ()
      })
      def paired(ps: Seq[(Expression, Expression)], a: Expression, b: Expression): Boolean =
        ps.exists { case (x, y) => x.semanticEquals(a) && y.semanticEquals(b) }
      if (inters.isEmpty || unions.isEmpty) node
      else node.transformExpressions {
        case Size(ArrayIntersect(a, b), false)
            if supported(a, b) && paired(unions.toSeq, a, b) =>
          Cast(GetStructField(SetOverlap(a, b), 0, Some("inter")), IntegerType)
        case Size(ArrayUnion(a, b), false)
            if supported(a, b) && paired(inters.toSeq, a, b) =>
          Cast(GetStructField(SetOverlap(a, b), 1, Some("uni")), IntegerType)
      }
  }
}
