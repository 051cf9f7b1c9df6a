package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

object InterleaveBits {
  /** Raised (interpreted and codegen paths) when an operand falls
    * outside [0, 2^bits): silently masking high bits would map distant
    * keys onto nearby z-values — locality corruption with no signal.
    */
  def rangeError(v: Long, bits: Int): RuntimeException =
    new IllegalArgumentException(
      s"graft_zorder2: value $v outside [0, 2^$bits); widen `bits` " +
        "(up to 31 per dimension) instead of truncating")
}

/** z-order (Morton) key of two long columns: bit i of `left` lands at
  * z-bit 2i, bit i of `right` at 2i+1, for the low `bits` bits of each
  * (operands outside [0, 2^bits) fail the task — see
  * [[InterleaveBits.rangeError]]). Interleaving makes one-dimensional
  * z-ranges cover small 2-D rectangles of the key space, so range-
  * partitioning + sorting by the z-key clusters rows that are close in
  * EITHER dimension into the same files — parquet min/max footer stats
  * then skip most files for a predicate on any single dimension (the
  * Delta/Iceberg OPTIMIZE ZORDER layout). Row-local, codegen'd: the
  * z-key scan adds no shuffle of its own.
  */
case class InterleaveBits(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder2 expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    val lim = 1L << bits
    if (x < 0 || x >= lim) throw InterleaveBits.rangeError(x, bits)
    if (y < 0 || y >= lim) throw InterleaveBits.rangeError(y, bits)
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z"); val i = ctx.freshName("i")
      val lim = ctx.freshName("lim")
      s"""
        long $lim = 1L << $bits;
        if ($a < 0 || $a >= $lim) {
          throw graft.functions.InterleaveBits.rangeError($a, $bits);
        }
        if ($b < 0 || $b >= $lim) {
          throw graft.functions.InterleaveBits.rangeError($b, $bits);
        }
        long $z = 0L;
        for (int $i = 0; $i < $bits; $i++) {
          $z |= (($a >> $i) & 1L) << (2 * $i);
          $z |= (($b >> $i) & 1L) << (2 * $i + 1);
        }
        ${ev.value} = $z;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): InterleaveBits =
    copy(left = l, right = r)
}
