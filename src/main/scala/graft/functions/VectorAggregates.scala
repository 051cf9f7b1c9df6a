package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise vector-sum AGGREGATE over an `array<float>` column,
  * in exact micro-units: each component contributes
  * `floor(1e6 · x)` (float→double widening is exact, the scaled
  * floor is the same integer in every engine), and the per-group
  * state is one `long[dim]` — so partial aggregation applies and the
  * shuffle carries ONE fixed-width state per (partition, group)
  * instead of every vector. This is the centroid/density primitive
  * (k-means update step, SemDeDup cluster representatives) that
  * neither built-in aggregates (no element-wise array sum) nor the
  * explode + groupBy(pos) road (shuffles n·dim rows) provide at
  * scale.
  *
  * Integral micro-sums, not float sums, for the same reason as
  * [[graft.operators.GraphOps.pageRank]]: float addition commutes
  * but does not associate, so a float centroid is a function of
  * partition order and can never hash-match an oracle; long sums
  * are exact at any order. 1e6 · |x| ≤ ~2^43 per element leaves
  * 2^20 headroom of group size before overflow at |x| ≤ 1 — and
  * ~2^43-scale groups are re-bucketed long before that.
  *
  * The buffer dimension locks to the first vector seen; a
  * mixed-width column fails loudly (a silent truncation would skew
  * every centroid), as do null and non-finite elements (which would
  * otherwise contribute 0 or a saturated long).
  *
  * Extends the engine's custom-Catalyst surface from scalar
  * expressions ([[CosineSim]], [[MinHashSig]], …) to an
  * [[TypedImperativeAggregate]]: no codegen (imperative aggregates
  * evaluate via the ObjectHashAggregate path), but partial/final
  * modes, serialization for the exchange, and declarative use from
  * SQL (`graft_vec_sum_micro(embedding)`) all compose exactly like
  * the built-ins.
  */
case class VecSumMicro(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_sum_micro expects array<float>, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val buf =
        if (buffer.isEmpty) new Array[Long](n)
        else {
          require(buffer.length == n,
            s"graft_vec_sum_micro: vector dim $n != group dim ${buffer.length}")
          buffer
        }
      var i = 0
      while (i < n) {
        // Same fail-loudly contract as the dim lock: a null element
        // would read as 0.0f through ArrayData, and floor(NaN).toLong
        // is 0 / floor(±Inf).toLong saturates — each silently skews
        // the centroid instead of surfacing the bad vector.
        require(!arr.isNullAt(i),
          s"graft_vec_sum_micro: null element at position $i of a $n-dim vector")
        val x = arr.getFloat(i)
        require(java.lang.Float.isFinite(x),
          s"graft_vec_sum_micro: non-finite element $x at position $i")
        buf(i) += math.floor(1e6 * x).toLong
        i += 1
      }
      buf
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      require(b1.length == b2.length,
        s"graft_vec_sum_micro: merging dims ${b1.length} != ${b2.length}")
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumMicro =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumMicro =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumMicro =
    copy(child = newChild)
  override def prettyName: String = "graft_vec_sum_micro"
}
