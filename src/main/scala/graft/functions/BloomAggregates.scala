package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** Shared bit math for the Bloom pair — ONE definition of the probe
  * positions, used by the aggregate's update, the scalar probe's
  * interpreted eval, AND its generated code (a second copy is how the
  * build and probe sides silently diverge).
  *
  * Kirsch–Mitzenmacher double hashing (2006): k probe positions from
  * two 64-bit values, g_i = h1 + i·h2 — retains the asymptotic
  * false-positive rate of k independent hashes. h1 is the input
  * (already a 64-bit hash — callers pass `xxhash64(key)`), h2 a
  * finalizer-mixed copy forced odd so it is a unit modulo the
  * power-of-two bit count.
  *
  * Sketch layout (BinaryType): [numHashes: int32 BE][words: int64 BE ×
  * numBits/64]. The header makes the sketch self-describing: the probe
  * needs no out-of-band parameters, so a persisted sketch from an
  * earlier batch probes correctly even if the operator's defaults
  * changed since.
  */
object BloomUtil {
  def mix(x: Long): Long = {
    var h = x
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  def set(words: Array[Long], numHashes: Int, x: Long): Unit = {
    val numBits = words.length.toLong * 64L
    val h2 = mix(x) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Math.floorMod(x + i * h2, numBits)
      words((pos >>> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  def serialize(words: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * words.length)
    bb.putInt(numHashes)
    words.foreach(bb.putLong)
    bb.array()
  }

  def deserializeWords(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes, 4, bytes.length - 4)
    Array.fill((bytes.length - 4) / 8)(bb.getLong)
  }

  /** Membership probe against a serialized sketch. Referenced from
    * generated code — keep the signature stable.
    */
  def contains(bytes: Array[Byte], x: Long): Boolean = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val numHashes = bb.getInt
    val numWords = (bytes.length - 4) / 8
    val numBits = numWords.toLong * 64L
    val h2 = mix(x) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Math.floorMod(x + i * h2, numBits)
      val word = bb.getLong(4 + 8 * (pos >>> 6).toInt)
      if ((word & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Mergeable Bloom membership sketch over a 64-bit hash column — the
  * MEMBERSHIP member of the engine's mergeable-sketch family (HLL
  * distinct, bitmap distinct, Misra-Gries frequency, GK rank): "might
  * key X be in this set?" with NO false negatives and a tunable
  * false-positive rate, in `numBits/8` bytes of state per (partition,
  * group) where the exact answer costs a shuffled anti-join of the
  * full key set.
  *
  * This is the aggregate behind the bloom-prefilter pattern
  * ([[graft.operators.Dedup.dedupBloomProbe]]): build once over the
  * base corpus (one partial-agg pass — partials are bitsets, merge is
  * bitwise OR, so the shuffle carries numBits/8 bytes per partition,
  * never keys), broadcast the KB-scale sketch, and screen a delta
  * row-locally; only bloom-positives pay the exact join. Same
  * execution surface as [[FreqSketch]]/[[VecSumMicro]]:
  * TypedImperativeAggregate on ObjectHashAggregate with partial/final
  * modes.
  *
  * `numBits` must be a power of two (floorMod on a power of two is
  * the cheap mask in spirit; the requirement keeps every engine's
  * position arithmetic identical) and `numHashes` in [1, 16]. With m
  * bits, k hashes, n inserted keys the classic FP bound is
  * (1 − e^(−kn/m))^k — the operator's spec measures it.
  */
case class BloomSketch(child: Expression, numBits: Int, numHashes: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"graft_bloom needs a power-of-two numBits >= 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"graft_bloom needs numHashes in [1,16], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom expects a bigint (hash) column, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.set(buffer, numHashes, v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any =
    BloomUtil.serialize(buffer, numHashes)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    BloomUtil.serialize(buffer, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomUtil.deserializeWords(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomSketch =
    copy(child = newChild)
  override def prettyName: String = "graft_bloom"
}

/** Row-local membership probe of a [[BloomSketch]] binary against a
  * 64-bit hash — codegen'd (a static call into [[BloomUtil]], so the
  * probe stays inside the whole-stage span; the sketch column is a
  * broadcast-constant reference, evaluated per row only as a pointer).
  * False positives possible by construction, false negatives never —
  * the contract the prefilter pattern rests on.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects (binary, bigint), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(bloom: Any, x: Any): Any =
    BloomUtil.contains(bloom.asInstanceOf[Array[Byte]], x.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bloom, x) =>
      s"${ev.value} = graft.functions.BloomUtil.contains($bloom, $x);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
