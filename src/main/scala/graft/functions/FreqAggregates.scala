package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch over a string column — the
  * frequency member of the engine's mergeable-sketch family
  * (HLL distinct, bitmap distinct, GK percentiles): top items by
  * count in ONE pass with at most `k` counters of state per
  * (partition, group), where an exact `groupBy(item).count` shuffles
  * the full item cardinality. This is the guardrail aggregate for
  * "what dominates this stream" questions (hot keys, top event
  * types, top domains) at cardinalities where the exact road is the
  * skew it is trying to diagnose.
  *
  * Classic MG update (Misra & Gries 1982): a hit increments, a miss
  * inserts while there is room, and a miss against a full summary
  * decrements EVERY counter (dropping zeros) — charging one
  * occurrence of each tracked item against the missed one. Merge is
  * the mergeable-summaries form (Agarwal et al., PODS'12): pointwise
  * add, then if more than `k` counters survive, subtract the
  * (k+1)-th largest count from all and drop the non-positive. Both
  * preserve the deterministic guarantee: estimates never exceed true
  * counts, undercount by at most n/(k+1) (n = rows aggregated), and
  * any item with true count > n/(k+1) is present in the summary.
  *
  * Determinism contract: when the item cardinality is ≤ k no
  * decrement ever fires and the sketch IS the exact count map —
  * order-independent, oracle-checkable (the `topk_heavy_hitters`
  * query runs in this regime). Past k, which of the light items
  * survive depends on encounter order (the bound above is the only
  * guarantee) — the same caveat every MG deployment carries, spec'd
  * rather than hidden.
  *
  * Same execution surface as [[VecSumMicro]]: TypedImperativeAggregate
  * rides ObjectHashAggregate with partial/final modes, so the shuffle
  * carries ≤ k (string, long) pairs per (partition, group), never the
  * stream.
  */
case class FreqSketch(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with UnaryLike[Expression] {

  require(k >= 1, s"graft_freq_sketch needs k >= 1 counters, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_freq_sketch expects a string column, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buffer: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val item = v.asInstanceOf[UTF8String].toString
      buffer.get(item) match {
        case Some(c) => buffer.update(item, c + 1)
        case None if buffer.size < k => buffer.update(item, 1L)
        case None =>
          // decrement-all: one occurrence of every tracked item pays
          // for the missed one (keys snapshot — we mutate underneath)
          buffer.keys.toArray.foreach { key =>
            val c = buffer(key) - 1
            if (c <= 0L) buffer.remove(key) else buffer.update(key, c)
          }
      }
      buffer
    }
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (item, c) =>
      b1.update(item, b1.getOrElse(item, 0L) + c)
    }
    if (b1.size > k) {
      // (k+1)-th largest count — everything at or below it cannot be
      // a guaranteed heavy hitter of the merged stream
      val cut = b1.values.toArray.sorted(Ordering.Long.reverse).apply(k)
      b1.keys.toArray.foreach { key =>
        val c = b1(key) - cut
        if (c <= 0L) b1.remove(key) else b1.update(key, c)
      }
    }
    b1
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    // sorted keys: a deterministic map layout for identical summaries
    val entries = buffer.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1): Any)),
      new GenericArrayData(entries.map(e => e._2: Any)))
  }

  // length-prefixed UTF-8, not writeUTF: writeUTF caps items at 64 KB
  // of modified-UTF-8 and would kill the partial-sketch shuffle on a
  // pathological key (this is a general string aggregate)
  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (item, c) =>
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      m.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketch =
    copy(child = newChild)
  override def prettyName: String = "graft_freq_sketch"
}
