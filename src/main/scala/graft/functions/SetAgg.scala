package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Capped distinct-set aggregation for blocking-key construction.
  *
  * `cappedDocSet(doc_id, cap)` collects the DISTINCT BIGINT values of a
  * group up to `cap` of them; one value more and the group degenerates
  * to an O(1) overflow marker (result NULL). This is the bounded-state
  * twin of `collect_set` for the rare-key blocking pattern
  * (q18_containment): the query only wants keys whose document
  * frequency sits in a small band, so groups past the band must cost
  * O(cap) memory — never O(df). With plain `collect_set` a stop-shingle
  * at corpus scale would buffer millions of doc ids in one aggregation
  * state before the filter discards them; here it holds `cap` longs and
  * short-circuits every later row. Partial aggregation stays enabled
  * (map-side combine merges capped sets, overflow is absorbing), so the
  * shuffle carries at most `cap` longs per (partition, key).
  *
  * The result array is SORTED — group output is independent of row
  * order and partitioning, keeping downstream plans bit-deterministic.
  */
object SetAgg {

  /** Aggregation state: up to `cap` distinct longs, or overflow (n = -1).
    * Linear-scan dedup — n ≤ cap ≤ ~100, and overflowed groups are O(1)
    * per subsequent row. */
  final class CappedSetBuf(val cap: Int) {
    var n: Int = 0
    val a: Array[Long] = new Array[Long](cap)
    def add(v: Long): Unit = {
      if (n < 0) return
      var i = 0
      while (i < n) { if (a(i) == v) return; i += 1 }
      if (n == cap) n = -1 else { a(n) = v; n += 1 }
    }
  }

  case class CappedDistinctLongs(
      child: Expression,
      cap: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedSetBuf] with UnaryLike[Expression] {

    require(cap > 0, "cappedDocSet cap must be positive")

    override def prettyName: String = "capped_doc_set"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true

    override def createAggregationBuffer(): CappedSetBuf = new CappedSetBuf(cap)

    override def update(buf: CappedSetBuf, input: InternalRow): CappedSetBuf = {
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[Long])
      buf
    }

    override def merge(b1: CappedSetBuf, b2: CappedSetBuf): CappedSetBuf = {
      if (b2.n < 0) b1.n = -1
      else if (b1.n >= 0) {
        var i = 0
        while (i < b2.n && b1.n >= 0) { b1.add(b2.a(i)); i += 1 }
      }
      b1
    }

    override def eval(buf: CappedSetBuf): Any =
      if (buf.n < 0) null
      else {
        val out = java.util.Arrays.copyOf(buf.a, buf.n)
        java.util.Arrays.sort(out)
        new GenericArrayData(out)
      }

    override def serialize(buf: CappedSetBuf): Array[Byte] = {
      val n = math.max(buf.n, 0)
      val bb = ByteBuffer.allocate(4 + 8 * n)
      bb.putInt(buf.n)
      var i = 0
      while (i < n) { bb.putLong(buf.a(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): CappedSetBuf = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new CappedSetBuf(cap)
      val n = bb.getInt
      if (n < 0) buf.n = -1
      else {
        var i = 0
        while (i < n) { buf.a(i) = bb.getLong; i += 1 }
        buf.n = n
      }
      buf
    }

    override def withNewMutableAggBufferOffset(offset: Int): CappedDistinctLongs =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): CappedDistinctLongs =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildInternal(newChild: Expression): CappedDistinctLongs =
      copy(child = newChild)
  }

  /** Distinct BIGINTs of the group as a sorted array, NULL once the
    * group exceeds `cap` distinct values. */
  def cappedDocSet(c: Column, cap: Int): Column =
    ColumnBridge.column(
      CappedDistinctLongs(ColumnBridge.expression(c), cap).toAggregateExpression())
}
