package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.util.{PriorityQueue => JPriorityQueue}

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact grouped top-k as a native bounded-heap aggregate.
  *
  * The declarative top-k-per-group idiom (`row_number() OVER (PARTITION BY g
  * ORDER BY ord DESC) <= k`, SURVEY.md §2.2 "Window functions") shuffles and
  * sorts EVERY row of every group: at 100 TB the exchange carries the whole
  * table and each reducer sorts its groups in full, even though all but k
  * rows per group are discarded. This aggregate keeps a k-bounded min-heap
  * per group instead, and — because [[TypedImperativeAggregate]] participates
  * in partial aggregation — each map task pre-shrinks its share of a group to
  * at most k entries before the exchange. Shuffled volume drops from
  * O(rows) to O(groups × k × mapPartitions) with no sort at all (heap
  * maintenance is O(log k) per row), the same partial-combine contract the
  * reference's word count gains from map-side aggregation (SURVEY.md §2.1
  * O6).
  *
  * Semantics: rows rank by `(ord DESC, payload ASC)` — the payload
  * tie-break makes the result a deterministic pure function of the input
  * (hash-comparable against a `ROW_NUMBER()` oracle ordering the same way;
  * ties compare the payload STRING lexicographically in both engines).
  * Null `ord` or `payload` rows are ignored, matching `ROW_NUMBER` oracles
  * whose inputs are non-null aggregates. Output is an
  * `array<struct<ord double, payload string>>` sorted best-first.
  *
  * Buffers serialize as (count, [double, utf8-bytes]*) — at most k entries
  * regardless of input size, so shuffle rows stay tiny and spill-safe.
  */
case class TopKRows(
    ord: Expression,
    payload: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRows.Buffer] with ExpectsInputTypes {

  /** Heap bound; analysis-time constant (same foldability contract as
    * graft_shingles' n — fail at planning, not mid-job).
    */
  lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) if v > 0 => v
    case other =>
      throw new IllegalArgumentException(
        s"topk_rows: k must be a positive integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(ord, payload, kExpr)
  override def inputTypes = Seq(DoubleType, StringType, IntegerType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", DoubleType, nullable = false),
      StructField("payload", StringType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKRows.Buffer = new TopKRows.Buffer(k)

  override def update(buf: TopKRows.Buffer, input: InternalRow): TopKRows.Buffer = {
    val o = ord.eval(input)
    val p = payload.eval(input)
    // eval may hand back a UTF8String view into a reused row buffer — copy
    // to an owned String before it outlives this call.
    if (o != null && p != null)
      buf.add(o.asInstanceOf[Double], p.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: TopKRows.Buffer, other: TopKRows.Buffer): TopKRows.Buffer = {
    buf.absorb(other); buf
  }

  override def eval(buf: TopKRows.Buffer): Any = {
    val entries = buf.sortedBestFirst
    new GenericArrayData(entries.map { e =>
      InternalRow(e.ord, UTF8String.fromString(e.payload))
    })
  }

  override def serialize(buf: TopKRows.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buf.sortedBestFirst
    out.writeInt(entries.length)
    entries.foreach { e =>
      out.writeDouble(e.ord)
      val b = e.payload.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKRows.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKRows.Buffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val o = in.readDouble()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.add(o, new String(b, StandardCharsets.UTF_8))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKRows =
    copy(ord = newChildren(0), payload = newChildren(1), kExpr = newChildren(2))
  override def prettyName: String = "graft_topk_rows"
}

object TopKRows {

  final case class Entry(ord: Double, payload: String)

  /** Spark SQL's double ordering: NaN is the LARGEST value (and equal to
    * itself), -0.0 == 0.0. Primitive `>`/`==` would make NaN unorderable
    * (false in both directions) — entries would silently drop from the heap
    * while `row_number()` ranks them first, breaking the provable-identity
    * contract [[graft.plans.TopKRewrite]] relies on. `Double.compare` gives
    * NaN-greatest directly; the signed-zero divergence is normalized away.
    */
  private def cmpOrd(a: Double, b: Double): Int =
    java.lang.Double.compare(if (a == 0.0d) 0.0d else a, if (b == 0.0d) 0.0d else b)

  /** `a` outranks `b`: higher ord wins (NaN greatest, as Spark sorts), ties
    * broken by lexicographically smaller payload (total order ⇒
    * deterministic result).
    */
  private def outranks(a: Entry, b: Entry): Boolean = {
    val c = cmpOrd(a.ord, b.ord)
    c > 0 || (c == 0 && a.payload < b.payload)
  }

  /** k-bounded heap; head is the WORST kept entry so a beaten candidate
    * evicts in O(log k).
    */
  final class Buffer(val k: Int) {
    private val heap = new JPriorityQueue[Entry](k.max(1), (x: Entry, y: Entry) =>
      if (outranks(y, x)) -1 else if (outranks(x, y)) 1 else 0)

    def add(ord: Double, payload: String): Unit = {
      val e = Entry(ord, payload)
      if (heap.size < k) heap.offer(e)
      else if (outranks(e, heap.peek())) { heap.poll(); heap.offer(e) }
    }

    def absorb(other: Buffer): Unit = {
      val it = other.heap.iterator()
      while (it.hasNext) { val e = it.next(); add(e.ord, e.payload) }
    }

    def sortedBestFirst: Array[Entry] = {
      val arr = heap.toArray(new Array[Entry](heap.size))
      scala.util.Sorting.stableSort(arr, (x: Entry, y: Entry) => outranks(x, y))
      arr
    }
  }

  /** DataFrame surface: `df.groupBy(g).agg(TopKRows(3, $"revenue", $"id"))`. */
  def apply(k: Int, ord: Column, payload: Column): Column =
    GraftSqlBridge.column(
      TopKRows(GraftSqlBridge.expression(ord), GraftSqlBridge.expression(payload),
        Literal(k)).toAggregateExpression())
}
