package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** Bounded top-k as a MERGEABLE aggregate — the missing piece that
  * makes per-probe nearest-neighbor ranking scale.
  *
  * The naive rank plan (`row_number() OVER (PARTITION BY probe ORDER
  * BY sim DESC)` then `rank <= k`) must SHUFFLE the entire scored
  * frame — probes × corpus rows, the very cross product the ANN
  * operators take pains never to materialize anywhere else (400M rows
  * at sf10 for q25; ~10¹² at the 100 TB design point). A bounded
  * top-k aggregate instead rides standard two-phase aggregation:
  * each map task keeps a k-element heap per probe and the exchange
  * carries `partitions × probes × k` rows — independent of corpus
  * size. Semantics are pinned to the window formulation exactly:
  * order by (sim DESC, id ASC), nulls never ranked.
  *
  * State is two primitive arrays (k doubles + k longs) managed as a
  * binary min-heap rooted at the WORST kept element, so update is
  * O(log k) worst case and O(1) for the overwhelming majority of rows
  * that lose to the current k-th. `eval` emits the heap sorted
  * best-first as `array<struct<cand_id:bigint, sim:double>>` —
  * `posexplode` recovers (rank, cand_id, sim).
  *
  * No reference analog (the reference ships no similarity search);
  * extension tier per SURVEY §7.5, same registry pattern as
  * SketchFunctions / FreqFunctions / KllFunctions.
  */
object TopKFunctions {

  /** Mutable aggregation state: min-heap of the k best (sim, id)
    * pairs, worst at the root. Ordering: pair A beats pair B iff
    * simA > simB, or simA == simB and idA < idB.
    */
  final class TopKHeap(val k: Int) {
    val sims = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    /** is element at i worse (closer to eviction) than at j */
    private def worse(i: Int, j: Int): Boolean =
      sims(i) < sims(j) || (sims(i) == sims(j) && ids(i) > ids(j))

    private def swap(i: Int, j: Int): Unit = {
      val s = sims(i); sims(i) = sims(j); sims(j) = s
      val d = ids(i); ids(i) = ids(j); ids(j) = d
    }

    def offer(sim: Double, id: Long): Unit = {
      if (size < k) {
        sims(size) = sim; ids(size) = id; size += 1
        // sift up: the new leaf may be worse than its parent
        var c = size - 1
        while (c > 0 && worse(c, (c - 1) / 2)) { swap(c, (c - 1) / 2); c = (c - 1) / 2 }
      } else if (sim > sims(0) || (sim == sims(0) && id < ids(0))) {
        sims(0) = sim; ids(0) = id
        // sift down: root may now beat a child
        var p = 0
        var done = false
        while (!done) {
          val l = 2 * p + 1; val r = l + 1
          var w = p // worst of the triple
          if (l < size && worse(l, w)) w = l
          if (r < size && worse(r, w)) w = r
          if (w == p) done = true else { swap(p, w); p = w }
        }
      }
    }

    /** indices of kept elements, best-first (sim desc, id asc) */
    def sortedIdx(): Array[Int] = {
      val idx = Array.range(0, size)
      // boxed sort is fine here: size <= k, evaluated once per group
      idx.sortWith { (a, b) =>
        sims(a) > sims(b) || (sims(a) == sims(b) && ids(a) < ids(b))
      }
    }
  }

  private val PairStruct = StructType(Seq(
    StructField("cand_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))

  /** `graft_top_k(sim, id, k)` — array of the k best (cand_id, sim)
    * pairs under (sim DESC, id ASC), as a mergeable aggregate.
    */
  case class TopKAgg(
      sim: Expression,
      id: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[TopKHeap] {
    require(k >= 1 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")
    override def prettyName: String = "graft_top_k"
    override def children: Seq[Expression] = Seq(sim, id)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(PairStruct, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult = {
      val simOk = sim.dataType match {
        case DoubleType | FloatType => true
        case _ => false
      }
      val idOk = id.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      if (!simOk) TypeCheckResult.TypeCheckFailure(
        s"$prettyName: sim must be double/float, got ${sim.dataType.catalogString}")
      else if (!idOk) TypeCheckResult.TypeCheckFailure(
        s"$prettyName: id must be integral, got ${id.dataType.catalogString}")
      else TypeCheckResult.TypeCheckSuccess
    }

    private def idAsLong(v: Any): Long = v match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case other => other.toString.toLong
    }

    private def simAsDouble(v: Any): Double = v match {
      case d: Double => d
      case f: Float => f.toDouble
      case other => other.toString.toDouble
    }

    override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

    override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
      val s = sim.eval(input)
      val i = id.eval(input)
      // null sim or id never ranks (the window formulation puts nulls
      // after every ranked row; a null id is not addressable output)
      if (s != null && i != null) buf.offer(simAsDouble(s), idAsLong(i))
      buf
    }

    override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
      var i = 0
      while (i < other.size) { buf.offer(other.sims(i), other.ids(i)); i += 1 }
      buf
    }

    override def eval(buf: TopKHeap): Any = {
      val idx = buf.sortedIdx()
      val rows = new Array[Any](idx.length)
      var i = 0
      while (i < idx.length) {
        rows(i) = InternalRow(buf.ids(idx(i)), buf.sims(idx(i)))
        i += 1
      }
      new GenericArrayData(rows)
    }

    override def serialize(buf: TopKHeap): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + 16 * buf.size)
      bb.putInt(buf.k).putInt(buf.size)
      var i = 0
      while (i < buf.size) { bb.putDouble(buf.sims(i)).putLong(buf.ids(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): TopKHeap = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val heap = new TopKHeap(bb.getInt())
      val n = bb.getInt()
      var i = 0
      while (i < n) {
        val s = bb.getDouble(); val d = bb.getLong()
        heap.offer(s, d)
        i += 1
      }
      heap
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(sim = newChildren(0), id = newChildren(1))
  }

  private[graft] def topKBuilder(exprs: Seq[Expression]): Expression = {
    graft.GraftExtensions.requireArity("graft_top_k", exprs, 3)
    TopKAgg(exprs(0), exprs(1),
      FreqFunctions.intLit("graft_top_k", "k", exprs(2))).toAggregateExpression()
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_top_k", topKBuilder, "built-in")

  def topK(spark: SparkSession, sim: Column, id: Column, k: Int): Column = {
    register(spark)
    call_function("graft_top_k", sim, id, lit(k))
  }
}
