package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for training-batch assembly: grouping documents so
  * each training sample approaches the context-window budget instead
  * of wasting it on padding.
  *
  * Two levels, both scale-shaped:
  * - `lengthBuckets`: pure column math (floor(len / width)) — the
  *   cheap declarative knob that lets a loader batch similar-length
  *   sequences together; no shuffle beyond the aggregation that
  *   reports it.
  * - `packGreedy`: NEXT-FIT greedy packing WITHIN each partition via
  *   `mapPartitions` — the legitimate per-partition imperative escape
  *   hatch: packing is inherently sequential/stateful, but it needs no
  *   global state, so each task packs only its own slice and emits
  *   (pack_id, doc_id, tokens) assignments in one streaming pass with
  *   O(1) state (next-fit never revisits a closed pack — the
  *   streaming-friendly trade against first-fit's slightly tighter
  *   packs). Pre-partition by a length bucket (or anything) to control
  *   what may be packed together; pack ids are globally unique
  *   (partition id in the high bits).
  */
object Packing {

  def lengthBuckets(len: org.apache.spark.sql.Column, width: Int): org.apache.spark.sql.Column =
    floor(len / width).cast("long")

  val PackSchema: StructType = StructType(Seq(
    StructField("pack_id", LongType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))

  /** Next-fit greedy packing: iterate a partition's (doc_id, n_tokens)
    * rows, open a new pack whenever the current one would exceed
    * `budget`. Documents longer than the budget get a pack of their
    * own (truncation is the caller's policy decision). NULL ids or
    * token counts fail loudly — getLong would silently coerce them to
    * 0, colliding every null id on doc 0.
    */
  def packGreedy(docs: DataFrame, idCol: String, tokensCol: String, budget: Long): DataFrame = {
    val enc = RowEncoder.encoderFor(PackSchema)
    docs.select(col(idCol).cast("long"), col(tokensCol).cast("long"))
      .mapPartitions { rows =>
        new Iterator[Row] {
          private val base =
            org.apache.spark.TaskContext.getPartitionId().toLong << 33
          private var packSeq = 0L
          private var used = 0L
          private var started = false
          override def hasNext: Boolean = rows.hasNext
          override def next(): Row = {
            val r = rows.next()
            if (r.isNullAt(0) || r.isNullAt(1))
              throw new IllegalArgumentException(
                "packGreedy: NULL doc id or token count (filter or impute first)")
            val tokens = r.getLong(1)
            if (!started || used + tokens > budget) {
              packSeq += 1; used = 0L; started = true
            }
            used += tokens
            Row(base | packSeq, r.getLong(0), tokens)
          }
        }
      }(enc)
  }
}
