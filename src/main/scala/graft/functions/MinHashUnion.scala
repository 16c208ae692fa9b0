package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Elementwise-min union of MinHash signatures — the typed
  * `Aggregator[IN, BUF, OUT]` face of the sketch family: union of the
  * min-hash signatures of a group of documents IS the signature of the
  * union of their shingle sets, so corpus-level entities (a source, a
  * crawl, a day) get comparable signatures by folding their documents'
  * signatures — no re-tokenization, constant state.
  *
  * Use this form when the signatures are ALREADY materialized as array
  * columns (a signature table maintained incrementally). When raw text
  * is at hand, `Dedup.minhashSignaturesByKey` expresses the same union
  * as a wide-column groupBy-min — fully codegen'd HashAggregate, the
  * scale path (OperatorSpec proves the two agree).
  */
class MinHashUnion(k: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < k && i < sig.length) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  // ExpressionEncoder, not javaSerialization: the buffer crosses the
  // wire on every map-side partial merge — Tungsten's UnsafeArrayData
  // long[] codec beats Java ser/de by an order of magnitude there
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
