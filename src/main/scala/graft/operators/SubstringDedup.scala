package graft.operators

import graft.functions.GramMd5Functions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Exact-substring (repeated-span) dedup — the training-data modality
  * where the unit of duplication is a long verbatim PASSAGE inside
  * otherwise-distinct documents (boilerplate, licenses, templated
  * text), not the whole document. The standard formulation
  * (suffix-array dedup of training corpora) reduces cleanly to fixed
  * windows: a verbatim repeat of length L ≥ W tokens appears as
  * L−W+1 consecutive duplicated W-token windows, so
  *
  *   1. hash every W-token window (md5 of the space-joined gram — the
  *      repo's exact-identity convention, shipped as two longs, never
  *      the text),
  *   2. keep windows whose gram occurs at ≥ 2 (doc, pos) sites
  *      anywhere in the corpus (cross-doc AND within-doc repeats),
  *   3. merge overlapping/adjacent duplicated windows per document
  *      into maximal spans (gaps-and-islands over positions),
  *
  * recovers exactly the union of all ≥W-token repeated regions, with
  * spans reported as token ranges [span_start, span_end).
  *
  * Scale shape: the kernel emits (pos, md5hi, md5lo) map-side — the
  * exchange carries 20 bytes per window, not grams; the occurrence
  * count partial-aggregates; the candidate semi-join rides the SAME
  * (hi, lo) partitioning as the count (exchange reuse — PlanSpec);
  * the per-document window function touches only documents that have
  * hits. No driver state, no all-pairs anything.
  */
object SubstringDedup {

  /** Maximal repeated token spans per document: (idCol, span_start,
    * span_end) with token positions 0-based and span_end exclusive.
    * `windowTokens` is the minimum repeat length W (production corpora
    * typically use ~50; the synthetic tables plant shorter repeats).
    */
  def repeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int): DataFrame = {
    val w = windowTokens
    val grams = windowSites(docs, idCol, textCol, w)
    val dup = grams.groupBy("hi", "lo")
      .agg(count(lit(1)).as("n")).where(col("n") > 1)
      .select("hi", "lo")
    val hits = grams.join(dup, Seq("hi", "lo"), "left_semi")
    spansFromHits(hits, idCol, w)
  }

  /** Every W-token window of every document as `(idCol, pos, hi, lo)` —
    * the map-side kernel emission both the batch operator and the
    * streaming site store build on. 20 bytes per window, never grams.
    */
  private[graft] def windowSites(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int): DataFrame = {
    require(windowTokens >= 2, "windowTokens must be >= 2")
    // rebalance BEFORE the per-window md5 kernel: a single-row-group
    // corpus file scans as one task, which would serialize the whole
    // gram enumeration on one core (16 s of a 36 s sf10 run was this
    // map stage on 2 of 32 cores); no-op on multi-split tables
    Dedup.rebalance(docs.select(col(idCol), col(textCol)), Seq(col(idCol)))
      .select(col(idCol), posexplode(
        GramMd5Functions.wordGramMd5(col(textCol), windowTokens)).as(Seq("pos", "h")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        col("h.hi").as("hi"), col("h.lo").as("lo"))
  }

  /** Gaps-and-islands merge of duplicated window positions into maximal
    * spans: `hits` is any subset of window sites already known to be
    * duplicated; consecutive/overlapping windows (gap ≤ W) fold into
    * one [span_start, span_end) token range per document.
    */
  private[graft] def spansFromHits(
      hits: DataFrame, idCol: String, windowTokens: Int): DataFrame = {
    val w = windowTokens
    val byDoc = Window.partitionBy(idCol).orderBy("pos")
    hits
      .withColumn("is_new",
        when(lag(col("pos"), 1).over(byDoc).isNull ||
          col("pos") > lag(col("pos"), 1).over(byDoc) + w, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("is_new")).over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + w).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }
}
