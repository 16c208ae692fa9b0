package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the GPT-3-style n-gram collision check
  * every pretraining pipeline runs before training: a document is
  * contaminated if any of its word n-grams (classically n=13) appears
  * in a held-out benchmark set.
  *
  * Scale shape: corpus documents explode to (doc, 60-bit gram hash) —
  * fixed-width rows, one md5 per gram — and join against the
  * benchmark's DISTINCT gram hashes. The benchmark side is tiny
  * relative to a 100 TB corpus (eval suites are megabytes), so the
  * join is a BROADCAST hash probe: the corpus never shuffles, the
  * whole check is one map-side pass. The per-doc verdict is a
  * partial-aggregating groupBy on the doc id.
  *
  * Short documents (< n words) hash their whole text as one gram, so
  * a benchmark fragment shorter than n still matches verbatim copies.
  */
object Decontamination {

  /** Word n-grams of a text column; degenerate texts (< n words)
    * collapse to the whole text — same convention as Dedup.shingles.
    */
  def wordNgrams(text: Column, n: Int): Column = {
    val ws = TextAnalysis.words(text)
    when(size(ws) < n, array(text)).otherwise(
      transform(sequence(lit(1), size(ws) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(o =>
          element_at(ws, i + o)): _*)))
  }

  /** 60-bit gram hash (md5 prefix — same engine-portable digest the
    * dedup family uses).
    */
  private def gramHash(g: Column): Column =
    conv(substring(md5(g), 1, 15), 16, 10).cast("long")

  /** The distinct n-gram hash set of a benchmark corpus — build once,
    * reuse across corpus scans (callers may persist or write it out).
    */
  def benchmarkGrams(bench: DataFrame, textCol: String, n: Int): DataFrame =
    Dedup.rebalance(bench.select(col(textCol).as("t")))
      .select(explode_outer(array_distinct(wordNgrams(col("t"), n))).as("g"))
      .where(col("g").isNotNull)
      .select(gramHash(col("g")).as("h"))
      .distinct()

  /** Per-document contamination verdict: (id, n_hits, contaminated).
    * `grams` is a benchmarkGrams frame; it is broadcast, so the corpus
    * side never shuffles — the check stays map-side at any corpus
    * size (a 100 TB corpus against megabytes of eval data).
    */
  def contaminated(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      grams: DataFrame,
      n: Int = 13): DataFrame = {
    val ex = Dedup.rebalance(docs.select(col(idCol).as("id"), col(textCol).as("t")))
      .select(col("id"), explode_outer(array_distinct(wordNgrams(col("t"), n))).as("g"))
      .where(col("g").isNotNull)
      .select(col("id"), gramHash(col("g")).as("h"))
    val hits = ex.join(broadcast(grams), Seq("h"))
      .groupBy("id").agg(count(lit(1)).cast("long").as("n_hits"))
    docs.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0L).as("contaminated"))
  }

  /** The applied form: the corpus minus contaminated documents. */
  def decontaminate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      grams: DataFrame,
      n: Int = 13): DataFrame = {
    val bad = contaminated(docs, idCol, textCol, grams, n)
      .where(col("contaminated")).select(col("id").as(idCol))
    docs.join(bad, Seq(idCol), "left_anti")
  }
}
