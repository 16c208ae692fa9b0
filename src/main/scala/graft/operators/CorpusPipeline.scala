package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The assembled pretraining-data cleaning pipeline — the composition
  * a corpus team actually runs, in the canonical order:
  *
  *   1. quality filtering (map-only scan predicate — cheapest first,
  *      shrinks everything downstream),
  *   2. repetition filtering (two partial-agg groupBys),
  *   3. benchmark decontamination (broadcast probe, map-side),
  *   4. near-duplicate removal (MinHash-LSH → components → keep-one),
  *
  * each stage feeding the next's smaller frame. Every stage is one of
  * the individually oracle-checked operators; this object only owns
  * the order and the config surface.
  */
object CorpusPipeline {

  final case class CleanConfig(
      quality: QualityFilters.FilterConfig = QualityFilters.FilterConfig(),
      /** Drop docs whose most frequent word exceeds this share. */
      maxTopWordRatio: Option[Double] = None,
      /** Benchmark gram hashes (Decontamination.benchmarkGrams). */
      benchmarkGrams: Option[DataFrame] = None,
      decontaminationN: Int = 13,
      /** MinHash near-dup removal on/off. */
      dedup: Boolean = true,
      minhashK: Int = 8,
      lshBands: Int = 4)

  def clean(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      cfg: CleanConfig): DataFrame = {
    // Each stage references its input from several subplans (a stats
    // pass plus a semi/anti join back), and the analyzer's attribute
    // dedup defeats ReuseExchange — without a boundary the upstream
    // scans re-execute multiplicatively. So every intermediate persists
    // (spilling to disk) for exactly the duration of the next stage,
    // and all of them are released before returning. At corpus scales
    // where even spill is unwelcome, run the stages individually and
    // write each cleaned corpus to a lake table — that is why they are
    // public operators.
    import org.apache.spark.storage.StorageLevel
    val toRelease = Seq.newBuilder[DataFrame]
    def stage(df: DataFrame): DataFrame = {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      toRelease += df
      df
    }
    try {
      val afterQuality = stage(
        docs.where(QualityFilters.predicate(cfg.quality, col(textCol), col(langCol))))
      val afterRepetition = cfg.maxTopWordRatio match {
        case None => afterQuality
        case Some(r) =>
          val keep = Scrubbing.repetitionStats(afterQuality, idCol, textCol)
            .where(col("top_ratio") <= r)
            .select(col("id").as(idCol))
          stage(afterQuality.join(keep, Seq(idCol), "left_semi"))
      }
      val afterDecontamination = cfg.benchmarkGrams match {
        case None => afterRepetition
        case Some(grams) =>
          stage(Decontamination.decontaminate(
            afterRepetition, idCol, textCol, grams, cfg.decontaminationN))
      }
      val out =
        if (!cfg.dedup) afterDecontamination
        else Dedup.dedupCorpus(
          afterDecontamination, idCol, textCol, cfg.minhashK, cfg.lshBands)
      // materialize the final corpus before releasing the stage caches
      // it was computed from (checkpoint when a dir is set — the
      // cluster deployment — else local)
      val sc = docs.sparkSession.sparkContext
      if (sc.getCheckpointDir.isDefined) out.checkpoint()
      else out.localCheckpoint()
    } finally toRelease.result().foreach(_.unpersist())
  }
}
