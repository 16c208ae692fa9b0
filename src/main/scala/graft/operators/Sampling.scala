package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: the sample changes
  * under repartitioning, retries, and between runs — useless for a
  * reproducible data recipe. These operators derive the keep/drop
  * decision from a HASH OF THE ROW KEY, so the same row makes the same
  * decision on any cluster layout, any engine (md5 is portable), any
  * rerun — and the filter is a map-only scan predicate: no shuffle, no
  * driver state, prunes straight down to the parquet scan.
  */
object Sampling {

  /** Uniform [0,1) deterministic per-key coin: first 8 hex digits of
    * md5(key) / 2^32.
    */
  def keyCoin(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Keeps ~`fraction` of rows, decided per key. */
  def deterministicSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.where(keyCoin(key) < fraction)

  /** Stratified sampling with per-stratum rates (e.g. downsample the
    * dominant language, keep the rare ones): `fractions` maps stratum
    * value → keep rate, anything else keeps `default`.
    */
  def stratifiedSample(
      df: DataFrame,
      key: Column,
      stratum: Column,
      fractions: Map[String, Double],
      default: Double): DataFrame = {
    val rate = fractions.foldLeft(lit(default)) { case (acc, (value, f)) =>
      when(stratum === value, lit(f)).otherwise(acc)
    }
    df.where(keyCoin(key) < rate)
  }
}
