package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: the two-phase salted shape for keys
  * whose row counts are orders of magnitude apart (the 100 TB failure
  * mode where one reducer gets the hot key and the stage never
  * finishes).
  *
  * Phase 1 groups on (key, salt) — the hot key's rows spread over
  * `saltBuckets` reducers; phase 2 re-aggregates the partials on the
  * key alone, shuffling only `saltBuckets` rows per key. Result is
  * EXACTLY the unsalted aggregate (sums/counts/min/max re-associate),
  * which is why the oracle is the plain GROUP BY.
  *
  * AQE's skew-join handling covers joins; salting remains the tool for
  * skewed AGGREGATIONS with algebraic aggregates.
  */
object SkewOps {

  /** count + sum(valueCol as decimal) per key, salted.
    *
    * Phase 1 runs the fused money-cast + int128 decimal sum
    * (`graft_money` / `graft_decimal_sum`) instead of
    * `sum(cast(v as decimal(18,2)))`: the built-in promotes the
    * accumulator to DECIMAL(28,2), which exceeds the compact-long
    * representation and boxes a BigDecimal per row — the r17-measured
    * 2x of this operator's per-row cost (OPTIMIZATION_r17.md q34).
    * Bit-identical semantics are pinned by MoneyCastSpec /
    * DecimalSumSpec; phase 2 keeps the built-in sum (≤ saltBuckets
    * rows per key).
    */
  def saltedAgg(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(col(keyCol), monotonically_increasing_id()), lit(saltBuckets)))
    // graft_money takes doubles only; any other value type keeps the
    // built-in cast (the fused sum is still exact over it)
    val asMoney = df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.DoubleType =>
        graft.functions.DecimalFunctions.moneyCast(col(valueCol), 18, 2)
      case _ => col(valueCol).cast("decimal(18,2)")
    }
    salted.groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("pn"),
        graft.functions.DecimalFunctions.decimalSum(asMoney).as("ps"))
      .groupBy(col(keyCol))
      .agg(sum(col("pn")).cast("long").as("n"),
        sum(col("ps")).cast("double").as("total"))
  }

  /** Skew-resistant equi-join: the SALT-AND-REPLICATE shape for when
    * AQE can't help — e.g. the skew is known up front, AQE is off, or
    * the join sits below operators that prevent the runtime split.
    *
    * The fact (left, skewed) side gets a random salt in [0, n); the
    * dimension (right) side is replicated n× with every salt value, so
    * each (key, salt) cell joins exactly once. The hot key's rows land
    * on n reducers instead of one; the price is an n× blowup of the
    * SMALLER side only. Exact same rows as the unsalted join.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltBuckets: Int = 16): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(hash(col(keys.head), monotonically_increasing_id()), lit(saltBuckets)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
