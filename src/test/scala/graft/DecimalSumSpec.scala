package graft

import graft.functions.DecimalFunctions.{decimalSum, decimalSumProduct}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Agreement of the int128 decimal aggregates with Spark's built-in
  * `sum` — the executable spec for the star-aggregate fast path. The
  * built-in's boxed-BigDecimal accumulator is exact, so on every
  * non-overflowing input the two must be bit-identical; on overflow
  * both contract to null (non-ANSI).
  */
class DecimalSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  test("decimalSum: agrees with built-in sum on random signed values with nulls") {
    val rnd = new Random(7)
    val rows = (1 to 5000).map { i =>
      val v: java.lang.Double =
        if (rnd.nextInt(10) == 0) null
        else (rnd.nextLong() % 1000000000L) / 100.0
      (i % 7, v)
    }
    val df = rows.toDF("g", "v")
    val got = df.groupBy("g")
      .agg(decimalSum(dec2($"v")).as("s"))
      .orderBy("g").collect()
    val want = df.groupBy("g")
      .agg(sum(dec2($"v")).as("s"))
      .orderBy("g").collect()
    assert(got.toSeq == want.toSeq)
    // result type matches the built-in's sum rule: DECIMAL(28,2)
    val schema = df.agg(decimalSum(dec2($"v"))).schema
    assert(schema.head.dataType == DecimalType(28, 2))
  }

  test("decimalSum: empty input and all-null group return null") {
    val df = Seq((1, Some(1.50)), (2, None: Option[Double])).toDF("g", "v")
    val out = df.groupBy("g").agg(decimalSum(dec2($"v")).as("s"))
      .orderBy("g").collect()
    assert(out(0).getDecimal(1) == new java.math.BigDecimal("1.50"))
    assert(out(1).isNullAt(1))
    assert(df.where($"g" === 99).agg(decimalSum(dec2($"v"))).head().isNullAt(0))
  }

  test("decimalSum: low-word carry boundary (values straddling 2^63 unscaled)") {
    // max-magnitude 18-digit unscaled values; 64 of them sum to
    // ~6.4e19 unscaled > 2^63, forcing low-word carries into the high word
    val big = "9999999999999999.99"
    val df = Seq.fill(64)(big).toDF("v").select($"v".cast("decimal(18,2)").as("d"))
    assert(df.where($"d".isNull).count() == 0) // literal must survive the cast
    val got = df.agg(decimalSum($"d")).head().getDecimal(0)
    val want = df.agg(sum($"d")).head().getDecimal(0)
    assert(got == want)
    // and with sign flips: exact cancellation back to zero
    val mixed = (Seq.fill(32)(big) ++ Seq.fill(32)("-" + big)).toDF("v")
      .select($"v".cast("decimal(18,2)").as("d"))
    assert(mixed.agg(decimalSum($"d")).head().getDecimal(0)
      .compareTo(java.math.BigDecimal.ZERO) == 0)
  }

  test("decimalSum: overflow past DECIMAL(28,2) returns null like the built-in") {
    // 10^28 / 10^16-per-row ≈ needs > 10^10 rows of max values to overflow
    // the RESULT precision, but a repartition-merge of pre-aggregated
    // near-max partials gets there cheaply: 2e10 rows worth via a
    // union of two synthetic partials is impractical in a unit test,
    // so instead overflow the result precision directly with a
    // smaller-scale type: DECIMAL(2,0) sums to DECIMAL(12,0); 13-digit
    // totals must be null.
    val df = (1 to 20000).map(_ => 99).toDF("v")
      .select($"v".cast("decimal(2,0)").as("d"))
    // 20000 * 99 = 1,980,000 fits DECIMAL(12,0): equal to built-in
    assert(df.agg(decimalSum($"d")).head().getDecimal(0) ==
      df.agg(sum($"d")).head().getDecimal(0))
    // Synthesize true result-precision overflow via the SQL function on
    // a literal-heavy aggregate: 10^11 rows is out of reach, so assert
    // the finish-side guard directly through Long128ToDecimal: a
    // (hi, lo) pair exceeding 12 digits yields null.
    val r = graft.functions.Decimal128.toDecimal(0L, 9999999999999L, 12, 0)
    assert(r == null)
    assert(graft.functions.Decimal128.toDecimal(0L, 999999999999L, 12, 0) != null)
  }

  test("decimalSum: int128 negative totals and unsigned-low reconstruction") {
    // totals whose low 64 bits have the sign bit set exercise the
    // unsigned reconstruction in Decimal128.toDecimal
    // 30 near-max rows: sum unscaled ≈ 3e19 ≈ 1.6 * 2^64 — the low 64
    // bits of the total have the sign bit set
    val df = Seq.fill(30)("9999999999999999.99").toDF("v")
      .select($"v".cast("decimal(18,2)").as("d"))
    assert(df.agg(decimalSum($"d")).head().getDecimal(0) ==
      df.agg(sum($"d")).head().getDecimal(0))
    val neg = Seq.fill(30)("-9999999999999999.99").toDF("v")
      .select($"v".cast("decimal(18,2)").as("d"))
    assert(neg.agg(decimalSum($"d")).head().getDecimal(0) ==
      neg.agg(sum($"d")).head().getDecimal(0))
  }

  test("decimalSumProduct: agrees with built-in sum(a*b) and sum(a*b*c)") {
    val rnd = new Random(13)
    val rows = (1 to 5000).map { i =>
      val price: java.lang.Double =
        if (rnd.nextInt(20) == 0) null else rnd.nextInt(10000000) / 100.0
      val disc = rnd.nextInt(11) / 100.0
      val tax = rnd.nextInt(9) / 100.0
      (i % 5, price, disc, tax)
    }
    val df = rows.toDF("g", "price", "disc", "tax")
      .select($"g",
        dec2($"price").as("p"),
        (lit(1).cast("decimal(8,2)") - $"disc".cast("decimal(8,2)")).as("d"),
        (lit(1).cast("decimal(8,2)") + $"tax".cast("decimal(8,2)")).as("t"))
    val got2 = df.groupBy("g").agg(decimalSumProduct($"p", $"d").as("s"))
      .orderBy("g").collect().map(r => Option(r.getDecimal(1)).map(_.toString))
    val want2 = df.groupBy("g").agg(sum($"p" * $"d").as("s"))
      .orderBy("g").collect().map(r => Option(r.getDecimal(1)).map(_.stripTrailingZeros.toString))
    assert(got2.map(_.map(BigDecimal(_))).toSeq == want2.map(_.map(BigDecimal(_))).toSeq)
    val got3 = df.groupBy("g").agg(decimalSumProduct($"p", $"d", $"t").as("s"))
      .orderBy("g").collect().map(r => Option(r.getDecimal(1)).map(BigDecimal(_)))
    val want3 = df.groupBy("g").agg(sum($"p" * $"d" * $"t").as("s"))
      .orderBy("g").collect().map(r => Option(r.getDecimal(1)).map(BigDecimal(_)))
    assert(got3.toSeq == want3.toSeq)
  }

  test("decimalSumProduct: 128-bit per-row products (max-magnitude operands)") {
    // |p| near 10^18, |d| near 10^8 ⇒ per-row product ≈ 10^26: far past
    // a long; exercises MultiplyHigh and the signed-128 accumulate
    val df = Seq(
      ("9999999999999999.99", "999999.99"),
      ("-9999999999999999.99", "999999.99"),
      ("9999999999999999.99", "-999999.99"),
      ("1234567890123456.78", "654321.09"),
    ).toDF("a", "b").select(
      $"a".cast("decimal(18,2)").as("a"),
      $"b".cast("decimal(8,2)").as("b"))
    val got = df.agg(decimalSumProduct($"a", $"b")).head().getDecimal(0)
    val want = df.agg(sum($"a" * $"b")).head().getDecimal(0)
    assert(BigDecimal(got) == BigDecimal(want))
  }

  test("decimalSumProduct: int128 accumulator overflow latches to null") {
    // per-row product ≈ 10^34 (18+16 digits of precision, sum 34 ≤ 36);
    // ~35k such rows exceed 2^127 ≈ 1.7e38 — the latch must fire and
    // the aggregate must return null rather than a wrapped value.
    val df = (1 to 40000).map(_ =>
      ("9999999999999999.99", "999999999999999.9")).toDF("a", "b")
      .select(
        $"a".cast("decimal(18,2)").as("a"),
        $"b".cast("decimal(16,1)").as("b"))
    val out = df.agg(decimalSumProduct($"a", $"b")).head()
    assert(out.isNullAt(0))
    // built-in agrees: DECIMAL(38,3) result overflows → null (non-ANSI)
    assert(df.agg(sum($"a" * $"b")).head().isNullAt(0))
  }

  test("SQL registration: graft_decimal_sum / graft_decimal_sum_product") {
    Seq((1, 10.5), (1, 2.25), (2, -3.75)).toDF("g", "v")
      .createOrReplaceTempView("dsum_t")
    val out = spark.sql(
      """SELECT g, graft_decimal_sum(CAST(v AS DECIMAL(18,2))) s,
        |       graft_decimal_sum_product(CAST(v AS DECIMAL(18,2)),
        |                                 CAST(2 AS DECIMAL(8,2))) p
        |FROM dsum_t GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(out(0).getDecimal(1) == new java.math.BigDecimal("12.75"))
    assert(BigDecimal(out(0).getDecimal(2)) == BigDecimal("25.50"))
    assert(BigDecimal(out(1).getDecimal(2)) == BigDecimal("-7.50"))
  }

  test("money-cast fusion: inline casts agree with built-in sum over built-in casts") {
    import graft.functions.DecimalFunctions.moneyCast
    val rnd = new Random(41)
    // clean money values plus the shapes that force the slow path
    // (extra decimals, NaN/Inf -> null skip, huge magnitudes)
    val rows = (1 to 8000).map { i =>
      val v: java.lang.Double = rnd.nextInt(12) match {
        case 0 => null
        case 1 => Double.NaN
        case 2 => Double.PositiveInfinity
        case 3 => rnd.nextDouble() * 1e17 // past the uniqueness bound
        case 4 => rnd.nextDouble() // raw fractional: slow path
        case _ => (rnd.nextLong() % 100000000L) / 100.0
      }
      (i % 5, v, math.abs(rnd.nextDouble()) % 1.0)
    }
    val df = rows.toDF("g", "v", "w")
    val one82 = lit(1).cast("decimal(8,2)")
    val got = df.groupBy("g").agg(
      decimalSum(moneyCast($"v", 18, 2)).as("s"),
      decimalSumProduct(moneyCast($"v", 18, 2),
        one82 - moneyCast($"w", 8, 2)).as("p"),
      decimalSumProduct(moneyCast($"v", 18, 2),
        one82 - moneyCast($"w", 8, 2), one82 + moneyCast($"w", 8, 2)).as("p3"))
      .orderBy("g").collect()
    val want = df.groupBy("g").agg(
      sum($"v".cast("decimal(18,2)")).as("s"),
      sum($"v".cast("decimal(18,2)") *
        (one82 - $"w".cast("decimal(8,2)"))).as("p"),
      sum($"v".cast("decimal(18,2)") *
        (one82 - $"w".cast("decimal(8,2)")) *
        (one82 + $"w".cast("decimal(8,2)"))).as("p3"))
      .orderBy("g").collect()
    (got zip want).foreach { case (g, w) =>
      assert(g.get(1) == w.get(1), s"sum: $g vs $w")
      assert(g.getDecimal(2).compareTo(w.getDecimal(2)) == 0, s"prod: $g vs $w")
      assert(g.getDecimal(3).compareTo(w.getDecimal(3)) == 0, s"prod3: $g vs $w")
    }
    // the fused update really is long arithmetic: the analyzed
    // aggregate's update expressions use graft_scaled_long (and, for
    // the 1-w term, long subtraction), never UnscaledValue(cast)
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
    val optimized = df.groupBy("g")
      .agg(decimalSum(moneyCast($"v", 18, 2)).as("s"),
        decimalSumProduct(moneyCast($"v", 18, 2),
          one82 - moneyCast($"w", 8, 2)).as("p"))
      .queryExecution.optimizedPlan
    val updates = optimized.expressions.flatMap(_.collect {
      case ae: AggregateExpression => ae.aggregateFunction
    }).flatMap {
      case s: graft.functions.DecimalSum128 => s.updateExpressions
      case p: graft.functions.DecimalSumProduct128 => p.updateExpressions
      case _ => Nil
    }
    assert(updates.nonEmpty)
    assert(updates.exists(_.exists(_.isInstanceOf[graft.functions.ScaledLongExpr])))
    assert(!updates.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.UnscaledValue])),
      updates.mkString("\n"))
  }

  test("type checks: non-decimal and over-precision inputs are rejected") {
    val df = Seq(1L).toDF("v")
    val e1 = intercept[Exception] {
      df.agg(decimalSum($"v")).collect()
    }
    assert(e1.getMessage.contains("DECIMAL") || e1.getMessage.contains("decimal"))
    val e2 = intercept[Exception] {
      df.select($"v".cast("decimal(38,2)").as("d")).agg(decimalSum($"d")).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("decimal") ||
      e2.getMessage.contains("18"))
  }
}
