package graft

import graft.functions.DecimalFunctions.moneyCast
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Agreement of `graft_money(x, p, s)` with the built-in
  * `CAST(x AS DECIMAL(p,s))` — the executable contract for the
  * star-aggregate cast fast path. The fast path only fires when
  * `(double)(round(v·10^s)) / 10^s == v` proves v is exactly a
  * scale-s fixed-point value, so every row must be bit-identical to
  * the built-in; these tests feed both the provable values and the
  * adversarial ones that must fall through to the boxed path.
  */
class MoneyCastSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(values: Seq[java.lang.Double], p: Int, s: Int): Unit = {
    val df = values.toDF("v")
    val rows = df.select(
      col("v"),
      moneyCast(col("v"), p, s).as("got"),
      col("v").cast(s"decimal($p,$s)").as("want")).collect()
    val bad = rows.filter(r => r.get(1) != r.get(2))
    assert(bad.isEmpty, bad.map(r =>
      s"${r.get(0)}: got=${r.get(1)} want=${r.get(2)}").mkString("\n"))
  }

  test("clean fixed-point values: the generator's money shape") {
    val rnd = new Random(3)
    val clean = (1 to 20000).map { _ =>
      java.lang.Double.valueOf((rnd.nextLong() % 1000000000L) / 100.0)
    }
    check(clean, 18, 2)
    check(clean.map(v => java.lang.Double.valueOf(v / 1e7)), 8, 2)
  }

  test("adversarial values must agree through the slow path") {
    check(Seq[java.lang.Double](
      2.675, // binary 2.67499999999999982: shortest-repr rounds UP, binary rounds down
      0.125, 1.005, -1.005, 2.665, 1234567.895,
      1.0 / 3.0, math.Pi, 1e-20, -1e-20,
      0.0, -0.0, null,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, Double.MaxValue, -Double.MaxValue,
      9999999999999999.99, // overflow boundary for DECIMAL(18,2)
      1e16, -1e16, 1e15, -1e15, 99999999999999.99,
      9.007199254740992e15, // 2^53: past exact-integer doubles
      1.7e308), 18, 2)
  }

  test("precision overflow nulls like the cast does") {
    check(Seq[java.lang.Double](123456.78, -123456.78, 999999.99, 1000000.0,
      123456.789, 1e7, -1e7), 8, 2)
    check(Seq[java.lang.Double](9.99, 10.0, -10.0, 0.01, 3.14159), 3, 2)
  }

  test("scale 0 and scale 4 variants") {
    val rnd = new Random(11)
    val vals = (1 to 5000).map(_ =>
      java.lang.Double.valueOf((rnd.nextLong() % 100000000L) / 10000.0))
    check(vals, 18, 4)
    check(vals, 18, 0)
    check(Seq[java.lang.Double](2.5, 3.5, -2.5, 0.5, 1.499999999), 18, 0)
  }

  test("fuzz: random raw doubles at every magnitude") {
    val rnd = new Random(23)
    val vals = (1 to 20000).map { _ =>
      val m = rnd.nextInt(40) - 20
      java.lang.Double.valueOf(rnd.nextDouble() * math.pow(10, m) *
        (if (rnd.nextBoolean()) 1 else -1))
    }
    check(vals, 18, 2)
  }

  test("SQL registration resolves") {
    Seq(1.25).toDF("v").createOrReplaceTempView("money_probe")
    val r = spark.sql("SELECT graft_money(v, 18, 2) AS m FROM money_probe").collect()
    assert(r.head.getDecimal(0) == new java.math.BigDecimal("1.25"))
  }
}
