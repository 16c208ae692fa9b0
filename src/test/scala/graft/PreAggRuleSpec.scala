package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** PreAggGroupingSets: rule-on ≡ rule-off on adversarial SQL grouping
  * sets, and the plan really is base-aggregate-below-Expand.
  */
class PreAggRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(): Unit = {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 4000).map { _ =>
      val a = Seq("x", "y", null, "z")(rnd.nextInt(4)) // data-borne NULL dim
      val b = Seq("p", "q")(rnd.nextInt(2))
      (a, b, rnd.nextInt(1000).toLong,
        (BigDecimal(rnd.nextInt(100000)) / 100).bigDecimal)
    }
    rows.toDF("a", "b", "v", "m")
      .withColumn("m", $"m".cast("decimal(18,2)"))
      .createOrReplaceTempView("pre_agg_t")
  }

  private def canon(df: DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq

  private def withRule[T](on: Boolean)(body: => T): T = {
    val key = "spark.graft.preAggGroupingSets"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, on.toString)
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def bothWays(sql: String): (Seq[Seq[String]], Seq[Seq[String]]) = {
    fixture()
    val off = withRule(on = false)(canon(spark.sql(sql)))
    val on = withRule(on = true)(canon(spark.sql(sql)))
    (on, off)
  }

  test("SQL ROLLUP: rule-on equals rule-off incl. NULL dims, grouping_id, HAVING") {
    val (on, off) = bothWays(
      """SELECT a, b, grouping(a) ga, grouping_id() gid, COUNT(*) n,
        |       SUM(m) sm, MIN(v) mn, MAX(v) mx, COUNT(v) nv
        |FROM pre_agg_t GROUP BY ROLLUP(a, b)
        |HAVING COUNT(*) > 10""".stripMargin)
    assert(on == off && on.nonEmpty)
  }

  test("SQL CUBE and GROUPING SETS with an always-present dim") {
    val (on, off) = bothWays(
      """SELECT a, b, SUM(v) sv, COUNT(*) n FROM pre_agg_t
        |GROUP BY CUBE(a, b)""".stripMargin)
    assert(on == off && on.nonEmpty)
    // a present in EVERY set: its Expand position is stable, not rolled
    val (on2, off2) = bothWays(
      """SELECT a, b, SUM(v) sv FROM pre_agg_t
        |GROUP BY GROUPING SETS ((a, b), (a))""".stripMargin)
    assert(on2 == off2 && on2.nonEmpty)
  }

  test("expression dims and repeated aggregates") {
    val (on, off) = bothWays(
      """SELECT upper(a) ua, SUM(v) s1, SUM(v) s2, SUM(v + 1) s3
        |FROM pre_agg_t GROUP BY ROLLUP(upper(a), b)""".stripMargin)
    assert(on == off && on.nonEmpty)
  }

  test("plan shape: base aggregate sits below Expand when the rule fires") {
    fixture()
    val plan = withRule(on = true) {
      val df = spark.sql(
        "SELECT a, b, SUM(v) sv, COUNT(*) n FROM pre_agg_t GROUP BY ROLLUP(a, b)")
      df.collect() // force execution through the optimized plan
      df.queryExecution.optimizedPlan.toString
    }
    val lines = plan.linesIterator.toSeq
    val expandAt = lines.indexWhere(_.contains("Expand"))
    assert(expandAt >= 0)
    assert(lines.drop(expandAt + 1).exists(_.contains("Aggregate")),
      s"no base aggregate below Expand:\n$plan")
    // and the rewrite does NOT re-fire on its own output (idempotent)
    assert(lines.count(_.contains("Expand")) == 1)
  }

  test("bail-outs: avg and DISTINCT keep the Expand-first plan") {
    fixture()
    withRule(on = true) {
      for (sql <- Seq(
        "SELECT a, AVG(v) av FROM pre_agg_t GROUP BY ROLLUP(a, b)",
        "SELECT a, COUNT(DISTINCT v) dv FROM pre_agg_t GROUP BY ROLLUP(a, b)")) {
        val df = spark.sql(sql)
        val plan = df.queryExecution.optimizedPlan.toString
        val lines = plan.linesIterator.toSeq
        val expandAt = lines.indexWhere(_.contains("Expand"))
        assert(expandAt >= 0, s"no expand: $plan")
        assert(!lines.drop(expandAt + 1).exists(_.contains("Aggregate")),
          s"rewrote a non-decomposable aggregate:\n$plan")
        // and results are still right vs rule-off
        val on = canon(df)
        val off = withRule(on = false)(canon(spark.sql(sql)))
        assert(on == off)
      }
    }
  }
}
