package graft

import graft.functions.ApproxDistinctRewrite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ApproxDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ ApproxDistinctRewrite
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq ApproxDistinctRewrite)
  }

  test("flag off: exact count distinct, plan untouched") {
    withRule {
      val rows = (1L to 5000L).map(i => (i % 7, i % 997))
      val truth = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
      val df = rows.toDF("g", "u")
      val got = df.groupBy("g").agg(countDistinct($"u").as("d"))
      assert(!got.queryExecution.optimizedPlan.toString.contains("graft_theta_distinct"))
      assert(got.as[(Long, Long)].collect().toMap == truth)
    }
  }

  test("flag on: count distinct rewrites to the theta aggregate, ~exact at this scale") {
    withRule {
      spark.conf.set("spark.graft.approxDistinct", "true")
      try {
        val rows = (1L to 5000L).map(i => (i % 7, i % 997))
        val truth = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
        val df = rows.toDF("g", "u")
        val got = df.groupBy("g").agg(countDistinct($"u").as("d"))
        val planStr = got.queryExecution.optimizedPlan.toString
        assert(planStr.contains("graft_theta_distinct"), planStr)
        // no Expand (the multi-phase exact-distinct shape) in the plan
        assert(!got.queryExecution.executedPlan.toString.contains("Expand"))
        got.as[(Long, Long)].collect().foreach { case (g, d) =>
          val ex = truth(g)
          assert(math.abs(d - ex) <= math.max(2L, ex / 50), s"g=$g d=$d exact=$ex")
        }
        // a query mixing multi-arg and single-arg distincts has already
        // been expanded by RewriteDistinctAggregates when this rule
        // runs — no Count(distinct) remains to match, so the whole
        // query keeps exact semantics (the conservative outcome)
        val guarded = df.agg(
          countDistinct($"u", $"g").as("multi"),
          count_distinct($"u").as("single"))
        val gp = guarded.queryExecution.optimizedPlan.toString
        assert(!gp.contains("graft_theta_distinct"), gp)
        assert(gp.contains("Expand"), gp)
        val truthAll = rows.map(_._2).distinct.size.toLong
        val r = guarded.as[(Long, Long)].collect()(0)
        assert(r._1 == rows.distinct.size.toLong && r._2 == truthAll)
      } finally spark.conf.unset("spark.graft.approxDistinct")
    }
  }

  test("flag on: grouping-set aggregates (ROLLUP) rewrite and stay correct") {
    withRule {
      spark.conf.set("spark.graft.approxDistinct", "true")
      try {
        val rows = (1L to 3000L).map(i => (i % 3, i % 5, i % 211))
        val df = rows.toDF("a", "b", "u")
        val got = df.rollup("a", "b").agg(countDistinct($"u").as("d"))
        assert(got.queryExecution.optimizedPlan.toString.contains("graft_theta_distinct"))
        val truth = rows.groupBy(r => (r._1, r._2))
          .view.mapValues(_.map(_._3).distinct.size.toLong).toMap
        val collected = got.collect()
        collected.foreach { r =>
          if (!r.isNullAt(0) && !r.isNullAt(1)) {
            val ex = truth((r.getLong(0), r.getLong(1)))
            assert(math.abs(r.getLong(2) - ex) <= math.max(2L, ex / 50))
          }
        }
        // grand total row present and ~exact
        val total = collected.find(r => r.isNullAt(0) && r.isNullAt(1)).get.getLong(2)
        val exAll = rows.map(_._3).distinct.size.toLong
        assert(math.abs(total - exAll) <= math.max(2L, exAll / 50))
      } finally spark.conf.unset("spark.graft.approxDistinct")
    }
  }
}
