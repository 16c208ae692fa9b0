package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asOf: latest right ≤ left.ts per key; equal ts matches; no-match is null") {
    val quotes = Seq( // key, ts, px
      ("A", 10L, 1.0), ("A", 15L, 2.0), ("A", 25L, 3.0),
      ("B", 50L, 9.0)).toDF("sym", "ts", "px")
    val trades = Seq(
      ("A", 10L, 100L), ("A", 20L, 200L), ("A", 30L, 300L),
      ("B", 40L, 400L), ("C", 5L, 500L)).toDF("sym", "ts", "qty")
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts", "ts",
      rightValueCols = Seq("px"), rightTsAs = "quote_ts")
      .orderBy("sym", "ts").collect()

    // A@10 → quote@10 (equal ts matches); A@20 → quote@15; A@30 → quote@25
    assert(out(0).getLong(3) == 10L && out(0).getDouble(4) == 1.0)
    assert(out(1).getLong(3) == 15L && out(1).getDouble(4) == 2.0)
    assert(out(2).getLong(3) == 25L && out(2).getDouble(4) == 3.0)
    // B@40 precedes B's only quote@50 → null
    assert(out(3).isNullAt(3) && out(3).isNullAt(4))
    // C has no quotes at all → null, row preserved (left join)
    assert(out(4).isNullAt(3))
    assert(out.length == 5)
  }

  test("asOf plan shuffles once on the key, not a range cross product") {
    val l = spark.range(1000).select(($"id" % 10).as("k"), $"id".as("ts"))
    val r = spark.range(100).select(($"id" % 10).as("k"), ($"id" * 7).as("ts"),
      $"id".as("v"))
    val plan = AsOfJoin.asOf(l, r, Seq("k"), "ts", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.toLowerCase.contains("broadcastnestedloop"))
    // exactly one exchange feeding the window sort
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1)
  }
}
