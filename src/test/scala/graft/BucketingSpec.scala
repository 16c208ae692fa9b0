package graft

import graft.lake.{Bucketing, LakeTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-bucket").toString

  // String-walk the plan: under AQE the root is AdaptiveSparkPlanExec,
  // whose collect() doesn't descend, but toString prints the whole tree.
  private def countExchanges(df: DataFrame): Int =
    "(?m)^\\s*[+:]?-? ?(Exchange|BroadcastExchange)".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  private def sorted(df: DataFrame): Seq[(Long, String)] =
    df.select("k", "v").as[(Long, String)].collect().sorted.toSeq

  test("bucketed write round-trips and every file's rows hash to its bucket") {
    val dir = tmp()
    val data = (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    val t = LakeTable.forPath(spark, dir)
    t.write(data, "overwrite", bucketBy = Some(Bucketing(4, Seq("k"))))
    assert(t.bucketing.contains(Bucketing(4, Seq("k"))))
    assert(sorted(t.read()) == sorted(data))
    // physical check: each file name carries its bucket id, and the
    // rows inside hash (murmur3, Spark semantics) to exactly that id
    val files = t.snapshotNow.files
    assert(files.nonEmpty)
    files.foreach { f =>
      val name = f.path.substring(f.path.lastIndexOf('/') + 1)
      assert(Bucketing.hasBucketSuffix(name), s"unbucketed file name: $name")
      val id = "_(\\d+)\\.".r.findFirstMatchIn(name).get.group(1).toInt
      val rows = spark.read.parquet(s"$dir/${f.path}")
        .select(pmod(hash(col("k")), lit(4)).as("b")).distinct().as[Int].collect()
      assert(rows.toSeq == Seq(id), s"file $name contains foreign buckets")
    }
  }

  test("co-located join of two bucketed tables: zero shuffle exchanges") {
    val dirA = tmp(); val dirB = tmp()
    val a = (1L to 2000L).map(i => (i, s"a$i")).toDF("k", "v")
    val b = (1L to 2000L by 2).map(i => (i, s"b$i")).toDF("k", "v")
    LakeTable.forPath(spark, dirA).write(a, "overwrite", bucketBy = Some(Bucketing(4, Seq("k"))))
    LakeTable.forPath(spark, dirB).write(b, "overwrite", bucketBy = Some(Bucketing(4, Seq("k"))))
    val ta = LakeTable.forPath(spark, dirA).read()
    val tb = LakeTable.forPath(spark, dirB).read()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ta.join(tb.withColumnRenamed("v", "v2"), "k")
      assert(countExchanges(joined) == 0,
        s"expected shuffle-free co-located join:\n${joined.queryExecution.executedPlan}")
      // either shuffle-based join operator is fine — the point is the
      // partitioning came from the files, not an Exchange
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("SortMergeJoin") || planStr.contains("ShuffledHashJoin"),
        planStr)
      assert(joined.count() == 1000L)
      // aggregation on the bucket key also needs no exchange
      val agg = ta.groupBy("k").agg(count(lit(1)))
      assert(countExchanges(agg) == 0)
      // ...but a join on a NON-bucket column still shuffles (sanity
      // that the partitioning claim is key-specific, not blanket)
      val off = ta.join(
        tb.withColumnRenamed("k", "k2").withColumnRenamed("v", "v2"),
        $"v" === $"v2")
      assert(countExchanges(off) > 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("append inherits the layout; conflicting layout is rejected") {
    val dir = tmp()
    val t = LakeTable.forPath(spark, dir)
    t.write((1L to 100L).map(i => (i, "x")).toDF("k", "v"), "overwrite",
      bucketBy = Some(Bucketing(4, Seq("k"))))
    t.write((101L to 200L).map(i => (i, "y")).toDF("k", "v"), "append")
    assert(t.read().count() == 200)
    assert(t.snapshotNow.files.forall(f =>
      Bucketing.hasBucketSuffix(f.path.substring(f.path.lastIndexOf('/') + 1))))
    val err = intercept[graft.core.UserException] {
      t.write(Seq((1L, "z")).toDF("k", "v"), "append",
        bucketBy = Some(Bucketing(8, Seq("k"))))
    }
    assert(err.getMessage.contains("does not match table layout"))
    // introducing bucketing by APPENDING to an unbucketed table is
    // rejected (the old suffix-less files could never satisfy it)
    val dir2 = tmp()
    val t2 = LakeTable.forPath(spark, dir2)
    t2.write(Seq((1L, "a")).toDF("k", "v"), "overwrite")
    val err2 = intercept[graft.core.UserException] {
      t2.write(Seq((2L, "b")).toDF("k", "v"), "append",
        bucketBy = Some(Bucketing(4, Seq("k"))))
    }
    assert(err2.getMessage.contains("unbucketed"))
  }

  test("merge and compaction preserve the bucketed layout") {
    val dir = tmp()
    val t = LakeTable.forPath(spark, dir)
    t.write((1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"), "overwrite",
      bucketBy = Some(Bucketing(4, Seq("k"))))
    t.write((101L to 150L).map(i => (i, s"v$i")).toDF("k", "v"), "append")
    t.merge(Seq((1L, "UPD"), (999L, "NEW")).toDF("k", "v"), Seq("k"))
    assert(t.read().where($"k" === 1L).select("v").as[String].collect().toSeq == Seq("UPD"))
    assert(t.read().count() == 151)
    t.compact(minFilesPerPartition = 2)
    assert(t.read().count() == 151)
    assert(t.snapshotNow.files.forall(f =>
      Bucketing.hasBucketSuffix(f.path.substring(f.path.lastIndexOf('/') + 1))))
    // after compaction the table still joins shuffle-free
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val self = t.read().join(t.read().withColumnRenamed("v", "v2"), "k")
      assert(countExchanges(self) == 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    // clustering compactions refuse to break the layout
    intercept[graft.core.UserException](t.compactSorted(Seq("v")))
    intercept[graft.core.UserException](t.compactZOrder(Seq("k", "v")))
  }

  test("merge on a key-bucketed target: probe prunes to source buckets, target never shuffles") {
    val dir = tmp()
    val t = LakeTable.forPath(spark, dir)
    val data = (1L to 4000L).map(i => (i, s"v$i")).toDF("k", "v")
    t.write(data, "overwrite", bucketBy = Some(Bucketing(8, Seq("k"))))
    val before = t.snapshotNow.files.map(_.path).toSet
    assert(before.size >= 8)

    // source keys confined to ONE bucket (Spark's own hash picks it)
    def bucketOf(k: Long): Int =
      Seq(k).toDF("k").select(pmod(hash($"k"), lit(8))).as[Int].head()
    val b0 = bucketOf(1L)
    val updKeys = (1L to 4000L).filter(bucketOf(_) == b0).take(40)
    val newKey = (4001L to 5000L).find(bucketOf(_) == b0).get
    val source = (updKeys.map(k => (k, "UPD")) :+ (newKey, "NEW")).toDF("k", "v")

    t.merge(source, Seq("k"))
    // correctness first
    assert(t.read().where($"k".isin(updKeys: _*)).select("v")
      .as[String].collect().forall(_ == "UPD"))
    assert(t.read().where($"k" === newKey).select("v").as[String].head() == "NEW")
    assert(t.read().count() == 4001)
    // bucket-derived pruning: every file the merge REMOVED lives in the
    // source's bucket — files of the other 7 buckets were never
    // rewritten (and therefore never probed: the probe scan list is cut
    // before any row is read)
    val after = t.snapshotNow.files.map(_.path).toSet
    val removed = before -- after
    assert(removed.nonEmpty)
    removed.foreach { p =>
      val name = p.substring(p.lastIndexOf('/') + 1)
      assert(Bucketing.bucketIdOf(name).contains(b0),
        s"merge rewrote a file outside the source bucket: $p")
    }
    assert((before -- removed).subsetOf(after), "untouched-bucket files must survive")

    // plan shape of the probe join on a bucketed target: the TARGET
    // side arrives HashPartitioning'd from the files, so the one
    // exchange is the (small) source side — and a source staged in an
    // IDENTICALLY bucketed table probes with ZERO exchanges total
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = t.read().join(source.select("k"), Seq("k"), "left_semi")
      assert(countExchanges(probe) == 1,
        s"expected exactly the source-side exchange:\n${probe.queryExecution.executedPlan}")
      val srcDir = tmp()
      LakeTable.forPath(spark, srcDir).write(source, "overwrite",
        bucketBy = Some(Bucketing(8, Seq("k"))))
      val coProbe = t.read().join(
        LakeTable.forPath(spark, srcDir).read().select("k"), Seq("k"), "left_semi")
      assert(countExchanges(coProbe) == 0,
        s"co-bucketed probe must be exchange-free:\n${coProbe.queryExecution.executedPlan}")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    // merge-on-read targets take the same pruned probe: only the
    // source bucket's files gain DV entries
    val dir2 = tmp()
    val t2 = LakeTable.forPath(spark, dir2)
    t2.write(data, "overwrite", bucketBy = Some(Bucketing(8, Seq("k"))))
    t2.alterSetProperties(Map("graft.merge.mode" -> "merge-on-read"))
    t2.merge(source, Seq("k"))
    assert(t2.read().where($"k".isin(updKeys: _*)).select("v")
      .as[String].collect().forall(_ == "UPD"))
    assert(t2.read().count() == 4001)
    val dvFiles = t2.snapshotNow.files.filter(_.dv.isDefined).map(_.path)
    assert(dvFiles.nonEmpty)
    dvFiles.foreach { p =>
      val name = p.substring(p.lastIndexOf('/') + 1)
      assert(Bucketing.bucketIdOf(name).contains(b0),
        s"MoR merge deleted rows outside the source bucket: $p")
    }
  }

  test("SQL surface: CLUSTERED BY DDL, INSERT inherits, MERGE INTO probe prunes") {
    spark.sql("DROP TABLE IF EXISTS graft.default.bspec_sql")
    spark.sql("""CREATE TABLE graft.default.bspec_sql (k BIGINT, v STRING)
      USING graft CLUSTERED BY (k) INTO 8 BUCKETS""")
    val dir = s"${graft.SparkEntry.warehouseDir}/default/bspec_sql"
    val t = LakeTable.forPath(spark, dir)
    assert(t.bucketing.contains(Bucketing(8, Seq("k"))),
      "CLUSTERED BY must record the layout in table config")
    (1L to 4000L).map(i => (i, s"v$i")).toDF("k", "v")
      .createOrReplaceTempView("bspec_src")
    spark.sql("INSERT INTO graft.default.bspec_sql SELECT * FROM bspec_src")
    // every inserted file carries a bucket suffix (layout inherited)
    val before = t.snapshotNow.files.map(_.path).toSet
    assert(before.nonEmpty && before.forall(p =>
      Bucketing.hasBucketSuffix(p.substring(p.lastIndexOf('/') + 1))))
    // INSERT OVERWRITE keeps the DDL-declared layout
    spark.sql(
      "INSERT OVERWRITE graft.default.bspec_sql SELECT k, v FROM bspec_src")
    assert(t.bucketing.contains(Bucketing(8, Seq("k"))))
    assert(t.snapshotNow.files.forall(p =>
      Bucketing.hasBucketSuffix(p.path.substring(p.path.lastIndexOf('/') + 1))))

    // MERGE INTO with an equi-key ON: the probe prunes to the source
    // buckets even through the SQL path (general-condition extraction)
    def bucketOf(k: Long): Int =
      Seq(k).toDF("k").select(pmod(hash($"k"), lit(8))).as[Int].head()
    val b0 = bucketOf(1L)
    val updKeys = (1L to 4000L).filter(bucketOf(_) == b0).take(30)
    val newKey = (4001L to 5000L).find(bucketOf(_) == b0).get
    (updKeys.map(k => (k, "UPD")) :+ (newKey, "NEW")).toDF("k", "v")
      .createOrReplaceTempView("bspec_delta")
    val preMerge = t.snapshotNow.files.map(_.path).toSet
    spark.sql("""MERGE INTO graft.default.bspec_sql AS tgt
      USING bspec_delta AS s ON tgt.k = s.k
      WHEN MATCHED THEN UPDATE SET tgt.v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val postMerge = t.snapshotNow.files.map(_.path).toSet
    val removed = preMerge -- postMerge
    assert(removed.nonEmpty)
    removed.foreach { p =>
      val name = p.substring(p.lastIndexOf('/') + 1)
      assert(Bucketing.bucketIdOf(name).contains(b0),
        s"SQL MERGE rewrote a file outside the source bucket: $p")
    }
    // correctness
    assert(spark.sql(
      s"SELECT v FROM graft.default.bspec_sql WHERE k = ${updKeys.head}")
      .as[String].head() == "UPD")
    assert(spark.sql(
      s"SELECT v FROM graft.default.bspec_sql WHERE k = $newKey")
      .as[String].head() == "NEW")
    assert(spark.sql("SELECT COUNT(*) FROM graft.default.bspec_sql")
      .as[Long].head() == 4001L)
    spark.sql("DROP TABLE graft.default.bspec_sql")
  }

  test("MERGE INTO bucket pruning: transformed keys prune correctly; NOT MATCHED BY SOURCE disables it") {
    spark.sql("DROP TABLE IF EXISTS graft.default.bspec_adv")
    spark.sql("""CREATE TABLE graft.default.bspec_adv (k BIGINT, v STRING)
      USING graft CLUSTERED BY (k) INTO 8 BUCKETS""")
    (1L to 1000L).map(i => (i, "old")).toDF("k", "v")
      .createOrReplaceTempView("bspec_adv_seed")
    spark.sql("INSERT INTO graft.default.bspec_adv SELECT * FROM bspec_adv_seed")

    // 1) equi on a TRANSFORMED source key (ON t.k = s.k0 + 10): the
    //    pruning hashes the source EXPRESSION's values — matched rows
    //    11,12,13 must update even though s.k0 itself is 1,2,3
    Seq(1L, 2L, 3L).map(i => (i, "m")).toDF("k0", "nv")
      .createOrReplaceTempView("bspec_adv_d1")
    spark.sql("""MERGE INTO graft.default.bspec_adv AS t
      USING bspec_adv_d1 AS s ON t.k = s.k0 + 10
      WHEN MATCHED THEN UPDATE SET t.v = s.nv""")
    assert(spark.sql(
      "SELECT count(*) FROM graft.default.bspec_adv WHERE v = 'm'")
      .as[Long].head() == 3L)
    assert(spark.sql(
      "SELECT collect_set(v) FROM graft.default.bspec_adv WHERE k IN (11,12,13)")
      .as[Seq[String]].head() == Seq("m"))

    // 2) NOT MATCHED BY SOURCE must reach rows in EVERY bucket — the
    //    pruning is disabled for it (an unmatched target row can live
    //    anywhere); a wrongly-pruned probe would leave other buckets'
    //    rows untouched
    Seq(11L, 12L, 13L).map(i => (i, "m2")).toDF("k", "nv")
      .createOrReplaceTempView("bspec_adv_d2")
    spark.sql("""MERGE INTO graft.default.bspec_adv AS t
      USING bspec_adv_d2 AS s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET t.v = s.nv
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.v = 'nms'""")
    assert(spark.sql(
      "SELECT count(*) FROM graft.default.bspec_adv WHERE v = 'nms'")
      .as[Long].head() == 997L)
    assert(spark.sql(
      "SELECT count(*) FROM graft.default.bspec_adv WHERE v = 'm2'")
      .as[Long].head() == 3L)

    // 3) non-equi ON: no conjunct pins the bucket column -> no pruning;
    //    correctness must hold across buckets (single source row keeps
    //    the ANSI cardinality rule satisfiable: each target row matches
    //    at most one source row)
    Seq((998L, "hi")).toDF("lo", "nv").createOrReplaceTempView("bspec_adv_d3")
    spark.sql("""MERGE INTO graft.default.bspec_adv AS t
      USING bspec_adv_d3 AS s ON t.k > s.lo
      WHEN MATCHED THEN UPDATE SET t.v = s.nv""")
    assert(spark.sql(
      "SELECT collect_set(v) FROM graft.default.bspec_adv WHERE k > 998")
      .as[Seq[String]].head() == Seq("hi"))
    assert(spark.sql(
      "SELECT count(*) FROM graft.default.bspec_adv WHERE v = 'hi'")
      .as[Long].head() == 2L)
    spark.sql("DROP TABLE graft.default.bspec_adv")
  }

  test("merge into an empty bucket: pruned-to-nothing probe still inserts (CoW and MoR)") {
    // 64 buckets over 6 rows leaves most buckets file-less; a source
    // key hashing into one of those prunes the probe scan list to
    // EMPTY — the merge must still insert, not lose the row
    def bucketOf(k: Long, n: Int): Int =
      Seq(k).toDF("k").select(pmod(hash($"k"), lit(n))).as[Int].head()
    val seed = (1L to 6L).map(i => (i, s"v$i")).toDF("k", "v")
    val occupied = (1L to 6L).map(bucketOf(_, 64)).toSet
    val newKey = (100L to 1000L).find(k => !occupied(bucketOf(k, 64))).get
    for (mor <- Seq(false, true)) {
      val dir = tmp()
      val t = LakeTable.forPath(spark, dir)
      t.write(seed, "overwrite", bucketBy = Some(Bucketing(64, Seq("k"))))
      if (mor) t.alterSetProperties(Map("graft.merge.mode" -> "merge-on-read"))
      t.merge(Seq((newKey, "NEW")).toDF("k", "v"), Seq("k"))
      assert(t.read().count() == 7, s"mor=$mor lost the insert")
      assert(t.read().where($"k" === newKey).select("v")
        .as[String].head() == "NEW")
      // and the insert landed with the layout intact (bucket suffix)
      assert(t.snapshotNow.files.forall(f =>
        Bucketing.hasBucketSuffix(f.path.substring(f.path.lastIndexOf('/') + 1))))
    }
  }

  test("add-column evolution on a bucketed table keeps the layout live") {
    val dir = tmp()
    val t = LakeTable.forPath(spark, dir)
    t.write((1L to 200L).map(i => (i, s"v$i")).toDF("k", "v"), "overwrite",
      bucketBy = Some(Bucketing(4, Seq("k"))))
    t.alterAddColumn("score", org.apache.spark.sql.types.DoubleType)
    t.write(Seq((201L, "x", 1.5)).toDF("k", "v", "score"), "append")
    assert(t.read().count() == 201)
    assert(t.read().where($"score".isNotNull).count() == 1)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = t.read().join(
        t.read().select($"k", $"v".as("v2")), "k")
      assert(countExchanges(j) == 0, j.queryExecution.executedPlan.toString)
      assert(j.count() == 201)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("null bucket keys route consistently and round-trip") {
    val dir = tmp()
    val data = Seq((Some(1L), "a"), (None, "n1"), (Some(2L), "b"), (None, "n2"))
      .toDF("k", "v")
    val t = LakeTable.forPath(spark, dir)
    t.write(data, "overwrite", bucketBy = Some(Bucketing(4, Seq("k"))))
    val back = t.read()
    assert(back.count() == 4)
    assert(back.where($"k".isNull).count() == 2)
    // all null-key rows hash to one bucket → live in files of a single bucket id
    val nullFiles = back.where($"k".isNull)
      .select(col("_metadata.file_path")).distinct().collect().map(_.getString(0))
    val ids = nullFiles.map(p => "_(\\d+)\\.".r.findFirstMatchIn(
      p.substring(p.lastIndexOf('/') + 1)).get.group(1).toInt).toSet
    assert(ids.size == 1)
  }

  test("sorted buckets: merge join runs without per-side Sort") {
    val dirA = tmp(); val dirB = tmp()
    val a = (1L to 3000L).map(i => (i, s"a$i")).toDF("k", "v")
    val b = (1L to 3000L by 3).map(i => (i, s"b$i")).toDF("k", "v2")
    LakeTable.forPath(spark, dirA).write(a, "overwrite",
      bucketBy = Some(Bucketing(4, Seq("k"), sortColumns = Seq("k"))))
    LakeTable.forPath(spark, dirB).write(b, "overwrite",
      bucketBy = Some(Bucketing(4, Seq("k"), sortColumns = Seq("k"))))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    // ordering claims from bucket sort columns sit behind this flag
    // (SPARK-28595); the scan itself still only claims order when each
    // bucket is a single file, which our write produced — so the claim
    // is sound here
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val j = LakeTable.forPath(spark, dirA).read()
        .join(LakeTable.forPath(spark, dirB).read(), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(countExchanges(j) == 0, plan)
      // one file per bucket + recorded sort columns → the scan reports
      // outputOrdering, so SortMergeJoin needs no Sort on either side
      if (plan.contains("SortMergeJoin"))
        assert(!"(?m)^\\s*[+:]?-? ?Sort ".r.findFirstIn(plan).isDefined, plan)
      assert(j.count() == 1000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.join.preferSortMergeJoin")
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("bucket suffix parsing: overflow digit runs are no bucket id") {
    // a foreign file named like x_99999999999.parquet must degrade to
    // None (disqualifying pruning / the BucketSpec), never throw a
    // NumberFormatException inside a merge
    assert(Bucketing.bucketIdOf("x_99999999999.parquet").isEmpty)
    assert(Bucketing.bucketIdOf("part-00001-abc_00007.snappy.parquet").contains(7))
    assert(Bucketing.partIndexOf("part-99999999999-abc.parquet").isEmpty)
    assert(Bucketing.partIndexOf("part-00012-abc.parquet").contains(12))
  }

  test("un-coerced programmatic MERGE condition with mismatched key types never mis-prunes") {
    // mergeInto is a public API: a programmatic MergeSpec condition is
    // NOT analyzer-coerced, so `target(k): INT === source(sk): LONG`
    // reaches the bucket-pruning extractor with a bare INT target
    // attribute against a LONG source attr. Murmur3 is type-dependent
    // (hash(1) != hash(1L)) — hashing the LONG values would prune
    // buckets holding real matches: silently lost updates plus
    // duplicate inserts. The type guard must fall back to the
    // unpruned probe instead.
    import graft.lake.{MergeClause, MergeSpec}
    val dir = tmp()
    val t = LakeTable.forPath(spark, dir)
    val data = (1 to 4000).map(i => (i, s"v$i")).toDF("k", "v") // k: INT
    t.write(data, "overwrite", bucketBy = Some(Bucketing(8, Seq("k"))))
    val source = (1L to 40L).map(i => (i, "UPD")).toDF("sk", "nv") // sk: LONG
    // sanity of the fixture: at least one key buckets differently as
    // LONG than as INT, so a mis-typed pruning WOULD drop real matches
    val intBuckets = (1 to 40).map(k =>
      Seq(k).toDF("k").select(pmod(hash($"k"), lit(8))).as[Int].head())
    val longBuckets = (1L to 40L).map(k =>
      Seq(k).toDF("k").select(pmod(hash($"k"), lit(8))).as[Int].head())
    assert(intBuckets != longBuckets, "fixture no longer exercises the type split")
    t.mergeInto(source) { (target, s) =>
      MergeSpec(
        target("k") === s("sk"),
        matched = Seq(MergeClause.Update(None, Map("v" -> s("nv")))),
        notMatched = Seq(MergeClause.Insert(None,
          Map("k" -> s("sk"), "v" -> s("nv")))),
        notMatchedBySource = Nil)
    }
    val got = t.read().where($"k" <= 40).select("v").as[String].collect()
    assert(got.length == 40 && got.forall(_ == "UPD"),
      s"lost updates: ${got.count(_ != "UPD")} of 40 rows kept their old value")
    assert(t.read().count() == 4000, "duplicate inserts: matched rows were re-inserted")
  }

  test("foreign out-of-range bucket suffix: rows stay readable, merges fall back to the full probe") {
    // A live file whose name parses to bucket 99 of an 8-bucket layout
    // can never be hashed into by any source row. If the layout were
    // still trusted: (a) Spark's bucketed read tabulates groups
    // 0..n-1, so the file's rows VANISH from every scan; (b) the
    // pruned merge probe never reads it, silently missing matches.
    // Both paths must instead degrade to the unbucketed plan.
    import graft.lake.TransactionLog
    for (suffix <- Seq("00099", "99999999999")) { // out-of-range; Int overflow
      val dir = tmp()
      val t = LakeTable.forPath(spark, dir)
      t.write((1L to 4000L).map(i => (i, s"v$i")).toDF("k", "v"),
        "overwrite", bucketBy = Some(Bucketing(8, Seq("k"))))
      // stage ten extra rows as a plain parquet and graft it into the
      // log under a foreign bucket-suffixed name
      val stage = tmp()
      (4001L to 4010L).map(i => (i, s"v$i")).toDF("k", "v")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val foreign = s"foreign_$suffix.parquet"
      java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(dir, foreign))
      val table = java.nio.file.Paths.get(dir)
      assert(TransactionLog.tryCommit(table, TransactionLog.latestVersion(table) + 1,
        Seq(TransactionLog.addAction(TransactionLog.AddFile(
          foreign, Map.empty, java.nio.file.Files.size(part.toPath),
          System.currentTimeMillis())))))
      // (a) no vanishing rows: the scan must not trust the layout
      assert(t.read().count() == 4010, s"suffix=$suffix dropped the foreign file's rows")
      // (b) merge updates a row INSIDE the foreign file (4005) and one
      // in a regular bucket (1) — the probe must not be bucket-pruned
      t.merge(Seq((4005L, "UPD"), (1L, "UPD")).toDF("k", "v"), Seq("k"))
      assert(t.read().where($"k".isin(1L, 4005L)).select("v")
        .as[String].collect().toSeq == Seq("UPD", "UPD"))
      assert(t.read().count() == 4010)
    }
  }

  test("format(\"graft\") writer honors bucketing options") {
    val dir = tmp()
    (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
      .write.format("graft")
      .option("numBuckets", "2").option("bucketBy", "k")
      .mode("overwrite").save(dir)
    val t = LakeTable.forPath(spark, dir)
    assert(t.bucketing.contains(Bucketing(2, Seq("k"))))
    assert(spark.read.format("graft").load(dir).count() == 100)
  }
}
