package graft

import graft.lake.LakeTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-cdc").toString

  test("changes() returns only rows appended after the cursor, tagged by version") {
    val dir = tmp()
    val t = LakeTable.forPath(spark, dir)
    t.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "overwrite") // v0
    val cursor = t.version
    t.write(Seq((3L, "c")).toDF("id", "v"), "append") // v1
    t.write(Seq((4L, "d"), (5L, "e")).toDF("id", "v"), "append") // v2
    val got = t.changes(cursor).orderBy("id")
      .select("id", "v", "_commit_version")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((3L, "c", cursor + 1), (4L, "d", cursor + 2), (5L, "e", cursor + 2)))
    // bounded range
    assert(t.changes(cursor, cursor + 1).select("id").as[Long].collect().toSeq == Seq(3L))
    // empty range
    assert(t.changes(t.version).isEmpty)
    // schema carries the tag column
    assert(t.changes(cursor).columns.toSeq == Seq("id", "v", "_commit_version"))
  }

  test("compaction is invisible to incremental readers (dataChange=false)") {
    val dir = tmp()
    val t = LakeTable.forPath(spark, dir)
    t.write(Seq((1L, "a")).toDF("id", "v"), "overwrite")
    t.write(Seq((2L, "b")).toDF("id", "v"), "append")
    t.write(Seq((3L, "c")).toDF("id", "v"), "append")
    val cursor = t.version
    assert(t.compact(minFilesPerPartition = 2) > 0)
    assert(t.changes(cursor).isEmpty,
      "compaction rewrote files but must not re-emit their rows")
    // full-snapshot read unaffected
    assert(t.read().count() == 3)
  }

  test("changes() on a hive-partitioned table resolves partition columns") {
    val dir = tmp()
    val t = LakeTable.forPath(spark, dir)
    t.write(Seq((1L, "x", "p1"), (2L, "y", "p2")).toDF("id", "v", "p"),
      "overwrite", partitionBy = Seq("p"))
    val cursor = t.version
    t.write(Seq((3L, "z", "p1"), (4L, "w", "p3")).toDF("id", "v", "p"), "append")
    val got = t.changes(cursor).orderBy("id")
      .select("id", "p", "_commit_version")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((3L, "p1", cursor + 1), (4L, "p3", cursor + 1)))
  }

  test("one task writing several partition dirs does not duplicate CDC rows") {
    // the dynamic-partition writer reuses one base file name across the
    // partition dirs a single task writes — the name-keyed version
    // lookup must dedupe or the join doubles every row of those files
    val dir = tmp()
    val t = LakeTable.forPath(spark, dir)
    t.write(Seq((0L, "seed", "p0")).toDF("id", "v", "p"), "overwrite",
      partitionBy = Seq("p"))
    val cursor = t.version
    t.write((1L to 6L).map(i => (i, s"v$i", s"p${i % 3}")).toDF("id", "v", "p")
      .coalesce(1), "append")
    val got = t.changes(cursor).select("id").as[Long].collect().toSeq.sorted
    assert(got == (1L to 6L), s"got $got")
  }

  test("changes() respects column mapping after a rename") {
    val dir = tmp()
    val t = LakeTable.forPath(spark, dir)
    t.write(Seq((1L, "a")).toDF("id", "v"), "overwrite")
    t.alterRenameColumn("v", "body")
    val cursor = t.version
    t.write(Seq((2L, "b")).toDF("id", "body"), "append")
    val got = t.changes(cursor).select("id", "body", "_commit_version")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((2L, "b", cursor + 1)))
  }

  test("changes() on a bucketed table tags appended rows correctly") {
    val dir = tmp()
    val t = LakeTable.forPath(spark, dir)
    t.write((1L to 50L).map(i => (i, s"v$i")).toDF("k", "v"), "overwrite",
      bucketBy = Some(graft.lake.Bucketing(4, Seq("k"))))
    val cursor = t.version
    t.write((51L to 60L).map(i => (i, s"v$i")).toDF("k", "v"), "append")
    val got = t.changes(cursor).select("k", "_commit_version")
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == (51L to 60L).map(i => (i, cursor + 1)))
  }

  test("merge rewrites surface as re-adds (documented copy-on-write semantics)") {
    val dir = tmp()
    val t = LakeTable.forPath(spark, dir)
    t.write((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"), "overwrite")
    val cursor = t.version
    t.merge(Seq((1L, "UPD"), (99L, "NEW")).toDF("id", "v"), Seq("id"))
    val emitted = t.changes(cursor).select("id").as[Long].collect().toSet
    // the updated key and the new key are both present; cohabitants of
    // the rewritten file re-emit too (consumers dedupe by PK)
    assert(emitted.contains(1L) && emitted.contains(99L))
  }

  test("merge-on-read DV commits: only appended rows emit; re-adds with vectors stay silent") {
    val dir = tmp()
    val t = LakeTable.forPath(spark, dir)
    t.write((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"), "overwrite")
    t.alterSetProperties(Map("graft.merge.mode" -> "merge-on-read"))
    val cursor = t.version
    t.merge((1L to 120L by 3).map(i => (i, "UPD")).toDF("id", "v"), Seq("id"))
    val emitted = t.changes(cursor).select("id", "v").as[(Long, String)].collect().toSeq
    // EXACTLY the source rows: the DV re-add of the touched file is
    // dataChange=false, so its 100 physical rows do not re-emit (the
    // copy-on-write path re-emits cohabitants; merge-on-read is
    // strictly cleaner for CDC consumers)
    assert(emitted.size == (1L to 120L by 3).size)
    assert(emitted.forall(_._2 == "UPD"))
    // versioned reads on either side of the DV commit stay exact
    assert(t.read(versionAsOf = cursor).where($"v" === "UPD").count() == 0)
    assert(t.read().where($"v" =!= "UPD").count() == 100 - (1L to 100L by 3).size)
    // a later OPTIMIZE (materializing the DVs) is invisible to CDC,
    // same as any compaction
    val c2 = t.version
    assert(t.compact() > 0)
    assert(t.changes(c2).count() == 0)
  }

  test("RESTORE re-adding an in-range file does not multiply its rows") {
    val dir = tmp()
    val t = LakeTable.forPath(spark, dir)
    t.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "overwrite") // v0: file A
    t.write(Seq((3L, "c")).toDF("id", "v"), "overwrite")            // v1: remove A, add B
    t.restore(0L)                                                   // v2: re-add A, remove B
    // A's path is added at v0 AND v2 — without per-path dedupe the
    // scan lists it twice and the version lookup matches twice (4x)
    val got = t.changes(-1L).orderBy("id")
      .select("id", "_commit_version").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 1L)))
  }
}
