package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Per-query `.explain("formatted")` dumps for optimization-round
  * evidence (`plans/rNN/<query>_<tag>.txt`): the judge checks plan
  * claims (Exchange counts, join strategy, PushedFilters/ReadSchema)
  * against these files without running Spark.
  *
  *   sbt "runMain graft.DumpQueryPlans <outDir> <tag> <sfDir> <q>..."
  *
  * Each query is EXECUTED first (toRdd.foreach on its own
  * QueryExecution) so AQE finalizes the plan; the dump then carries
  * both the formatted initial plan (operator details: pushed filters,
  * read schema) and the final adaptive plan (runtime join/coalesce
  * decisions) — the formatted mode alone prints isFinalPlan=false
  * shapes for adaptive queries.
  *
  * Unlike Bench this runs each query ONCE, unlabeled and ungated: it
  * is plan evidence, not a timing.
  */
object DumpQueryPlans {
  def main(args: Array[String]): Unit = {
    // validate argc and query names BEFORE the session spins up: an
    // unknown name used to throw a raw NoSuchElementException with
    // the JVM already warm (ADVICE r17)
    if (args.length < 4) {
      System.err.println(
        "usage: DumpQueryPlans <outDir> <tag> <sfDir> <query>...")
      sys.exit(2)
    }
    val outDir = args(0)
    val tag = args(1)
    val sfDir = args(2)
    val names = args.drop(3)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}\n" +
        s"known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.toRdd.foreach(_ => ())
      val formatted = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      val finalPlan = df.queryExecution.executedPlan.toString()
      Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"),
        s"== explain(formatted), $sfDir ==\n$formatted\n" +
          s"== executed plan after AQE finalization ==\n$finalPlan\n")
      println(s"[plans] $name -> $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
