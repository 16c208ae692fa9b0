package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Statement-level q59 decomposition at a given SF dir (BENCHNOTES r9 §1).
  * Mirrors BENCHNOTES_r7 §5's protocol: warm rounds, per-statement wall
  * time, min over rounds. Runs the MERGE both merge-on-read (the shipped
  * q59 plan) and copy-on-write (the r7 baseline) on twin tables.
  */
object DriveQ59 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/testdata/sf1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(4)
    val wh = java.nio.file.Files.createTempDirectory("graft-q59drive").toString
    val spark = SparkSession.builder()
      .appName("graft-q59-decomp").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.lake.v2.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val deltaMod = args.lift(2).map(_.toInt).getOrElse(5)
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val asStage = o.columns.toSeq.map(c => col(c).cast("string").as(c))
    o.where(col("o_orderkey") % 3 =!= 0).select(asStage: _*)
      .createOrReplaceTempView("q59_stage_seed")
    o.where(col("o_orderkey") % deltaMod === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("o_orderpriority", lit("UPDATED"))
      .select(asStage: _*)
      .createOrReplaceTempView("q59_stage_delta")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val mergeSql = (t: String) => s"""MERGE INTO graft.default.$t AS target
      USING q59_stage_delta AS source
      ON target.o_orderkey = CAST(source.o_orderkey AS BIGINT)
      WHEN MATCHED THEN UPDATE SET
        target.o_orderkey = CAST(source.o_orderkey AS BIGINT),
        target.o_custkey = CAST(source.o_custkey AS BIGINT),
        target.o_orderstatus = CAST(source.o_orderstatus AS STRING),
        target.o_totalprice = CAST(source.o_totalprice AS DOUBLE),
        target.o_orderdate = CAST(source.o_orderdate AS TIMESTAMP),
        target.o_orderpriority = CAST(source.o_orderpriority AS STRING)
      WHEN NOT MATCHED THEN INSERT
        (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
        VALUES (CAST(source.o_orderkey AS BIGINT), CAST(source.o_custkey AS BIGINT),
                CAST(source.o_orderstatus AS STRING), CAST(source.o_totalprice AS DOUBLE),
                CAST(source.o_orderdate AS TIMESTAMP), CAST(source.o_orderpriority AS STRING))"""
    val insertSql = (t: String) => s"""INSERT INTO graft.default.$t
      SELECT CAST(o_orderkey AS BIGINT), CAST(o_custkey AS BIGINT),
             CAST(o_orderstatus AS STRING), CAST(o_totalprice AS DOUBLE),
             CAST(o_orderdate AS TIMESTAMP), CAST(o_orderpriority AS STRING)
      FROM q59_stage_seed"""
    def createSql(t: String, mode: String) = s"""CREATE TABLE graft.default.$t (
      o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
      o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING,
      PRIMARY KEY (o_orderkey)) USING graft
      TBLPROPERTIES('graft.merge.mode'='$mode')"""

    for (mode <- Seq("merge-on-read", "copy-on-write")) {
      val results = (1 to rounds).map { r =>
        val t = s"q59d_${mode.replace('-', '_')}_$r"
        spark.sql(s"DROP TABLE IF EXISTS graft.default.$t")
        val tCreate = time(spark.sql(createSql(t, mode)))
        val tInsert = time(spark.sql(insertSql(t)))
        val tMerge = time(spark.sql(mergeSql(t)))
        val tRead = time(spark.sql(s"SELECT * FROM graft.default.$t")
          .agg(count("*"), sum(hash(col("o_orderkey"), col("o_totalprice")).cast("long")))
          .collect())
        (tCreate, tInsert, tMerge, tRead)
      }
      def mn(sel: ((Double, Double, Double, Double)) => Double) =
        f"${results.map(sel).min}%.2f"
      println(s"Q59DECOMP mode=$mode rounds=$rounds " +
        s"create=${mn(_._1)} insert=${mn(_._2)} merge=${mn(_._3)} readback=${mn(_._4)} " +
        s"all=${results.map(t => f"(${t._1}%.2f,${t._2}%.2f,${t._3}%.2f,${t._4}%.2f)").mkString(" ")}")
    }
    spark.stop()
  }
}
