package graft.scratch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Retime {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/testdata/sf1")
    def timeU(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$name%-26s one=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val asStage = o.columns.toSeq.map(c => col(c).cast("string").as(c))
    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      timeU("drop+create") {
        spark.sql("DROP TABLE IF EXISTS graft.default.q59_orders")
        spark.sql("""CREATE TABLE graft.default.q59_orders (
          o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
          o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING,
          PRIMARY KEY (o_orderkey)) USING graft""")
      }
      o.where(col("o_orderkey") % 3 =!= 0).select(asStage: _*)
        .createOrReplaceTempView("q59_stage_seed")
      timeU("insert-1M") {
        spark.sql("""INSERT INTO graft.default.q59_orders
          SELECT CAST(o_orderkey AS BIGINT), CAST(o_custkey AS BIGINT),
                 CAST(o_orderstatus AS STRING), CAST(o_totalprice AS DOUBLE),
                 CAST(o_orderdate AS TIMESTAMP), CAST(o_orderpriority AS STRING)
          FROM q59_stage_seed""")
      }
      o.where(col("o_orderkey") % 5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("o_orderpriority", lit("UPDATED"))
        .select(asStage: _*)
        .createOrReplaceTempView("q59_stage_delta")
      timeU("merge-300k") {
        spark.sql("""MERGE INTO graft.default.q59_orders AS target
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
                    CAST(source.o_orderdate AS TIMESTAMP), CAST(source.o_orderpriority AS STRING))""")
      }
      timeU("final-select") {
        spark.sql("SELECT * FROM graft.default.q59_orders")
          .write.format("noop").mode("overwrite").save()
      }
      // q59 commit-cost decomposition: the same INSERT source written
      // as (a) bare parquet files (no transaction), and (b) computed
      // only (noop sink). insert-1M minus (a) = log append + atomic
      // rename + directory fsync; (a) minus (b) = durable parquet
      // encode+write. That splits the statement-level number into
      // plan / parquet / commit without instrumenting LakeTable.
      val insertSel = spark.sql("""SELECT CAST(o_orderkey AS BIGINT) o_orderkey,
        CAST(o_custkey AS BIGINT) o_custkey, CAST(o_orderstatus AS STRING) o_orderstatus,
        CAST(o_totalprice AS DOUBLE) o_totalprice, CAST(o_orderdate AS TIMESTAMP) o_orderdate,
        CAST(o_orderpriority AS STRING) o_orderpriority FROM q59_stage_seed""")
      timeU("insert-src-noop") {
        insertSel.write.format("noop").mode("overwrite").save()
      }
      timeU("insert-src-parquet") {
        insertSel.write.mode("overwrite").parquet("/tmp/q59_raw_parquet")
      }
    }
    spark.stop()
  }
}
