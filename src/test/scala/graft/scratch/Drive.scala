package graft.scratch

import org.apache.spark.sql.SparkSession

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[4]")
        .appName("graft-drive")
        .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    spark.sql("DROP TABLE IF EXISTS graft.default.t1")
    // reference CREATE shape (component.py:216-224), USING graft
    spark.sql("""CREATE TABLE IF NOT EXISTS graft.default.t1
      (id BIGINT, name STRING, price DOUBLE, cat STRING, PRIMARY KEY (id))
      USING graft PARTITIONED BY (cat)""")
    println("created; tables=" + spark.sql("SHOW TABLES IN graft.default").collect().mkString(","))

    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW stg AS
      SELECT * FROM VALUES
        ('1','a','10.0','x'), ('2','b','20.0','y'), ('3','c','30.0','x')
      AS stg(_c0,_c1,_c2,_c3)""")
    // reference INSERT shape (component.py:228-236)
    spark.sql("""INSERT INTO graft.default.t1 SELECT CAST(_c0 AS BIGINT) AS id,
      CAST(_c1 AS STRING) AS name, CAST(_c2 AS DOUBLE) AS price, CAST(_c3 AS STRING) AS cat FROM stg""")
    println("after insert:")
    spark.sql("SELECT * FROM graft.default.t1 ORDER BY id").show()

    // pushdown check
    spark.sql("SELECT name FROM graft.default.t1 WHERE id = 2").explain(true)

    // UPDATE / DELETE
    println("updated=" + spark.sql("UPDATE graft.default.t1 SET price = price * 2 WHERE cat = 'x'").collect().mkString)
    println("deleted=" + spark.sql("DELETE FROM graft.default.t1 WHERE id = 2").collect().mkString)
    spark.sql("SELECT * FROM graft.default.t1 ORDER BY id").show()

    // reference MERGE shape (component.py:249-258)
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW stg2 AS
      SELECT * FROM VALUES
        ('1','a2','11.0','x'), ('4','d','40.0','y')
      AS stg2(_c0,_c1,_c2,_c3)""")
    spark.sql("""
      MERGE INTO graft.default.t1 AS target
      USING stg2 AS source
      ON target.id = CAST(source._c0 AS BIGINT)
      WHEN MATCHED THEN
        UPDATE SET target.id = CAST(source._c0 AS BIGINT), target.name = CAST(source._c1 AS STRING),
                   target.price = CAST(source._c2 AS DOUBLE), target.cat = CAST(source._c3 AS STRING)
      WHEN NOT MATCHED THEN
        INSERT (id, name, price, cat)
        VALUES (CAST(source._c0 AS BIGINT), CAST(source._c1 AS STRING),
                CAST(source._c2 AS DOUBLE), CAST(source._c3 AS STRING))
    """)
    println("after merge:")
    spark.sql("SELECT * FROM graft.default.t1 ORDER BY id").show()

    // INSERT OVERWRITE + SET * merge + NOT MATCHED BY SOURCE
    spark.sql("INSERT OVERWRITE graft.default.t1 SELECT CAST(_c0 AS BIGINT), _c1, CAST(_c2 AS DOUBLE), _c3 FROM stg")
    spark.sql("""
      MERGE INTO graft.default.t1 t USING (SELECT 1 AS id, 'z' AS name, 99.0 AS price, 'x' AS cat) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE AND t.id = 3 THEN DELETE
    """)
    println("after star-merge (expect id1→z, id2 kept, id3 deleted):")
    spark.sql("SELECT * FROM graft.default.t1 ORDER BY id").show()

    println("history=" + graft.lake.LakeTable.forPath(spark,
      graft.SparkEntry.warehouseDir + "/default/t1").historyInfo.map(_.operation).mkString(","))
    spark.stop()
  }
}
