package graft.lake

/** Bucketing (hash-clustering) spec for a lake table, persisted in the
  * log's `metaData.configuration` so every writer and reader of the
  * table agrees on the layout.
  *
  * The contract that makes this work with stock Spark execution:
  * bucket id = `pmod(murmur3_hash(bucketCols), numBuckets)` — which is
  * exactly the partition index `df.repartition(numBuckets, cols)`
  * assigns (both are `HashPartitioning.partitionIdExpression`). So a
  * bucketed write is an ordinary repartition whose task index IS the
  * bucket id, each output file gets Spark's `_NNNNN` bucket-file
  * suffix, and a read that hands `HadoopFsRelation` the matching
  * `BucketSpec` gets a `FileSourceScanExec` that groups files by
  * bucket and reports `HashPartitioning(bucketCols, n)` — at which
  * point joins and aggregations on the bucket keys need NO exchange on
  * that side. At 100 TB that converts every repeated key-join against
  * the table from a full shuffle of both sides into a co-located
  * merge: the shuffle is paid once, at write time.
  */
final case class Bucketing(
    numBuckets: Int,
    columns: Seq[String],
    sortColumns: Seq[String] = Nil) {
  require(numBuckets > 0, "numBuckets must be positive")
  require(columns.nonEmpty, "bucketing requires at least one column")
}

object Bucketing {
  private val NumKey = "graft.bucketing.numBuckets"
  private val ColsKey = "graft.bucketing.columns"
  private val SortKey = "graft.bucketing.sortColumns"

  def toConfig(b: Bucketing): Map[String, String] = Map(
    NumKey -> b.numBuckets.toString,
    ColsKey -> b.columns.mkString(","),
    SortKey -> b.sortColumns.mkString(","))

  def fromConfig(conf: Map[String, String]): Option[Bucketing] =
    conf.get(NumKey).map { n =>
      Bucketing(
        n.toInt,
        conf.getOrElse(ColsKey, "").split(",").toSeq.filter(_.nonEmpty),
        conf.getOrElse(SortKey, "").split(",").toSeq.filter(_.nonEmpty))
    }

  /** Spark's bucket-file suffix (matches BucketingUtils.bucketIdToString,
    * which the scan-side parser inverts).
    */
  def suffix(bucketId: Int): String = f"_$bucketId%05d"

  private val partPrefix = "part-(\\d+)-.*".r

  /** Task/partition index encoded in a parquet part-file name — under a
    * bucketed write this IS the bucket id. A digit run that overflows
    * Int is no index (Try, not toInt: a foreign file must degrade to
    * None, never throw inside a merge).
    */
  def partIndexOf(fileName: String): Option[Int] = fileName match {
    case partPrefix(idx) => scala.util.Try(idx.toInt).toOption
    case _ => None
  }

  private val bucketed = ".*_(\\d+)(?:\\..*)?$".r

  /** Whether Spark's scan-side parser will find a bucket id in the
    * file name (mirror of BucketingUtils.getBucketId).
    */
  def hasBucketSuffix(fileName: String): Boolean = fileName match {
    case bucketed(_) => true
    case _ => false
  }

  /** The bucket id Spark's scan-side parser will assign this file —
    * the `_NNNNN` suffix before the extension (mirror of
    * BucketingUtils.getBucketId; None when the name carries none OR
    * the digit run overflows Int — a live file named like
    * `x_99999999999.parquet` must disqualify pruning, not throw).
    */
  def bucketIdOf(fileName: String): Option[Int] = fileName match {
    case bucketed(id) => scala.util.Try(id.toInt).toOption
    case _ => None
  }
}
