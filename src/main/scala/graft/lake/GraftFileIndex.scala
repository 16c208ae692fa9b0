package graft.lake

import com.fasterxml.jackson.databind.JsonNode
import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.file.Path

import TransactionLog.{AddFile, Snapshot}

/** Log-backed `FileIndex`: the Spark-native integration point that
  * makes the lake scan plan like a first-class table instead of a
  * path glob (the same role Delta's TahoeLogFileIndex plays).
  *
  * What it buys at 100 TB:
  * - **no LIST calls** — the file set comes from the transaction log;
  * - **partition pruning** — partition filters evaluate against the
  *   log's partitionValues, so pruned partitions cost zero I/O;
  * - **file skipping** — data filters evaluate against per-file
  *   min/max/nullCount stats (FileStats), so a selective predicate
  *   opens only the files whose range intersects it. Row-group
  *   pruning inside parquet still applies after.
  *
  * The skipping evaluator is conservative: a file is dropped only
  * when the predicate is provably false for every row of the file;
  * anything it can't reason about keeps the file.
  */
final class GraftFileIndex(
    spark: SparkSession,
    tablePath: Path,
    snap: Snapshot) extends FileIndex {

  private val partCols: Seq[String] = snap.metadata.partitionColumns
  override val partitionSchema: StructType =
    StructType(partCols.map(c => snap.schema(c)))
  private val dataSchema: StructType =
    StructType(snap.schema.fields.filterNot(f => partCols.contains(f.name)))

  override def rootPaths: Seq[HPath] = Seq(new HPath(tablePath.toUri))
  override def sizeInBytes: Long = snap.files.map(_.size).sum
  override def inputFiles: Array[String] =
    snap.files.map(f => TransactionLog.resolvePath(tablePath, f.path).toUri.toString).toArray
  override def refresh(): Unit = ()

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val afterSkipping = snap.files.filter(f => dataFilters.forall(mayContain(f, _)))
    val groups = afterSkipping.groupBy(_.partitionValues).toSeq
    val pruned =
      if (partitionFilters.isEmpty || partCols.isEmpty) groups
      else {
        val predicate = Predicate.createInterpreted(
          partitionFilters.map(bindPartitionRefs).reduce(And))
        groups.filter { case (pv, _) => predicate.eval(partitionRow(pv)) }
      }
    pruned.map { case (pv, files) =>
      PartitionDirectory(partitionRow(pv), files.toArray.map(fileStatus))
    }
  }

  private def fileStatus(f: AddFile): FileStatus =
    new FileStatus(f.size, false, 1, 128L * 1024 * 1024, f.modificationTime,
      new HPath(TransactionLog.resolvePath(tablePath, f.path).toUri))

  /** Rebinds partition-column attribute references (matched by name)
    * to ordinals in the partitionValues row.
    */
  private def bindPartitionRefs(e: Expression): Expression = e.transform {
    case a: AttributeReference =>
      val i = partCols.indexOf(a.name)
      if (i < 0) Literal(true) // non-partition ref inside a partition filter: keep
      else BoundReference(i, partitionSchema(i).dataType, nullable = true)
  }

  private def partitionRow(pv: Map[String, String]): InternalRow =
    InternalRow.fromSeq(partCols.map { c =>
      val dt = partitionSchema(partCols.indexOf(c)).dataType
      pv.get(c).filter(_ != null) match {
        case None | Some(null) => null
        case Some(s) =>
          Cast(Literal(UTF8String.fromString(s), StringType), dt, Some("UTC")).eval()
      }
    })

  // ---- stats-based skipping ----------------------------------------------

  /** Conservative interval test: false ⇒ no row of `f` can satisfy
    * `filter`.
    */
  private def mayContain(f: AddFile, filter: Expression): Boolean = filter match {
    case And(l, r) => mayContain(f, l) && mayContain(f, r)
    case Or(l, r)  => mayContain(f, l) || mayContain(f, r)
    case EqualTo(a: AttributeReference, Literal(v, dt)) =>
      rangeContains(f, a.name, dt, v, v)
    case EqualTo(Literal(v, dt), a: AttributeReference) =>
      rangeContains(f, a.name, dt, v, v)
    case GreaterThan(a: AttributeReference, Literal(v, dt)) =>
      upperAbove(f, a.name, dt, v, strict = true)
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
      upperAbove(f, a.name, dt, v, strict = false)
    case LessThan(a: AttributeReference, Literal(v, dt)) =>
      lowerBelow(f, a.name, dt, v, strict = true)
    case LessThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
      lowerBelow(f, a.name, dt, v, strict = false)
    case GreaterThan(Literal(v, dt), a: AttributeReference) =>
      lowerBelow(f, a.name, dt, v, strict = true)
    case GreaterThanOrEqual(Literal(v, dt), a: AttributeReference) =>
      lowerBelow(f, a.name, dt, v, strict = false)
    case LessThan(Literal(v, dt), a: AttributeReference) =>
      upperAbove(f, a.name, dt, v, strict = true)
    case LessThanOrEqual(Literal(v, dt), a: AttributeReference) =>
      upperAbove(f, a.name, dt, v, strict = false)
    case In(a: AttributeReference, list) if list.forall(_.isInstanceOf[Literal]) =>
      list.exists { case Literal(v, dt) => rangeContains(f, a.name, dt, v, v) }
    case StartsWith(a: AttributeReference, Literal(prefix, StringType)) if prefix != null =>
      // v.startsWith(p) ⟹ p <= v < nextPrefix(p) under BINARY (UTF-8)
      // order — which is what parquet/UTF8String min/max use; Java
      // String order (UTF-16) disagrees beyond ASCII, so pruning only
      // claims anything for pure-ASCII prefixes (everything else keeps
      // the file, conservatively).
      val pStr = prefix.asInstanceOf[UTF8String].toString
      if (!pStr.forall(c => c < 128)) true
      else {
        val ord = ordering(StringType)
        val pU: Any = UTF8String.fromString(pStr)
        val maxOk = statValue(f.maxValues.get(a.name), StringType)
          .forall(mx => ord.gteq(mx, pU))
        val minOk =
          if (pStr.isEmpty || pStr.last == 127.toChar) true
          else {
            val nextPrefix: Any =
              UTF8String.fromString(pStr.init + (pStr.last + 1).toChar)
            statValue(f.minValues.get(a.name), StringType)
              .forall(mn => ord.lt(mn, nextPrefix))
          }
        minOk && maxOk
      }
    case IsNull(a: AttributeReference) =>
      f.nullCount.get(a.name).forall(_ > 0)
    case IsNotNull(a: AttributeReference) =>
      (f.nullCount.get(a.name), f.numRecords) match {
        case (Some(nulls), Some(n)) => nulls < n
        case _                      => true
      }
    case _ => true
  }

  /** stats(min) <= v <= stats(max), unknown or null bound ⇒ true
    * (a null-literal comparison never prunes — the filter itself
    * evaluates to null, which the scan's own Filter handles).
    */
  private def rangeContains(f: AddFile, col: String, dt: DataType, lo: Any, hi: Any): Boolean = {
    if (lo == null || hi == null) return true
    val ord = ordering(dt)
    val minOk = statValue(f.minValues.get(col), dt).forall(mn => ord.lteq(mn, hi))
    val maxOk = statValue(f.maxValues.get(col), dt).forall(mx => ord.gteq(mx, lo))
    minOk && maxOk
  }

  /** ∃ row > v (or >= v): max above the bound, unknown ⇒ true */
  private def upperAbove(f: AddFile, col: String, dt: DataType, v: Any, strict: Boolean): Boolean =
    v == null || statValue(f.maxValues.get(col), dt).forall { mx =>
      if (strict) ordering(dt).gt(mx, v) else ordering(dt).gteq(mx, v)
    }

  /** ∃ row < v (or <= v): min below the bound, unknown ⇒ true */
  private def lowerBelow(f: AddFile, col: String, dt: DataType, v: Any, strict: Boolean): Boolean =
    v == null || statValue(f.minValues.get(col), dt).forall { mn =>
      if (strict) ordering(dt).lt(mn, v) else ordering(dt).lteq(mn, v)
    }

  private def ordering(dt: DataType): Ordering[Any] =
    TypeUtils.getInterpretedOrdering(dt).asInstanceOf[Ordering[Any]]

  /** Decodes a stats JSON value into Spark's internal representation
    * for `dt` (see FileStats for the encoding). None ⇒ unknown.
    */
  private def statValue(node: Option[JsonNode], dt: DataType): Option[Any] =
    node.flatMap { n =>
      dt match {
        case LongType                  => Some(n.asLong)
        case IntegerType               => Some(n.asInt)
        case ShortType                 => Some(n.asInt.toShort)
        case ByteType                  => Some(n.asInt.toByte)
        case DoubleType                => Some(n.asDouble)
        case FloatType                 => Some(n.asDouble.toFloat)
        case BooleanType               => Some(n.asBoolean)
        case StringType                => Some(UTF8String.fromString(n.asText))
        case TimestampType | TimestampNTZType => Some(n.asLong) // micros
        case DateType                  => Some(n.asInt)  // days
        case _                         => None
      }
    }
}
