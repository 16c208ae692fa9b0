package graft.core

/** Configuration surface of the engine.
  *
  * Mirrors /root/reference/src/configuration.py (pydantic models):
  * enums at :6-20, `Destination` at :23-35, `Configuration` at :38-55,
  * and the "Validation Error: field: msg, ..." flattening at :57-62.
  * Secrets keep their `#` prefix in JSON; they are redacted from logs
  * (see /root/reference/src/component.py:282).
  */
object AccessMethod extends Enumeration {
  val UnityCatalog: Value  = Value("unity_catalog")
  val DirectStorage: Value = Value("direct_storage")
}

object TableType extends Enumeration {
  val External: Value = Value("external")
  val Native: Value   = Value("native")
}

/** Load modes (/root/reference/src/configuration.py:16-20). `error`
  * maps to Spark's `errorifexists`.
  */
object LoadType extends Enumeration {
  val Error: Value     = Value("error")
  val Append: Value    = Value("append")
  val Overwrite: Value = Value("overwrite")
  val Upsert: Value    = Value("upsert")
}

final case class Destination(
    containerName: String = "",
    blobName: String = "",
    catalog: String = "",
    schemaName: String = "",
    table: String = "",
    tableType: TableType.Value = TableType.External,
    warehouse: String = "",
    mode: LoadType.Value = LoadType.Append,
    partitionBy: Seq[String] = Nil,
    compression: String = "UNCOMPRESSED",
    /** Extension beyond the reference surface: exact-dedup the input on
      * these columns before writing (empty = off). `Nil`-safe: the
      * reference's own sample fixture ships duplicate rows.
      */
    dedupColumns: Seq[String] = Nil,
    /** Extension: hash-bucket the destination table on these columns
      * (empty = off). Pays the key shuffle once at write time; every
      * later join/aggregation on the keys plans with zero exchanges.
      */
    bucketBy: Seq[String] = Nil,
    numBuckets: Int = 0,
    bucketSortBy: Seq[String] = Nil,
)

/** Secret-valued parameters (`#`-prefixed in config.json,
  * /root/reference/src/configuration.py:41-48). A dedicated type whose
  * toString is redacted, so a Config accidentally reaching a log line
  * can never leak credential material (the reference redacts at the
  * query-log site, component.py:282 — here the type makes the
  * redaction structural).
  */
final case class Secrets(
    unityCatalogToken: String = "",
    absSasToken: String = "",
    awsKeySecret: String = "",
    gcpServiceAccountKey: String = "",
) {
  override def toString: String = {
    def m(s: String) = if (s.isEmpty) "\"\"" else "\"--SENSITIVE--\""
    s"Secrets(${m(unityCatalogToken)}, ${m(absSasToken)}, " +
      s"${m(awsKeySecret)}, ${m(gcpServiceAccountKey)})"
  }
}

final case class Config(
    destination: Destination = Destination(),
    accessMethod: AccessMethod.Value = AccessMethod.DirectStorage,
    batchSize: Int = 25000,
    preserveInsertionOrder: Boolean = true,
    debug: Boolean = false,
    threads: Int = 1,
    maxMemoryMb: Int = 256,
    keepStage: Boolean = false,
    /** Storage provider for direct_storage access: "abs" | "s3" | "gcs"
      * (/root/reference/src/component.py:308-330). Empty = local paths.
      */
    provider: String = "",
    unityCatalogUrl: String = "",
    absAccountName: String = "",
    awsRegion: String = "",
    awsKeyId: String = "",
    secrets: Secrets = Secrets(),
) {

  /** Mode gate for external / direct-storage writes
    * (/root/reference/src/component.py:64-68).
    */
  def validateExternalMode(): Unit = {
    val allowed = Set(LoadType.Error, LoadType.Append, LoadType.Overwrite)
    if (!allowed(destination.mode))
      throw UserException(
        s"Unsupported mode for external table: ${destination.mode}. " +
          "Supported modes: error, append, overwrite")
  }

  /** Mode gate for native warehouse writes
    * (/root/reference/src/component.py:178-185).
    */
  def validateNativeMode(): Unit = {
    val allowed = Set(LoadType.Append, LoadType.Overwrite, LoadType.Upsert)
    if (!allowed(destination.mode))
      throw UserException(
        s"Unsupported mode for native table: ${destination.mode}. " +
          "Supported modes: append, overwrite, upsert")
    if (destination.warehouse.isEmpty)
      throw UserException("Warehouse must be specified for native table type.")
  }
}

object Config {
  private val Compressions =
    Set("UNCOMPRESSED", "SNAPPY", "GZIP", "BROTLI", "LZ4", "ZSTD", "LZ4_RAW")

  /** Validates field values, flattening problems into the reference's
    * "Validation Error: field: msg, ..." shape
    * (/root/reference/src/configuration.py:57-62).
    */
  def validated(c: Config): Config = {
    val errors = Seq.newBuilder[String]
    if (c.batchSize <= 0) errors += "batch_size: must be positive"
    if (c.threads <= 0) errors += "threads: must be positive"
    if (c.maxMemoryMb <= 0) errors += "max_memory: must be positive"
    if (!Compressions(c.destination.compression.toUpperCase))
      errors += s"compression: unsupported codec ${c.destination.compression}"
    if (c.destination.bucketBy.nonEmpty && c.destination.numBuckets <= 0)
      errors += "num_buckets: must be positive when bucket_by is set"
    if (c.destination.bucketBy.isEmpty &&
        (c.destination.numBuckets > 0 || c.destination.bucketSortBy.nonEmpty))
      errors += "bucket_by: required when num_buckets or bucket_sort_by is set"
    val es = errors.result()
    if (es.nonEmpty)
      throw UserException("Validation Error: " + es.mkString(", "))
    c
  }

  /** Spark↔parquet codec naming: the reference exposes delta-rs codec
    * names (configRowSchema.json:183-191); Spark's writer option wants
    * lowercase and has no LZ4_RAW/BROTLI on the default classpath —
    * map those to their closest available codec and document.
    */
  def sparkCompression(codec: String): String = codec.toUpperCase match {
    case "UNCOMPRESSED" => "none"
    case "LZ4_RAW"      => "lz4"
    case "BROTLI"       => "gzip" // brotli codec jar not shipped; documented fallback
    case c              => c.toLowerCase
  }
}
