package graft.runner

import graft.core.{AccessMethod, Config, UserException}
import org.apache.spark.sql.SparkSession

/** Storage-credential resolution seam (S4 / C6 / C7 in SURVEY.md §2).
  *
  * The reference builds a delta-rs `storage_options` map + table URI
  * per provider (/root/reference/src/component.py:301-351) and, for
  * unity_catalog access, exchanges the UC table id for temporary
  * credentials (:117-133). The sandbox has no network, so the seam is
  * what ships: resolution is a pure Config → [[StorageCredentials]]
  * mapping behind [[CredentialProvider]], the UC path takes its client
  * as the [[UcClient]] trait (fake-backed in specs), and the resulting
  * options translate mechanically onto Hadoop configuration for
  * Spark's s3a/abfss/gcs connectors. A real deployment plugs a real
  * UcClient; nothing else changes.
  */
final case class StorageCredentials(uri: String, options: Map[String, String]) {

  /** Translates the delta-rs-style option names onto the Hadoop conf
    * keys Spark's cloud connectors read (the S4 mapping documented in
    * SURVEY §2.1). Local-path URIs produce no entries.
    */
  def hadoopConf: Map[String, String] = {
    val m = Map.newBuilder[String, String]
    options.get("aws_region").foreach(v => m += "fs.s3a.endpoint.region" -> v)
    options.get("aws_access_key_id").foreach(v => m += "fs.s3a.access.key" -> v)
    options.get("aws_secret_access_key").foreach(v => m += "fs.s3a.secret.key" -> v)
    options.get("aws_session_token").foreach { v =>
      m += "fs.s3a.session.token" -> v
      m += "fs.s3a.aws.credentials.provider" ->
        "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
    }
    for (acct <- options.get("azure_storage_account_name");
         sas <- options.get("azure_storage_sas_token")) {
      m += s"fs.azure.account.auth.type.$acct.dfs.core.windows.net" -> "SAS"
      m += s"fs.azure.sas.fixed.token.$acct.dfs.core.windows.net" -> sas
    }
    // same nonEmpty guard as applyTo: an empty key must not enable
    // keyfile auth that applyTo will never back with a file
    options.get("google_service_account_key").filter(_.nonEmpty).foreach { _ =>
      // the keyfile PATH is materialized by applyTo — the config
      // carries the key CONTENT (delta-rs semantics), which must not
      // be put where a file path is expected
      m += "fs.gs.auth.type" -> "SERVICE_ACCOUNT_JSON_KEYFILE"
    }
    m.result()
  }

  def applyTo(spark: SparkSession): Unit = {
    hadoopConf.foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }
    // the Hadoop GCS connector reads the service-account key from a
    // FILE; persist the config's key content to an owner-only temp
    // file and point the connector at its path
    options.get("google_service_account_key").filter(_.nonEmpty).foreach { key =>
      import java.nio.file.attribute.PosixFilePermissions
      val f = java.nio.file.Files.createTempFile("graft-gcs-key", ".json",
        PosixFilePermissions.asFileAttribute(
          PosixFilePermissions.fromString("rw-------")))
      java.nio.file.Files.writeString(f, key)
      f.toFile.deleteOnExit()
      spark.sparkContext.hadoopConfiguration
        .set("fs.gs.auth.service.account.json.keyfile", f.toString)
    }
  }
}

trait CredentialProvider {
  def resolve(config: Config): StorageCredentials
}

/** Direct-storage resolution: the per-provider option map + URI scheme
  * of component.py:306-330, verbatim keys. Base options carry the
  * reference's client timeouts (:303-305).
  */
object DirectStorageCredentials extends CredentialProvider {
  private val base = Map("timeout" -> "3600s", "max_retries" -> "2")

  def resolve(c: Config): StorageCredentials = {
    val d = c.destination
    c.provider match {
      case "abs" =>
        StorageCredentials(
          uri = s"az://${d.containerName}/${d.blobName}",
          options = base ++ Map(
            "azure_storage_account_name" -> c.absAccountName,
            "azure_storage_sas_token" -> c.secrets.absSasToken))
      case "s3" =>
        StorageCredentials(
          uri = s"s3://${d.containerName}/${d.blobName}",
          options = base ++ Map(
            "aws_region" -> c.awsRegion,
            "aws_access_key_id" -> c.awsKeyId,
            "aws_secret_access_key" -> c.secrets.awsKeySecret))
      case "gcs" =>
        StorageCredentials(
          uri = s"gs://${d.containerName}/${d.blobName}",
          options = base ++ Map(
            "google_service_account_key" -> c.secrets.gcpServiceAccountKey))
      case "" | "local" =>
        // local paths need no credentials; URI is resolved by the caller
        StorageCredentials(uri = "", options = Map.empty)
      case other =>
        if (c.accessMethod != AccessMethod.UnityCatalog)
          throw UserException(s"Unknown provider: $other")
        StorageCredentials(uri = "", options = Map.empty)
    }
  }
}

/** What a Unity Catalog round-trip returns for a table: its storage
  * URI plus exactly one credential flavor (component.py:336-350).
  */
final case class UcTempCredentials(
    url: String,
    azureSasToken: Option[String] = None,
    awsTemp: Option[(String, String, String)] = None, // (keyId, secret, sessionToken)
)

/** The minimal UC surface the component touches
  * (component.py:117-133): existence check, temp-credential exchange,
  * metastore region. Network-free fakes implement this in specs; a
  * real deployment wraps the databricks SDK.
  */
trait UcClient {
  def tableExists(fullName: String): Boolean
  /** Raises [[PermissionDeniedException]] on UC permission errors. */
  def tempTableCredentials(fullName: String): UcTempCredentials
  def region: String
}

final class PermissionDeniedException(msg: String) extends RuntimeException(msg)

/** Unity-catalog resolution (C6): temp credentials scoped to the
  * destination table, with the reference's exact user-facing errors —
  * missing table (component.py:118-121) and permission-denied →
  * UserException (E3, :131-133).
  */
final class UnityCatalogCredentials(client: UcClient) extends CredentialProvider {
  private val base = Map("timeout" -> "3600s", "max_retries" -> "2")

  def resolve(c: Config): StorageCredentials = {
    val d = c.destination
    val fullName = s"${d.catalog}.${d.schemaName}.${d.table}"
    if (!client.tableExists(fullName))
      throw UserException(
        s"External table $fullName does not exist in Unity Catalog, please create it.")
    val creds =
      try client.tempTableCredentials(fullName)
      catch {
        case e: PermissionDeniedException =>
          throw UserException(s"Permission denied: ${e.getMessage}")
      }
    val opts = creds.azureSasToken match {
      case Some(sas) =>
        // abfss://container@account.dfs.core.windows.net/path
        val afterAt = creds.url.split("@")
        if (afterAt.length < 2)
          throw UserException(
            s"Unity Catalog returned an Azure credential with a non-abfss URL: ${creds.url}")
        Map(
          "azure_storage_account_name" -> afterAt(1).split("\\.")(0),
          "azure_storage_sas_token" -> sas)
      case None =>
        creds.awsTemp match {
          case Some((id, secret, session)) =>
            Map(
              "aws_region" -> client.region,
              "aws_access_key_id" -> id,
              "aws_secret_access_key" -> secret,
              "aws_session_token" -> session)
          case None => Map.empty[String, String]
        }
    }
    StorageCredentials(creds.url, base ++ opts)
  }
}
