package graft.runner

/** Storage-API client shape (C5's remote half): the reference fetches
  * table details over HTTP with N attempts and LINEAR backoff —
  * sleep(attempt+1) seconds between tries, re-raising the last failure
  * (/root/reference/src/storage_api_client.py:9-33).
  *
  * The sandbox has no network, so what ships is the retry CONTRACT
  * with an injectable transport (and sleeper, so specs run instantly):
  * a real deployment passes an HTTP transport; locally the manifest
  * introspection path (Actions.listTableColumns) answers the same
  * question without a round-trip.
  */
final class StorageApiClient[A](
    transport: String => A,
    retryAttempts: Int = 3,
    sleep: Long => Unit = ms => Thread.sleep(ms),
    onWarn: String => Unit = _ => ()) {

  require(retryAttempts > 0, "retryAttempts must be positive")

  /** GET-with-retries: attempt `retryAttempts` times; between failures
    * wait attempt+1 seconds (linear backoff, like the reference); after
    * the last failure re-throw the LAST exception.
    */
  def get(url: String): A = {
    var last: Throwable = null
    var attempt = 0
    while (attempt < retryAttempts) {
      try return transport(url)
      catch {
        // never retry through cancellation or fatal JVM errors
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
        case scala.util.control.NonFatal(e) =>
          last = e
          onWarn(s"Attempt ${attempt + 1} failed: ${e.getMessage}")
          if (attempt < retryAttempts - 1)
            try sleep((attempt + 1) * 1000L)
            catch { // an interrupt during backoff preserves the flag too
              case ie: InterruptedException =>
                Thread.currentThread().interrupt(); throw ie
            }
      }
      attempt += 1
    }
    throw last
  }

  /** The reference's one endpoint: table detail by id. */
  def getTableDetail(baseUrl: String, tableId: String): A =
    get(s"${baseUrl.stripSuffix("/")}/v2/storage/tables/$tableId")
}
