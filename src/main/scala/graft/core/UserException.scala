package graft.core

/** User-facing error contract.
  *
  * Mirrors the reference's two-tier error model
  * (/root/reference/src/component.py:428-438): configuration / input
  * errors surface as `UserException` → exit code 1; anything else is an
  * internal error → exit code 2.
  */
final class UserException(message: String, cause: Throwable = null)
    extends RuntimeException(message, cause)

object UserException {
  def apply(message: String): UserException = new UserException(message)

  /** Runs `body`, translating exceptions into the reference's exit-code
    * contract. For use by a CLI `main`; library callers catch normally.
    */
  def exitCodeOf(body: => Unit): Int =
    try { body; 0 }
    catch {
      case e: UserException => System.err.println(e.getMessage); 1
      case e: Throwable     => e.printStackTrace(); 2
    }
}
