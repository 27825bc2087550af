package graft.dataflow

/** Transaction management contract
  * (app/services/transaction_manager.py:12-49): commit on success,
  * rollback AND re-raise on exception, and the decorator's
  * missing-`db` guard. Driver-side scalar logic by nature (it wraps
  * store sessions, not data) — the engine's analytic analog is the
  * precommit/commit tier in incremental/Incremental.scala.
  */
object TransactionManager {

  /** A session stub recording what the context manager did to it.
    * The reference never closes the session (:33-35 — "let FastAPI
    * dependency handle it"), so there is deliberately no `closed`
    * transition here. */
  final class Session {
    var committed = false
    var rolledBack = false
  }

  /** database_transaction (:13-35): yield the session, commit when
    * the body returns, roll back and RE-RAISE when it throws —
    * the caller always sees the original exception. */
  def databaseTransaction[A](db: Session)(body: Session => A): A =
    try {
      val out = body(db)
      db.committed = true
      out
    } catch {
      case e: Throwable =>
        db.rolledBack = true
        throw e
    }

  /** The @transactional decorator (:38-49): a Python-falsy `db`
    * kwarg — absent or None — raises ValueError with the exact
    * message before any transaction starts. */
  def transactional[A](db: Option[Session])(body: Session => A): A =
    db match {
      case None =>
        throw new IllegalArgumentException(
          "Transaction decorator requires 'db' parameter")
      case Some(s) => databaseTransaction(s)(body)
    }
}
