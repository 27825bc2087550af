package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dataflow.TransactionManager

/** Transaction-management contract
  * (app/services/transaction_manager.py:12-49). */
class TransactionManagerSpec extends AnyFunSuite {

  test("success commits, never rolls back (:26-28)") {
    val s = new TransactionManager.Session
    val out = TransactionManager.databaseTransaction(s)(_ => 41 + 1)
    assert(out === 42 && s.committed && !s.rolledBack)
  }

  test("exception rolls back and re-raises the ORIGINAL error (:29-32)") {
    val s = new TransactionManager.Session
    val thrown = intercept[RuntimeException] {
      TransactionManager.databaseTransaction(s) { _ =>
        throw new RuntimeException("boom")
      }
    }
    assert(thrown.getMessage === "boom")
    assert(s.rolledBack && !s.committed)
  }

  test("decorator: falsy db raises ValueError before any transaction (:43-45)") {
    val thrown = intercept[IllegalArgumentException] {
      TransactionManager.transactional(None)(_ => "x")
    }
    assert(thrown.getMessage ===
      "Transaction decorator requires 'db' parameter")
  }

  test("decorator passes through to the context manager (:47-48)") {
    val s = new TransactionManager.Session
    assert(TransactionManager.transactional(Some(s))(_ => "ok") === "ok")
    assert(s.committed && !s.rolledBack)
  }
}
