package graft.sync

import org.scalatest.funsuite.AnyFunSuite

import java.sql.SQLException

/** JdbcStore.read must map ONLY "table does not exist" to None — a transient
  * failure mapped to None would make SyncJob bootstrap from "empty
  * destination" and overwrite the table with the delta alone. */
class TableStoreSpec extends AnyFunSuite {

  test("table-missing SQLStates classify as missing, even wrapped") {
    val pg = new SQLException("relation \"t\" does not exist", "42P01")
    assert(JdbcStore.isTableMissing(pg))
    // Spark wraps the driver exception (AnalysisException keeps the cause)
    val wrapped = new RuntimeException("FAILED_JDBC",
      new RuntimeException("resolve", new SQLException("no table", "42S02")))
    assert(JdbcStore.isTableMissing(wrapped))
    assert(JdbcStore.isTableMissing(new SQLException("derby", "42X05")))
    assert(JdbcStore.isTableMissing(new SQLException("odbc-ish", "S0002")))
  }

  test("transient and syntax errors do NOT classify as missing") {
    // connection failure (class 08), auth (28xxx), timeout-ish, plain syntax
    assert(!JdbcStore.isTableMissing(new SQLException("conn refused", "08001")))
    assert(!JdbcStore.isTableMissing(new SQLException("auth failed", "28P01")))
    assert(!JdbcStore.isTableMissing(new SQLException("syntax error", "42601")))
    assert(!JdbcStore.isTableMissing(new SQLException("no state", null: String)))
    assert(!JdbcStore.isTableMissing(new RuntimeException("not sql at all")))
  }

  test("cause-cycle exceptions terminate and classify false") {
    val a = new RuntimeException("a")
    val b = new RuntimeException("b", a)
    a.initCause(b) // cycle a -> b -> a
    assert(!JdbcStore.isTableMissing(a))
  }
}
