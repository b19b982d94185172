package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class IntrospectSpec extends AnyFunSuite {
  import Introspect._

  test("type rendering matches the reference (sync_utils.py:220-226)") {
    assert(renderType(ColumnMeta("a", "text", nullable = true)) === "text")
    assert(renderType(ColumnMeta("a", "varchar", nullable = true, charLength = Some(50))) === "varchar(50)")
    assert(renderType(ColumnMeta("a", "numeric", nullable = true, precision = Some(12), scale = Some(2))) === "numeric(12,2)")
    assert(renderType(ColumnMeta("a", "int4", nullable = true, isArray = true)) === "int4[]")
  }

  test("conflict key: discovered PKs win, else ALL columns (sync_utils.py:156-168)") {
    assert(conflictKey(Seq("id"), Seq("id", "a", "b")) === Seq("id"))
    assert(conflictKey(Seq.empty, Seq("a", "b")) === Seq("a", "b"))
  }
}
