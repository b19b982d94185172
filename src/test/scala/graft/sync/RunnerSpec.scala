package graft.sync

import graft.config.TableConfig
import org.scalatest.funsuite.AnyFunSuite

class RunnerSpec extends AnyFunSuite {

  private def cfg(n: String, svc: Option[String] = None) =
    TableConfig(n, None, None, Seq.empty, svc)

  private def okStats(n: String) = SyncJob.SyncStats(n, "full", 1)

  test("a failing table does not stop the fold; exit code is 1") {
    val report = Runner.runAll(Seq(cfg("a"), cfg("boom"), cfg("c"))) { c =>
      if (c.name == "boom") sys.error("db down") else okStats(c.name)
    }
    assert(report.succeeded === Seq("a", "c"))
    assert(report.failed.map(_._1) === Seq("boom"))
    assert(report.exitCode === 1)
  }

  test("all green -> exit code 0, order preserved") {
    val report = Runner.runAll(Seq(cfg("a"), cfg("b")))(c => okStats(c.name))
    assert(report.exitCode === 0)
    assert(report.results.map(_._1) === Seq("a", "b"))
  }

  test("service grouping isolates failures per service") {
    val tables = Seq(cfg("a", Some("inv")), cfg("boom", Some("inv")), cfg("c", Some("ord")))
    val reports = Runner.runGroupedByService(tables) { c =>
      if (c.name == "boom") sys.error("x") else okStats(c.name)
    }
    assert(reports("inv").exitCode === 1)
    assert(reports("ord").exitCode === 0)
  }
}
