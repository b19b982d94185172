package graft.cli

import graft.SparkSpec

import java.nio.file.Files

class MainSpec extends SparkSpec {
  import spark.implicits._

  test("db-sync end to end from YAML config; exit 0") {
    val srcDir = Files.createTempDirectory("graft_cli_src").toString
    val dstDir = Files.createTempDirectory("graft_cli_dst").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$srcDir/t.parquet")
    val cfgPath = Files.createTempFile("graft_cli", ".yaml")
    Files.writeString(cfgPath,
      "tables:\n  t:\n    sync_config:\n      check_column: id\n      check_type: id\n")
    val code = Main.run(spark, Array("db-sync",
      "--config", cfgPath.toString, "--source", srcDir, "--dest", dstDir,
      "--pks", "t=id"))
    assert(code === 0)
    assert(spark.read.parquet(s"$dstDir/t.parquet").count() === 2)
  }

  test("db-sync missing source table -> exit 1 (error isolation)") {
    val dstDir = Files.createTempDirectory("graft_cli_dst2").toString
    val cfgPath = Files.createTempFile("graft_cli2", ".yaml")
    Files.writeString(cfgPath, "tables:\n  missing:\n")
    val code = Main.run(spark, Array("db-sync",
      "--config", cfgPath.toString,
      "--source", Files.createTempDirectory("graft_cli_empty").toString,
      "--dest", dstDir))
    assert(code === 1)
  }

  test("file-sync defaults to dry run; --apply copies") {
    val src = Files.createTempDirectory("graft_cli_fs_src")
    val dst = Files.createTempDirectory("graft_cli_fs_dst")
    Files.writeString(src.resolve("f.txt"), "x")
    assert(Main.run(spark, Array("file-sync", src.toString, dst.toString)) === 0)
    assert(!Files.exists(dst.resolve("f.txt")))
    assert(Main.run(spark, Array("file-sync", src.toString, dst.toString, "--apply")) === 0)
    assert(Files.readString(dst.resolve("f.txt")) === "x")
  }

  test("unknown command -> usage, exit 2") {
    assert(Main.run(spark, Array("bogus")) === 2)
  }
}
