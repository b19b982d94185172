package graft.config

import org.scalatest.funsuite.AnyFunSuite

class EnvConfigSpec extends AnyFunSuite {

  private val secretYaml =
    """inventory:
      |  table_config: /cfg/inventory.yaml
      |  db:
      |    prod:
      |      instance-connection-name: proj:region:inv-prod
      |      database-name: inv
      |      username: inv_user
      |      password: s3cret
      |    stage:
      |      instance-connection-name: proj:region:inv-stage
      |      database-name: inv_stage
      |      username: inv_user
      |      password: s3cret2
      |merchant:
      |  table_config: /cfg/merchant.yaml
      |  db:
      |    prod:
      |      instance-connection-name: proj:region:mer-prod
      |      database-name: mer
      |      username: mer_user
      |      password: pw
      |metrics:
      |  note: no db key -> contributes no profiles (gcp_utils.py:31-33)
      |analytics:
      |  note: table_config WITHOUT db -> skipped entirely, because the
      |    reference continues before ever reading table_config
      |  table_config: /cfg/analytics.yaml
      |""".stripMargin

  test("DB_SECRET_INFO parses to <service>_<tier> profiles; db-less services skipped") {
    val (profiles, tableCfg) = EnvConfig.parseDbSecretInfo(secretYaml)
    assert(profiles.keySet === Set("inventory_prod", "inventory_stage", "merchant_prod"))
    val p = profiles("inventory_prod")
    assert(p.instanceConnectionName === "proj:region:inv-prod")
    assert(p.databaseName === "inv")
    assert(p.jdbcOptions("user") === "inv_user")
    assert(tableCfg === Map(
      "inventory" -> "/cfg/inventory.yaml", "merchant" -> "/cfg/merchant.yaml"))
  }

  test("missing DB_SECRET_INFO is a hard error, like the reference") {
    val e = intercept[RuntimeException](EnvConfig.fromEnv(_ => None))
    assert(e.getMessage.contains("DB_SECRET_INFO"))
  }

  test("bucket pairs enumerate from 1 and STOP at the first gap") {
    val env = Map(
      "SOURCE_GCS_BUCKET_1" -> "src-a", "DEST_GCS_BUCKET_1" -> "dst-a",
      "SOURCE_GCS_BUCKET_2" -> "src-b", "DEST_GCS_BUCKET_2" -> "dst-b",
      // pair 3 is half-configured; pair 4 exists but is unreachable
      "SOURCE_GCS_BUCKET_3" -> "src-c",
      "SOURCE_GCS_BUCKET_4" -> "src-d", "DEST_GCS_BUCKET_4" -> "dst-d")
    assert(EnvConfig.bucketPairs(env.get) ===
      Seq(("src-a", "dst-a"), ("src-b", "dst-b")))
    assert(EnvConfig.bucketPairs(Map.empty[String, String].get) === Seq.empty)
    // empty STRING terminates like Python truthiness — a manifest
    // defaulting SOURCE_GCS_BUCKET_1="" must not sync bucket ""
    val blank = Map("SOURCE_GCS_BUCKET_1" -> "", "DEST_GCS_BUCKET_1" -> "dst")
    assert(EnvConfig.bucketPairs(blank.get) === Seq.empty)
  }

  test("loadCatalog drives a two-service catalog purely from env-shaped input") {
    val files = Map(
      "/cfg/inventory.yaml" ->
        """tables:
          |  stock:
          |    sync_config:
          |      check_column: updated_at
          |      check_type: timestamp
          |""".stripMargin,
      "/cfg/merchant.yaml" ->
        """tables:
          |  merchants:
          |    sync_config:
          |      check_column: id
          |      check_type: id
          |  regions: {}
          |""".stripMargin)
    val catalog = EnvConfig.loadCatalog(
      env = Map(EnvConfig.DbSecretInfoVar -> secretYaml).get,
      readFile = files(_))
    assert(catalog.keySet === Set("stock", "merchants", "regions"))
    assert(catalog("stock").service === Some("inventory"))
    assert(catalog("stock").checkType === Some(CheckType.Timestamp))
    assert(catalog("merchants").service === Some("merchant"))
    assert(catalog("regions").checkColumn === None) // full-copy table
  }
}
