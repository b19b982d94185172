package graft.config

import org.yaml.snakeyaml.Yaml

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** O1 — config catalog (reference: load_table_config,
  * db-sync-local/sync_utils.py:7-11; YAML shape db-sync-local/netflix.yaml:1-7
  * `tables: {name: {sync_config: {check_column, check_type, ignore_columns}}}`;
  * GCP variant adds per-service table maps, db-sync-gcp/gcp_sync_utils.py:6-28).
  *
  * snakeyaml ships on the Spark classpath — no new dependency. Config parsing
  * is driver-side and tiny; the catalog feeds the SyncJob/Runner plan.
  */
sealed trait CheckType
object CheckType {
  case object Id extends CheckType
  case object Timestamp extends CheckType
  /** Reference's unreachable ">=" fallback branch (sync_utils.py:63, SURVEY
    * §2.4-4) — representable so the quirk is explicit. */
  case object Other extends CheckType

  def parse(s: String): CheckType = s match {
    case "id"        => Id
    case "timestamp" => Timestamp
    case _           => Other
  }
}

/** Per-table sync declaration. A table with no sync_config gets a full copy
  * every run (no watermark). */
case class TableConfig(
    name: String,
    checkColumn: Option[String],
    checkType: Option[CheckType],
    ignoreColumns: Seq[String],
    service: Option[String] = None)

object SyncConfig {

  /** Parse the reference's `tables:` YAML map; unknown keys ignored. */
  def parse(yaml: String, service: Option[String] = None): Map[String, TableConfig] = {
    val root = Option(new Yaml().load[java.util.Map[String, Object]](yaml))
      .getOrElse(java.util.Map.of[String, Object]())
    // flatMap(Option(_)): a present-but-null `tables:` key yields Some(null)
    // from the map, which would bypass getOrElse and NPE below
    val tables = root.asScala.get("tables").flatMap(Option(_))
      .getOrElse(new java.util.HashMap[String, Object]())
      .asInstanceOf[java.util.Map[String, Object]]
    // VectorMap preserves YAML insertion order (snakeyaml yields a
    // LinkedHashMap) — run sequence follows the authored catalog order,
    // like the reference's dict iteration
    tables.asScala.foldLeft(scala.collection.immutable.VectorMap.empty[String, TableConfig]) {
      case (acc, (name, cfgObj)) =>
        // every .flatMap(Option(_)) below guards the same snakeyaml trap as
        // `tables:` above — a present-but-EMPTY key (`sync_config:` with no
        // body, `check_column:` with no value) yields Some(null), which a
        // bare .map would NPE on
        val sync = Option(cfgObj)
          .map(_.asInstanceOf[java.util.Map[String, Object]].asScala)
          .flatMap(_.get("sync_config")).flatMap(Option(_))
          .map(_.asInstanceOf[java.util.Map[String, Object]].asScala)
        acc.updated(name, TableConfig(
          name = name,
          checkColumn = sync.flatMap(_.get("check_column")).flatMap(Option(_)).map(_.toString),
          checkType = sync.flatMap(_.get("check_type")).flatMap(Option(_))
            .map(v => CheckType.parse(v.toString)),
          ignoreColumns = sync.flatMap(_.get("ignore_columns")).flatMap(Option(_))
            .map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq.map(_.toString))
            .getOrElse(Seq.empty),
          service = service))
    }
  }

  def loadFile(path: String, service: Option[String] = None): Map[String, TableConfig] =
    parse(Files.readString(Paths.get(path)), service)

  /** GCP-variant merge: several service-tagged configs into one catalog
    * (gcp_sync_utils.py:14-25 tags each table with its service). Services
    * merge in sorted-name order into a VectorMap, preserving each
    * service's authored table order (a plain Map flatMap would degrade to
    * hash order past 4 entries and silently clobber same-named tables —
    * duplicates across services fail fast instead). */
  def merge(perService: Map[String, String]): Map[String, TableConfig] =
    perService.toSeq.sortBy(_._1)
      .foldLeft(scala.collection.immutable.VectorMap.empty[String, TableConfig]) {
        case (acc, (service, yaml)) =>
          parse(yaml, Some(service)).foldLeft(acc) { case (a, (name, cfg)) =>
            require(!a.contains(name),
              s"table '$name' declared by both service '${a(name).service.getOrElse("?")}' " +
                s"and service '$service' — qualify the names or split the catalogs")
            a.updated(name, cfg)
          }
      }
}
