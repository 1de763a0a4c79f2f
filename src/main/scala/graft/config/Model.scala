package graft.config

import graft.GraftError.ConfigError
import scala.jdk.CollectionConverters._

/** Config data model (reference: /root/reference/src/model.rs:3-34 —
  * `Config { sources }`, `Source { name, url, method?, pagination?, sql? }`,
  * `Pagination { start_page?, end_page?, page_size?, page_param?,
  * page_size_param?, page_size_default? }`).
  *
  * Defaults mirror `Pagination::default` (/root/reference/src/model.rs:48-59):
  * pages 1..10, size 10, params "page"/"limit".
  */
final case class Pagination(
    startPage: Int = 1,
    endPage: Int = 10,
    pageSize: Int = 10,
    pageParam: String = "page",
    pageSizeParam: String = "limit")

final case class Source(
    name: String,
    url: String,
    method: String = "GET",
    pagination: Option[Pagination] = None,
    sql: Option[String] = None) {
  /** ≈ `Source::get_sql` (/root/reference/src/model.rs:61-76). */
  def getSql: Option[String] = sql.filter(_.trim.nonEmpty)
}

final case class Config(sources: Seq[Source])

/** YAML loader for `Config` (reference: serde_yaml deserialize at
  * /root/reference/src/main.rs:25-28). Built on snakeyaml (ships in
  * /opt/spark/jars).
  *
  * Deliberate divergence (ADVICE r2, documented like the others in
  * SURVEY.md §7): unknown keys are REJECTED to surface typos early,
  * whereas the reference's serde deserialization silently ignores them —
  * a config accepted by the upstream binary can fail here, by design
  * (`page_sise: 5` upstream silently runs with the default).
  */
object YamlConfig {

  def load(path: java.nio.file.Path): Config =
    try parse(java.nio.file.Files.readString(path))
    catch {
      case e: java.io.IOException =>
        throw graft.GraftError.IoError(s"cannot read config: $path", e)
    }

  def parse(yaml: String): Config = {
    val root =
      try new org.yaml.snakeyaml.Yaml().load[Any](yaml)
      catch { case e: Exception => throw ConfigError(s"invalid YAML: ${e.getMessage}", e) }
    val rootMap = asMap(root, "top level")
    val srcList = rootMap.getOrElse("sources",
      throw ConfigError("config missing required key: sources")) match {
      case l: java.util.List[_] => l.asScala.toSeq
      case other => throw ConfigError(s"sources must be a list, got: ${typeName(other)}")
    }
    Config(srcList.zipWithIndex.map { case (s, i) => parseSource(asMap(s, s"sources[$i]")) })
  }

  private def parseSource(m: Map[String, Any]): Source = {
    checkKeys(m, Set("name", "url", "method", "pagination", "sql"), "source")
    Source(
      name = str(m, "name").getOrElse(throw ConfigError("source missing required key: name")),
      url = str(m, "url").getOrElse(throw ConfigError("source missing required key: url")),
      method = str(m, "method").getOrElse("GET").toUpperCase,
      pagination = m.get("pagination").map(p => parsePagination(asMap(p, "pagination"))),
      sql = str(m, "sql"))
  }

  private def parsePagination(m: Map[String, Any]): Pagination = {
    checkKeys(m, Set("start_page", "end_page", "page_size", "page_param",
      "page_size_param", "page_size_default"), "pagination")
    val d = Pagination()
    Pagination(
      startPage = int(m, "start_page").getOrElse(d.startPage),
      endPage = int(m, "end_page").getOrElse(d.endPage),
      // the reference models both page_size and page_size_default; the
      // effective size falls back default-ward the same way
      pageSize = int(m, "page_size").orElse(int(m, "page_size_default")).getOrElse(d.pageSize),
      pageParam = str(m, "page_param").getOrElse(d.pageParam),
      pageSizeParam = str(m, "page_size_param").getOrElse(d.pageSizeParam))
  }

  private def asMap(v: Any, where: String): Map[String, Any] = v match {
    case m: java.util.Map[_, _] => m.asScala.map { case (k, x) => k.toString -> (x: Any) }.toMap
    case other => throw ConfigError(s"$where must be a mapping, got: ${typeName(other)}")
  }
  private def str(m: Map[String, Any], k: String): Option[String] =
    m.get(k).filter(_ != null).map(_.toString)
  private def int(m: Map[String, Any], k: String): Option[Int] =
    m.get(k).filter(_ != null).map {
      // strict like the string path (ADVICE r2): non-integral numerics
      // (2.7) and out-of-range longs are errors, not silent truncations.
      case n: java.lang.Integer => n.intValue
      case n: java.lang.Long =>
        if (n >= Int.MinValue && n <= Int.MaxValue) n.intValue
        else throw ConfigError(s"pagination.$k out of int range: $n")
      case n: Number =>
        throw ConfigError(s"pagination.$k must be an integer, got: $n")
      case s: String => try s.toInt catch {
        case _: NumberFormatException => throw ConfigError(s"pagination.$k must be an int: $s")
      }
      case other => throw ConfigError(s"pagination.$k must be an int, got: ${typeName(other)}")
    }
  private def checkKeys(m: Map[String, Any], allowed: Set[String], where: String): Unit = {
    val unknown = m.keySet -- allowed
    if (unknown.nonEmpty)
      throw ConfigError(s"unknown $where key(s): ${unknown.toSeq.sorted.mkString(", ")}")
  }
  private def typeName(v: Any): String =
    if (v == null) "null" else v.getClass.getSimpleName
}
