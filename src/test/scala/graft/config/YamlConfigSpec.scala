package graft.config

import graft.GraftError.ConfigError
import org.scalatest.funsuite.AnyFunSuite

/** YAML config parsing — semantics from /root/reference/src/model.rs:3-76
  * (structs + `Pagination::default` + `get_sql`). */
class YamlConfigSpec extends AnyFunSuite {

  test("parses a full config") {
    val cfg = YamlConfig.parse(
      """sources:
        |  - name: posts
        |    url: http://example.com/posts
        |    method: get
        |    sql: SELECT count(*) FROM posts
        |  - name: todos
        |    url: http://example.com/todos
        |    pagination:
        |      start_page: 2
        |      end_page: 5
        |      page_size: 25
        |      page_param: p
        |      page_size_param: per_page
        |""".stripMargin)
    assert(cfg.sources.map(_.name) == Seq("posts", "todos"))
    val posts = cfg.sources.head
    assert(posts.method == "GET") // normalized upper
    assert(posts.getSql.contains("SELECT count(*) FROM posts"))
    assert(posts.pagination.isEmpty)
    val p = cfg.sources(1).pagination.get
    assert(p == Pagination(startPage = 2, endPage = 5, pageSize = 25,
      pageParam = "p", pageSizeParam = "per_page"))
  }

  test("pagination defaults mirror the reference (pages 1..10, size 10, page/limit)") {
    val cfg = YamlConfig.parse(
      """sources:
        |  - name: a
        |    url: http://x
        |    pagination: {}
        |""".stripMargin)
    assert(cfg.sources.head.pagination.get == Pagination(1, 10, 10, "page", "limit"))
  }

  test("page_size_default is honored when page_size is absent") {
    val cfg = YamlConfig.parse(
      """sources:
        |  - name: a
        |    url: http://x
        |    pagination:
        |      page_size_default: 7
        |""".stripMargin)
    assert(cfg.sources.head.pagination.get.pageSize == 7)
  }

  test("blank sql is treated as absent (get_sql semantics)") {
    val cfg = YamlConfig.parse(
      "sources:\n  - name: a\n    url: http://x\n    sql: \"   \"\n")
    assert(cfg.sources.head.getSql.isEmpty)
  }

  test("missing required keys and unknown keys are typed errors") {
    assertThrows[ConfigError](YamlConfig.parse("sources:\n  - url: http://x\n"))
    assertThrows[ConfigError](YamlConfig.parse("sources:\n  - name: a\n"))
    assertThrows[ConfigError](YamlConfig.parse("nothing: 1\n"))
    assertThrows[ConfigError](
      YamlConfig.parse("sources:\n  - name: a\n    url: http://x\n    typo: 1\n"))
    assertThrows[ConfigError](YamlConfig.parse("sources: 42\n"))
    assertThrows[ConfigError](YamlConfig.parse("[not, a, mapping]"))
  }
}
