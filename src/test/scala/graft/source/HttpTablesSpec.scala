package graft.source

import graft.GraftError.EmptyResultError
import graft.SparkSpec
import graft.config.{Pagination, Source}
import graft.http.StubServer
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end register→SQL over the in-process stub server — the E1/E2
  * lifecycle of the reference (/root/reference/src/main.rs:22-49,
  * dataframe.rs:7-24) rebuilt on SparkSession + temp views. */
class HttpTablesSpec extends AnyFunSuite with SparkSpec {

  private val posts =
    """[{"userId":1,"id":1,"title":"a","body":"x"},
      | {"userId":1,"id":2,"title":"b","body":"y"},
      | {"userId":2,"id":3,"title":"c","body":"z"}]""".stripMargin.replace("\n", "")

  test("register + spark.sql aggregate over an HTTP JSON table") {
    StubServer.withServer({ case ("GET", "/posts", _) => (200, posts) }) { s =>
      HttpTables.register(spark, Source("posts", s.url("/posts")))
      val out = spark.sql(
        "SELECT userId, count(*) AS n FROM posts GROUP BY userId ORDER BY userId")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(out.toSeq == Seq((1L, 2L), (2L, 1L)))
    }
  }

  test("nested objects infer as structs, arrays as arrays (all-rows inference)") {
    val body = """[{"id":1,"geo":{"lat":1.5,"lng":2.5},"tags":["a","b"]},
                 | {"id":2,"geo":{"lat":3.0,"lng":4.0},"tags":[],"extra":true}]"""
      .stripMargin.replace("\n", "")
    StubServer.withServer({ case ("GET", "/n", _) => (200, body) }) { s =>
      val df = HttpTables.load(spark, Source("nested", s.url("/n")))
      // field absent from row 1 still appears (superset of first-record inference)
      assert(df.schema.fieldNames.contains("extra"))
      val row = df.selectExpr("geo.lat", "size(tags)", "id").where("id = 1").head()
      assert(row.getDouble(0) == 1.5 && row.getInt(1) == 2)
    }
  }

  test("empty result raises a typed error instead of panicking (divergence 3)") {
    StubServer.withServer({ case ("GET", "/none", _) => (200, "[]") }) { s =>
      assertThrows[EmptyResultError](
        HttpTables.load(spark, Source("none", s.url("/none"))))
    }
  }

  test("paginated source snapshots all pages then answers SQL") {
    StubServer.withServer({
      case ("GET", "/pg", q) =>
        val page = q.split("&")(0).stripPrefix("page=").toInt
        if (page <= 3) (200, s"""[{"page":$page,"v":${page * 10}}]""")
        else (200, "null")
    }) { s =>
      HttpTables.register(spark,
        Source("pg", s.url("/pg"), pagination = Some(Pagination())))
      val total = spark.sql("SELECT sum(v) AS t FROM pg").head().getLong(0)
      assert(total == 60L)
    }
  }

  test("snapshot semantics: one fetch at registration, decoded frame cached") {
    var hits = 0
    StubServer.withServer({
      case ("GET", "/c", _) => hits += 1; (200, """[{"x":1}]""")
    }) { s =>
      val df = HttpTables.register(spark, Source("c", s.url("/c")))
      df.count(); df.count()
      spark.sql("SELECT * FROM c").count()
      assert(hits == 1) // driver fetched exactly once
      // ADVICE r2: hits==1 alone can't fail (rows are parallelized from
      // driver memory) — assert the cache itself so re-decode is covered.
      assert(df.storageLevel.useMemory, "decoded snapshot must be cached")
    }
  }
}
