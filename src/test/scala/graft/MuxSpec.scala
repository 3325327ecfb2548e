package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.crawl.Mux
import graft.crawl.Mux.ResponseRule

/** fetchbot Mux parity (handler.go:126-233): criteria AND-matching,
  * longest-path-prefix priority, registration-order ties, status ranges,
  * scheme/host criteria, custom Column predicates, default fallthrough. */
class MuxSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def dispatchOne(rules: Seq[ResponseRule], method: String, url: String,
      status: Int, contentType: String): String =
    Seq((method, url, status, contentType))
      .toDF("method", "url", "status", "content_type")
      .select(Mux.dispatch(rules).as("h")).as[String].head()

  test("longest path prefix wins over shorter and over non-path matchers") {
    val rules = Seq(
      ResponseRule("any"),
      ResponseRule("site", pathPrefix = Some("/a/")),
      ResponseRule("deep", pathPrefix = Some("/a/b/")))
    assert(dispatchOne(rules, "GET", "http://h/a/b/c.html", 200, "text/html") == "deep")
    assert(dispatchOne(rules, "GET", "http://h/a/x.html", 200, "text/html") == "site")
    assert(dispatchOne(rules, "GET", "http://h/z.html", 200, "text/html") == "any")
  }

  test("same-score ties resolve by registration order (determinism pin)") {
    val rules = Seq(
      ResponseRule("first", method = Some("HEAD")),
      ResponseRule("second", method = Some("HEAD")))
    assert(dispatchOne(rules, "HEAD", "http://h/x", 200, "") == "first")
  }

  test("content type matches on the base type before ';' (handler.go:180-186)") {
    val rules = Seq(ResponseRule("html", contentType = Some("text/html")))
    assert(dispatchOne(rules, "GET", "http://h/x", 200,
      "text/html; charset=utf-8") == "html")
    assert(dispatchOne(rules, "GET", "http://h/x", 200, "application/pdf") == "default")
  }

  test("status range is inclusive; unset bounds are open") {
    val rules = Seq(
      ResponseRule("redirect", statusMin = Some(300), statusMax = Some(399)),
      ResponseRule("server_err", statusMin = Some(500)))
    assert(dispatchOne(rules, "GET", "http://h/x", 301, "") == "redirect")
    assert(dispatchOne(rules, "GET", "http://h/x", 399, "") == "redirect")
    assert(dispatchOne(rules, "GET", "http://h/x", 503, "") == "server_err")
    assert(dispatchOne(rules, "GET", "http://h/x", 200, "") == "default")
  }

  test("scheme and host criteria use the Go-parity url parse") {
    val rules = Seq(
      ResponseRule("secure", scheme = Some("https")),
      ResponseRule("local", host = Some("127.0.0.1:8002")))
    assert(dispatchOne(rules, "GET", "https://h/x", 200, "") == "secure")
    assert(dispatchOne(rules, "GET", "http://127.0.0.1:8002/x", 200, "") == "local")
    assert(dispatchOne(rules, "GET", "http://other/x", 200, "") == "default")
  }

  test("custom Column predicate participates in matching (Custom matcher twin)") {
    val rules = Seq(
      ResponseRule("long_url", predicate = Some(length(col("url")) > 20)),
      ResponseRule("rest"))
    assert(dispatchOne(rules, "GET", "http://h/very/long/path/indeed.html", 200, "") == "long_url")
    assert(dispatchOne(rules, "GET", "http://h/x", 200, "") == "rest")
  }

  test("all criteria AND together; dispatch is one codegen'd projection") {
    val rules = Seq(ResponseRule("narrow", method = Some("GET"),
      contentType = Some("text/html"), statusMin = Some(200), statusMax = Some(299),
      pathPrefix = Some("/doc/")))
    assert(dispatchOne(rules, "GET", "http://h/doc/1.html", 200, "text/html") == "narrow")
    assert(dispatchOne(rules, "HEAD", "http://h/doc/1.html", 200, "text/html") == "default")
    assert(dispatchOne(rules, "GET", "http://h/doc/1.html", 404, "text/html") == "default")
    // the when-chain stays a plain projection (no shuffle, no UDF beyond
    // the Go-parity url kernels)
    val df = Seq(("GET", "http://h/doc/1.html", 200, "text/html"))
      .toDF("method", "url", "status", "content_type")
      .select(Mux.dispatch(rules))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
