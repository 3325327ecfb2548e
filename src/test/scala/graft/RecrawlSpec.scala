package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.crawl.Recrawl

class RecrawlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("change rates: static, volatile, changed-once; intervals clamp") {
    val obs = Seq(
      // static: 3 visits, same hash
      ("u/static", 0L, "h"), ("u/static", 1L, "h"), ("u/static", 2L, "h"),
      // volatile: changes every visit
      ("u/vol", 0L, "a"), ("u/vol", 1L, "b"), ("u/vol", 2L, "c"),
      // changed once
      ("u/once", 0L, "a"), ("u/once", 1L, "a"), ("u/once", 2L, "b"),
      // single observation: excluded (no revisit evidence)
      ("u/one", 0L, "x")
    ).toDF("url", "vt", "hash")
    val out = Recrawl.changeRates(obs, baseSec = 100L, minSec = 10L,
      maxSec = 150L).collect()
      .map(r => r.getAs[String]("url") ->
        ((r.getAs[Long]("n_changes"), r.getAs[Long]("change_rate_micro"),
          r.getAs[Long]("suggested_interval_sec")))).toMap
    assert(!out.contains("u/one"))
    assert(out("u/static") == ((0L, 0L, 150L)))   // 100*2 div 1 = 200 -> max 150
    assert(out("u/vol") == ((2L, 1000000L, 100L))) // 100*2 div 2
    assert(out("u/once") == ((1L, 500000L, 150L))) // 100*2 div 1 = 200 -> max
  }

  test("vt order, not row order, drives the lag (shuffled input)") {
    val obs = Seq(
      ("u", 2L, "b"), ("u", 0L, "a"), ("u", 1L, "a")
    ).toDF("url", "vt", "hash").repartition(3)
    val r = Recrawl.changeRates(obs, baseSec = 10L, minSec = 1L, maxSec = 1000L)
      .head()
    assert(r.getAs[Long]("n_changes") == 1L) // a,a,b in vt order
  }

  test("one url-keyed exchange serves window and groupBy") {
    val obs = Seq(("u", 0L, "a"), ("u", 1L, "b")).toDF("url", "vt", "hash")
    val plan = Recrawl.changeRates(obs).queryExecution.executedPlan.toString
    // the aggregate must reuse the window's hash partitioning on url —
    // exactly one shuffle in the whole plan
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1, plan)
  }
}
