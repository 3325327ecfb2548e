package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.HostAnalysis

class HostAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("trapSignals: duplicate-content host flags, unique host does not") {
    val urls = Seq(
      // trap.example: 4 urls, one content key, 2 carry query strings
      ("trap.example", "http://trap.example/a?s=1", "X"),
      ("trap.example", "http://trap.example/b?s=2", "X"),
      ("trap.example", "http://trap.example/c", "X"),
      ("trap.example", "http://trap.example/d", "X"),
      // ok.example: 4 urls, 4 distinct keys
      ("ok.example", "http://ok.example/1", "a"),
      ("ok.example", "http://ok.example/2", "b"),
      ("ok.example", "http://ok.example/3", "c"),
      ("ok.example", "http://ok.example/4", "d"),
      // single.example: 1 url — trivially all-duplicate but below minUrls
      ("single.example", "http://single.example/", "z")
    ).toDF("host", "url", "content_key")
    val out = HostAnalysis.trapSignals(urls).collect()
      .map(r => r.getAs[String]("host") -> r).toMap
    val trap = out("trap.example")
    assert(trap.getAs[Long]("dup_ratio_micro") == 750000L)
    assert(trap.getAs[Long]("query_rate_micro") == 500000L)
    assert(!trap.getAs[Boolean]("is_trap")) // 0.75 < 0.8 default threshold
    val trap2 = HostAnalysis.trapSignals(urls, minDupRatioMicro = 700000L)
      .collect().map(r => r.getAs[String]("host") -> r).toMap
    assert(trap2("trap.example").getAs[Boolean]("is_trap"))
    assert(!trap2("ok.example").getAs[Boolean]("is_trap"))
    assert(!trap2("single.example").getAs[Boolean]("is_trap")) // minUrls gate
    assert(out("ok.example").getAs[Long]("dup_ratio_micro") == 0L)
  }

  test("mirrorHosts: exact mirrors pair, partial overlap below threshold drops") {
    val pages = (
      (1 to 8).map(i => ("a.example", s"k$i")) ++       // A = {k1..k8}
      (1 to 8).map(i => ("b.example", s"k$i")) ++       // B = A (mirror)
      (1 to 4).map(i => ("c.example", s"k$i")) ++       // C ⊂ A, J = 0.5
      (1 to 8).map(i => ("d.example", s"q$i"))          // D disjoint
    ).toDF("host", "content_key")
    val out = HostAnalysis.mirrorHosts(pages).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("host_a") == "a.example")
    assert(out(0).getAs[String]("host_b") == "b.example")
    assert(out(0).getAs[Long]("jaccard_micro") == 1000000L)
    // lowered threshold: exact verify computes C's true Jaccard vs A and B
    val loose = HostAnalysis.mirrorHosts(pages, minJaccardMicro = 400000L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Long]("jaccard_micro"))).toMap
    assert(loose(("a.example", "b.example")) == 1000000L)
    // C pairs appear only if banding proposed them; when present they carry
    // the exact 500000 micro-Jaccard (never an estimate)
    loose.filterNot(_._1 == ("a.example", "b.example")).foreach { case (k, v) =>
      assert(Set(("a.example", "c.example"), ("b.example", "c.example"))(k))
      assert(v == 500000L)
    }
  }

  test("mirrorHosts: duplicate page rows do not skew the set Jaccard") {
    val pages = Seq(
      ("a.example", "k1"), ("a.example", "k1"), ("a.example", "k2"),
      ("b.example", "k1"), ("b.example", "k2")
    ).toDF("host", "content_key")
    val out = HostAnalysis.mirrorHosts(pages).collect()
    assert(out.length == 1 && out(0).getAs[Long]("jaccard_micro") == 1000000L)
  }

  test("boilerplateStrip: template lines removed, mid-frequency and body kept") {
    val docs = Seq(
      (0L, "h1", "NAV\nPROMO\nbody zero"),
      (1L, "h1", "NAV\nbody one"),
      (2L, "h1", "NAV\nPROMO\nbody two"),
      (3L, "h1", "NAV\nbody three"),
      (4L, "h2", "NAV\nbody four")          // single-page host: nothing strips
    ).toDF("doc_id", "host", "text")
    val out = HostAnalysis.boilerplateStrip(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "PROMO\nbody zero")   // NAV on 4/4 pages -> stripped
    assert(out(1L) == "body one")           // PROMO on 2/4 -> kept
    assert(out(4L) == "NAV\nbody four")     // 1-page host keeps everything
  }

  test("boilerplateStrip: within-doc repeats count once toward doc frequency") {
    // FOO repeats twice inside doc 0 but appears in only 1 of 4 docs: kept;
    // NAV is on 4/4 pages: stripped
    val docs = Seq(
      (0L, "h", "NAV\nFOO\nFOO\nbody a"),
      (1L, "h", "NAV\nbody b"),
      (2L, "h", "NAV\nbody c"),
      (3L, "h", "NAV\nbody d")
    ).toDF("doc_id", "host", "text")
    val out = HostAnalysis.boilerplateStrip(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "FOO\nFOO\nbody a")
    assert(out(1L) == "body b")
  }

  test("urlTemplates: hex runs collapse before digits, histogram per host") {
    val urls = Seq(
      ("h", "http://h/p/1"), ("h", "http://h/p/2"), ("h", "http://h/p/33"),
      ("h", "http://h/x/deadbeefdeadbeef42"),   // 16+ hex chars -> H
      ("h", "http://h/cal/2020/7?sid=99"),
      ("g", "http://g/p/1")
    ).toDF("host", "url")
    val out = HostAnalysis.urlTemplates(urls).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_urls")).toMap
    assert(out(("h", "http://h/p/N")) == 3L)
    assert(out(("h", "http://h/x/H")) == 1L)
    assert(out(("h", "http://h/cal/N/N?sid=N")) == 1L)
    assert(out(("g", "http://g/p/N")) == 1L)
    assert(out.size == 4)
  }
}

class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("unigramCrossEntropy: closed-form nll on a tiny corpus") {
    // corpus tokens (lowercased): a a a | b a -> counts {a: 4, b: 1},
    // V = 2, T = 5; smoothed p(a) = 5/7, p(b) = 2/7
    val docs = Seq((0L, "a a a"), (1L, "b A")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.unigramCrossEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val nllA = -math.log(5.0 / 7.0)
    val nllB = -math.log(2.0 / 7.0)
    def r4(x: Double) = math.rint(x * 10000) / 10000 // spec tolerance only
    assert(out(0L)._2 == 3L)
    assert(math.abs(out(0L)._1 - r4(3 * nllA)) < 2e-4)
    assert(out(1L)._2 == 2L)
    assert(math.abs(out(1L)._1 - r4(nllB + nllA)) < 2e-4)
  }

  test("unigramCrossEntropy: rarer tokens carry higher surprisal") {
    val docs = Seq((0L, "common common common common common"),
      (1L, "rare")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.unigramCrossEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1) / r.getLong(2))).toMap
    assert(out(1L) > out(0L)) // per-token nll: rare > common
  }
}

class RobotsAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("robotsAudit: disallowed paths flagged; absent/empty robots allow all") {
    val pages = Seq(
      ("h", "http://h/public/x"),
      ("h", "http://h/private/y"),
      ("h", "http://h/private"),          // prefix itself
      ("g", "http://g/private/z"),        // no robots row for g
      ("e", "http://e/private/w")         // empty robots body
    ).toDF("host", "url")
    val robots = Seq(
      ("h", "User-agent: *\nDisallow: /private"),
      ("e", "")).toDF("host", "robots_txt")
    val out = HostAnalysis.robotsAudit(pages, robots, agent = "TestBot")
      .collect().map(r => r.getAs[String]("url") -> r.getAs[Boolean]("allowed")).toMap
    assert(out("http://h/public/x"))
    assert(!out("http://h/private/y"))
    assert(!out("http://h/private"))
    assert(out("http://g/private/z"))
    assert(out("http://e/private/w"))
  }

  test("robotsAudit: agent-specific groups override the wildcard") {
    val pages = Seq(("h", "http://h/a"), ("h", "http://h/b")).toDF("host", "url")
    val robots = Seq(("h",
      "User-agent: *\nDisallow: /a\n\nUser-agent: SpecialBot\nDisallow: /b"))
      .toDF("host", "robots_txt")
    val special = HostAnalysis.robotsAudit(pages, robots, "SpecialBot")
      .collect().map(r => r.getAs[String]("url") -> r.getAs[Boolean]("allowed")).toMap
    assert(special("http://h/a") && !special("http://h/b"))
  }
}

class CrawlBudgetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Driver-side Hamilton (largest-remainder) apportionment reference. */
  private def refHamilton(ws: Seq[(String, Long)], budget: Long): Map[String, Long] = {
    val pos = ws.filter(_._2 > 0)
    if (pos.isEmpty) return ws.map { case (h, _) => h -> 0L }.toMap
    val tot = pos.map(w => BigInt(w._2)).sum
    val base = pos.map { case (h, w) =>
      (h, (BigInt(budget) * w / tot).toLong, BigInt(budget) * w % tot)
    }
    val deficit = budget - base.map(_._2).sum
    val winners = base.sortBy { case (h, _, rem) => (-rem, h) }
      .take(deficit.toInt).map(_._1).toSet
    ws.map { case (h, w) =>
      h -> (if (w <= 0) 0L
            else base.find(_._1 == h).get._2 + (if (winners(h)) 1L else 0L))
    }.toMap
  }

  test("crawlBudget: exact-total Hamilton apportionment, zero weights get 0") {
    val ws = Seq(("a", 7L), ("b", 7L), ("c", 3L), ("d", 2L), ("e", 0L), ("f", -1L))
    val out = HostAnalysis.crawlBudget(ws.toDF("host", "weight"), budget = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == refHamilton(ws, 10L))
    assert(out.values.sum == 10L) // exact: no rounding drift
    assert(out("e") == 0L && out("f") == 0L)
  }

  test("crawlBudget: matches the reference across budgets and weight shapes") {
    val ws = (0 until 97).map(i => (f"h$i%03d", ((i * 7919L) % 23) - 2)) // some <= 0
    for (budget <- Seq(0L, 1L, 50L, 1000L, 1000003L)) {
      val out = HostAnalysis.crawlBudget(ws.toDF("host", "weight"), budget)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = refHamilton(ws, budget)
      assert(out == want, s"budget=$budget")
      if (ws.exists(_._2 > 0)) assert(out.values.sum == budget, s"budget=$budget")
    }
  }

  test("crawlBudget: all weights non-positive allocates nothing") {
    val out = HostAnalysis.crawlBudget(
      Seq(("a", 0L), ("b", -3L)).toDF("host", "weight"), budget = 5L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 0L, "b" -> 0L))
  }
}

class RobotsDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("robotsDrift: withdrawn, added, and stable permissions") {
    val pages = Seq(
      ("h1", "http://h1/secret/a"), // h1 adds a /secret rule -> withdrawn
      ("h1", "http://h1/open/b"),   // unaffected
      ("h2", "http://h2/old/c"),    // h2 drops its /old rule -> re-allowed
      ("h3", "http://h3/x")         // no robots either side
    ).toDF("host", "url")
    val robotsOld = Seq(("h2", "User-agent: *\nDisallow: /old"))
      .toDF("host", "robots_txt")
    val robotsNew = Seq(("h1", "User-agent: *\nDisallow: /secret"))
      .toDF("host", "robots_txt")
    val out = HostAnalysis.robotsDrift(pages, robotsOld, robotsNew, "Bot")
      .collect().map(r => r.getString(1) ->
        ((r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(out("http://h1/secret/a") == ((true, false, true)))
    assert(out("http://h1/open/b") == ((true, true, false)))
    assert(out("http://h2/old/c") == ((false, true, false)))
    assert(out("http://h3/x") == ((true, true, false)))
  }

  test("robotsDrift: agent-specific group changes drift only for that agent") {
    val pages = Seq(("h", "http://h/p")).toDF("host", "url")
    val old_ = Seq(("h", "User-agent: *\nAllow: /")).toDF("host", "robots_txt")
    val new_ = Seq(("h", "User-agent: SpecialBot\nDisallow: /\n\nUser-agent: *\nAllow: /"))
      .toDF("host", "robots_txt")
    val special = HostAnalysis.robotsDrift(pages, old_, new_, "SpecialBot")
      .head()
    assert(special.getBoolean(2) && !special.getBoolean(3) && special.getBoolean(4))
    val other = HostAnalysis.robotsDrift(pages, old_, new_, "OtherBot").head()
    assert(other.getBoolean(2) && other.getBoolean(3) && !other.getBoolean(4))
  }
}
