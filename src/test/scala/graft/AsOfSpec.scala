package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.AsOf

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)

  private lazy val quotes = Seq(
    // key, ts, px
    ("A", ts(10), 1.0),
    ("A", ts(20), 2.0),
    ("A", ts(30), 3.0),
    ("B", ts(15), 9.0)
  ).toDF("sym", "qts", "px")

  private lazy val trades = Seq(
    // key, ts, qty
    ("A", ts(5), 100L),  // before any quote → null
    ("A", ts(20), 200L), // equal ts → inclusive match (2.0)
    ("A", ts(25), 300L), // between → 2.0
    ("A", ts(99), 400L), // after all → 3.0
    ("B", ts(16), 500L), // → 9.0
    ("C", ts(50), 600L)  // key with no right rows → null
  ).toDF("sym", "tts", "qty")

  test("as-of join picks the latest right row at-or-before, per key") {
    val out = AsOf.asOfJoin(trades, quotes, key = "sym",
        leftTs = "tts", rightTs = "qts",
        rightCols = Map("px" -> "asof_px", "qts" -> "asof_ts"))
      .collect().map(r => (r.getAs[String]("sym"), r.getAs[Long]("qty"),
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)))
      .sortBy(_._2)
    assert(out === Array(
      ("A", 100L, None),
      ("A", 200L, Some(2.0)),
      ("A", 300L, Some(2.0)),
      ("A", 400L, Some(3.0)),
      ("B", 500L, Some(9.0)),
      ("C", 600L, None)))
  }

  test("right rows with a NULL timestamp never fabricate a match") {
    // asc ordering sorts nulls FIRST — un-dropped, a null-ts right row
    // would become the carry for every left row that should have none
    val withNull = quotes.unionByName(
      Seq(("A", Option.empty[java.sql.Timestamp], 666.0)).toDF("sym", "qts", "px"))
    val out = AsOf.asOfJoin(trades, withNull, key = "sym",
        leftTs = "tts", rightTs = "qts", rightCols = Map("px" -> "asof_px"))
      .collect().map(r => (r.getAs[Long]("qty"),
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble))).sortBy(_._1)
    assert(out === Array((100L, None), (200L, Some(2.0)), (300L, Some(2.0)),
      (400L, Some(3.0)), (500L, Some(9.0)), (600L, None)))
  }

  test("matched right columns come from ONE row, never stitched") {
    val out = AsOf.asOfJoin(trades, quotes, key = "sym",
        leftTs = "tts", rightTs = "qts",
        rightCols = Map("px" -> "asof_px", "qts" -> "asof_ts"))
      .filter(col("asof_px").isNotNull)
      .collect()
    out.foreach { r =>
      val px = r.getAs[Double]("asof_px")
      val t = r.getAs[java.sql.Timestamp]("asof_ts")
      // in the fixture px encodes its own quote time: 1.0@10, 2.0@20, 3.0@30, 9.0@15
      val expect = Map(1.0 -> ts(10), 2.0 -> ts(20), 3.0 -> ts(30), 9.0 -> ts(15))
      assert(t == expect(px), s"px $px paired with wrong ts $t")
    }
  }

  test("result is identical at different parallelism") {
    val a = AsOf.asOfJoin(trades.repartition(1), quotes.repartition(1),
      "sym", "tts", "qts", Map("px" -> "p")).orderBy("qty").collect().toSeq
    val b = AsOf.asOfJoin(trades.repartition(7), quotes.repartition(5),
      "sym", "tts", "qts", Map("px" -> "p")).orderBy("qty").collect().toSeq
    assert(a == b)
  }

  test("right-side ties at the same key+ts resolve deterministically") {
    val q2 = quotes.unionByName(Seq(("A", ts(20), 5.0)).toDF("sym", "qts", "px"))
    val out = AsOf.asOfJoin(trades, q2, "sym", "tts", "qts",
        Map("px" -> "p"))
      .filter(col("qty") === 200L).collect()
    // ties pick the struct sorting last → px 5.0
    assert(out.head.getAs[Double]("p") == 5.0)
  }

  test("plan: one key exchange, zero join operators (never a pair blow-up)") {
    val out = AsOf.asOfJoin(trades, quotes, "sym", "tts", "qts",
      Map("px" -> "p"))
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"as-of compiled to a join (O(L*R) candidate risk):\n${plan.take(1500)}")
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(plan).size
    assert(exchanges == 1,
      s"expected exactly 1 key exchange, got $exchanges:\n${plan.take(1500)}")
  }

  test("matches a brute-force oracle on a random-ish dense fixture") {
    val left = (0L until 400L).map(i =>
      (s"k${i % 7}", ts(i * 13 % 101), i)).toDF("k", "lts", "lid")
    val right = (0L until 300L).map(j =>
      (s"k${j % 5}", ts(j * 17 % 97), j)).toDF("k", "rts", "rid")
    val got = AsOf.asOfJoin(left, right, "k", "lts", "rts",
        Map("rid" -> "asof_rid"))
      .collect().map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong)).toMap
    val rRows = right.collect().map(r => (r.getString(0),
      r.getAs[java.sql.Timestamp](1).getTime, r.getLong(2)))
    val lRows = left.collect().map(r => (r.getString(0),
      r.getAs[java.sql.Timestamp](1).getTime, r.getLong(2)))
    lRows.foreach { case (k, lt, lid) =>
      val cands = rRows.filter(r => r._1 == k && r._2 <= lt)
      // expected: max ts, ties by max carried struct (rid)
      val expect = if (cands.isEmpty) None
        else Some(cands.maxBy(r => (r._2, r._3))._3)
      assert(got(lid) == expect, s"lid=$lid k=$k")
    }
  }
}
