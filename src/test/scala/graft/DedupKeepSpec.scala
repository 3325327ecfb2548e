package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, TextAnalysis}

/** Keep-best-per-cluster dedup and exact-substring removal. */
class DedupKeepSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("componentDedupBy: highest score wins, missing scores rank last") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a_id", "b_id")
    val scores = Seq((1L, 10L), (2L, 99L), (3L, 50L), (6L, 1L))
      .toDF("doc_id", "score") // 5 has no score -> ranks below 6
    val out = Dedup.componentDedupBy(pairs, scores).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((2L, 99L, 3L)))
    assert(out(5L) == ((6L, 1L, 2L)))
  }

  test("componentDedupBy: score ties break to the smallest doc id") {
    val pairs = Seq((7L, 8L), (8L, 9L)).toDF("a_id", "b_id")
    val scores = Seq((7L, 5L), (8L, 5L), (9L, 3L)).toDF("doc_id", "score")
    val out = Dedup.componentDedupBy(pairs, scores).collect()
    assert(out.length == 1 && out.head.getLong(1) == 7L)
  }

  test("componentDedupBy: fractional scores compare as doubles, untruncated") {
    val pairs = Seq((3L, 7L)).toDF("a_id", "b_id")
    val scores = Seq((3L, 0.15), (7L, 0.91)).toDF("doc_id", "score")
    val out = Dedup.componentDedupBy(pairs, scores).head()
    assert(out.getLong(1) == 7L) // 0.91 beats 0.15 — a long cast would tie
    assert(out.getDouble(2) == 0.91)
  }

  test("componentDedupBy: fully unscored cluster reports null, not sentinel") {
    val pairs = Seq((1L, 2L)).toDF("a_id", "b_id")
    val scores = Seq((99L, 1L)).toDF("doc_id", "score") // neither member
    val out = Dedup.componentDedupBy(pairs, scores).head()
    assert(out.getLong(1) == 1L) // min id among unscored
    assert(out.isNullAt(2)) // keep_score null — no Long.MinValue leak
  }
}

class SubstrStripSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val shared = (0 until 10).map(i => s"s$i").mkString(" ") // 10 tokens

  private def run(rows: Seq[(Long, String)], n: Int, minDocs: Int = 2) =
    TextAnalysis.windowDedupRemove(rows.toDF("doc_id", "text"), n, minDocs)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap

  test("first occurrence kept, later copies stripped, unique tails survive") {
    val out = run(Seq(
      (3L, s"$shared tailA"), // min doc -> owner, untouched
      (7L, s"headB $shared"), // copy with its own prefix
      (9L, "completely unrelated text with many different words here")
    ), n = 4)
    assert(out(3L) == ((s"$shared tailA", 0L)))
    // doc 7's windows fully inside the shared run (starts 1..7 of its 11
    // tokens) strip tokens 1..10 -> only the head survives
    assert(out(7L) == (("headB", 7L)))
    assert(out(9L)._2 == 0L)
  }

  test("minDocs gates removal; docs shorter than n untouched") {
    val rows = Seq((1L, s"$shared x"), (2L, s"$shared y"), (3L, "tiny doc"))
    val at2 = run(rows, n = 10)
    assert(at2(1L)._2 == 0L && at2(2L)._2 == 1L && at2(2L)._1 == "y")
    val at3 = run(rows, n = 10, minDocs = 3)
    assert(at3.values.forall(_._2 == 0L)) // only 2 copies < minDocs
    assert(at2(3L) == (("tiny doc", 0L)))
  }

  test("no text column crosses the window-hash exchanges (plan)") {
    val docs = (0L until 20L)
      .map(i => (i, s"tok${i % 5} a b c d e f g tok${i % 5} tail$i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.windowDedupRemove(docs, n = 4)
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // the corpus-sized shuffles key on the window hash `h` and carry only
    // narrow (id, pos, hash) rows; the text rejoins by doc id for the cut
    exchanges.foreach { e =>
      if (e.outputPartitioning.toString.contains("h#")) {
        val strings = e.output.filter(
          _.dataType == org.apache.spark.sql.types.StringType)
        assert(strings.isEmpty,
          s"text ${strings.map(_.name)} crosses the window-hash exchange")
      }
    }
  }

  test("token order preserved around multiple removed spans") {
    // two disjoint shared runs inside one doc; the owner doc holds both
    val runA = "a1 a2 a3 a4"
    val runB = "b1 b2 b3 b4"
    val out = run(Seq(
      (1L, s"$runA mid $runB"),
      (2L, s"pre $runA keep1 keep2 $runB post")
    ), n = 4)
    assert(out(1L)._2 == 0L)
    assert(out(2L)._1 == "pre keep1 keep2 post")
    assert(out(2L)._2 == 2L)
  }
}
