package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

/** Per-paragraph language-consistency signals. */
class MixedLangSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val en = "the cat and the dog of the house is that it was for them"
  private val de = "der hund die katze und das haus ist nicht mit ein auf sich"
  private val fr = "les chats des chiens et est une dans que qui pour pas"

  private def run(rows: Seq[(Long, String)]) =
    TextAnalysis.mixedLanguageSignals(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getBoolean(5))))
      .toMap

  test("pure, mixed-majority, tie, and empty documents") {
    val out = run(Seq(
      (0L, s"$en\n\n$en"), // pure
      (1L, s"$en\n\n$de\n\n$en"), // mixed, en majority 2/3
      (2L, s"$fr\n\n$de"), // tie -> lexicographically smallest lang wins
      (3L, ""), // no paragraphs
      (4L, s"$en\n\n\n\n$en") // blank-only middle paragraph is skipped
    ))
    assert(out(0L) == ((2L, 1L, "en", 1000000L, false)))
    assert(out(1L) == ((3L, 2L, "en", 666666L, true)))
    assert(out(2L) == ((2L, 2L, "de", 500000L, true)))
    assert(out(3L) == ((0L, 0L, "und", 0L, false)))
    assert(out(4L) == ((2L, 1L, "en", 1000000L, false)))
  }

  test("CRLF blank lines split paragraphs like LF ones") {
    val out = run(Seq((6L, s"$en\r\n\r\n$de")))
    assert(out(6L) == ((2L, 2L, "de", 500000L, true)))
  }

  test("majority vote, not first-paragraph: nav-template mix detected") {
    val out = run(Seq((7L, s"$en\n\n$de\n\n$de\n\n$de")))
    assert(out(7L)._3 == "de")
    assert(out(7L)._4 == 750000L)
    assert(out(7L)._5)
  }
}

class PiiCountsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("per-class counts; classes do not cross-match") {
    val out = TextAnalysis.piiCounts(Seq(
      (0L, "a@b.com then c.d@e.org and +1-555-0100 at 10.0.0.1 or 8.8.8.8"),
      (1L, "no pii here, just 1234 and a dot. end"),
      (2L, "x@y.io x@y.io x@y.io") // repeats all counted
    ).toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(0L) == ((2L, 1L, 2L)))
    assert(out(1L) == ((0L, 0L, 0L)))
    assert(out(2L) == ((3L, 0L, 0L)))
  }
}
