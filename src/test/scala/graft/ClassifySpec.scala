package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Classify

class ClassifySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val weights = Seq(
    ("data", 500000L), ("query", 300000L),
    ("slow", -400000L), ("the", -100000L)).toDF("term", "w_micro")

  test("linearScores: closed-form margins, keep by mean cross-multiplication") {
    val docs = Seq(
      (0L, "data query data"),     // 2*0.5 + 0.3 = 1.3 over 3 toks
      (1L, "the slow slow thing"), // -0.1 - 0.8 = -0.9 over 4 toks
      (2L, "novel words only"),    // no dictionary hits
      (3L, "")                     // empty: never kept
    ).toDF("doc_id", "text")
    val out = Classify.linearScores(docs, weights, thrMicro = 100000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(0L) == ((1300000L, 3L, true)))   // mean 0.433 >= 0.1
    assert(out(1L) == ((-900000L, 4L, false)))
    assert(out(2L) == ((0L, 3L, false)))        // mean 0 < 0.1
    assert(out(3L) == ((0L, 0L, false)))
    assert(out.size == 4)
  }

  test("linearScores: hashed feature space equals exact when collision-free") {
    val docs = Seq((0L, "data query slow"), (1L, "the data the")).toDF("doc_id", "text")
    val exact = Classify.linearScores(docs, weights).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2^20 buckets over a 4-term dictionary: collision-free w.h.p. and
    // deterministic (xxhash64 is seed-fixed) — assert equality holds
    val hashed = Classify.linearScores(docs, weights, buckets = 1 << 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact == hashed)
  }

  test("linearScores: case folds, tokenization matches the corpus ops") {
    val docs = Seq((0L, "  DATA   Query\tdata ")).toDF("doc_id", "text")
    val out = Classify.linearScores(docs, weights).collect()
      .map(r => (r.getLong(1), r.getLong(2))).head
    assert(out == ((1300000L, 3L)))
  }
}
