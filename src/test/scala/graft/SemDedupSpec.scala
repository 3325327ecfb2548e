package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops._

/** SemDeDup (cluster-scoped semantic dedup) — keep rule, exact-dup
  * collapse, transitive grouping, and parallelism invariance over small
  * planted fixtures with margins far above float noise. */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def deg(a: Double): Array[Float] = {
    val t = math.toRadians(a)
    Array(math.cos(t).toFloat, math.sin(t).toFloat, 0f, 0f)
  }

  private def run(vs: Seq[(Long, Array[Float])], tau: Double, nlist: Int = 1,
      parts: Int = 4): Map[Long, (Long, Long, Boolean)] =
    Dedup.semDedup(vs.toDF("vec_id", "embedding").repartition(parts),
        dim = 4, minCosine = tau, nlist = nlist)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("exact duplicates collapse; one survivor per group; rep = min id") {
    val vs = Seq(5L -> deg(0), 9L -> deg(0), 2L -> deg(0), // identical triple
      7L -> deg(90)) // far away
    val out = run(vs, tau = 0.99)
    assert(out(2L) == ((2L, 2L, true)))
    assert(out(5L) == ((2L, 2L, false)) && out(9L) == ((2L, 2L, false)))
    assert(out(7L) == ((7L, 7L, true)))
    assert(out.values.count(_._3) == 2)
  }

  test("transitive chain: adjacent-only pairs still collapse to one keeper") {
    // cos(1 deg)=0.99985 >= tau > cos(2 deg)=0.99939: only adjacent pairs
    // link, the component closure must merge all three
    val vs = Seq(1L -> deg(0), 2L -> deg(1), 3L -> deg(2), 8L -> deg(50))
    val out = run(vs, tau = 0.9996)
    assert(Set(out(1L)._2, out(2L)._2, out(3L)._2).size == 1)
    assert(Seq(1L, 2L, 3L).count(out(_)._3) == 1)
    assert(out(8L)._3)
  }

  test("keep rule: the member farthest from its cluster centroid survives") {
    // near-dup pair at 0 deg / 1 deg; a mass of distinct vectors near 40 deg
    // drags the single centroid toward 40, so the 0-deg member is the
    // LOWEST-centroid-cosine (most atypical) member — it must win even
    // though its id is the larger one (proves the rule is not min-id)
    val vs = Seq(50L -> deg(0), 10L -> deg(1)) ++
      (20L to 24L).map(i => i -> deg(38 + (i - 20) * 1.0))
    val out = run(vs, tau = 0.9996)
    assert(out(50L)._2 == out(10L)._2) // same group
    assert(out(50L)._3 && !out(10L)._3) // atypical member kept
  }

  test("keep rule is angular on non-unit vectors (not magnitude-biased)") {
    // A sits dead on the centroid direction with a TINY norm; B sits 1 deg
    // off with a LARGE norm. Raw dot would rank A (0.5) below B (~2.0) and
    // delete the angular outlier; the cosine rule must keep B.
    def scaled(a: Double, s: Float): Array[Float] = deg(a).map(_ * s)
    val vs = Seq(1L -> scaled(20, 0.5f), 2L -> scaled(21, 2.0f)) ++
      (10L to 14L).map(i => i -> deg(19 + (i - 10) * 0.01)) // centroid mass at ~20
    val out = run(vs, tau = 0.9996)
    assert(out(1L)._2 == out(2L)._2) // cos(1 deg) pair regardless of norms
    assert(out(2L)._3 && !out(1L)._3) // angular outlier B kept
  }

  test("over-wide cells truncate (partial pairing), never a silent no-op") {
    // 6 distinct reps 0.5 deg apart in ONE cell, cap 4: any 4-subset of a
    // 6-path contains an adjacent (>= tau) pair, so truncation must still
    // remove at least one duplicate — the old whole-cell drop removed none
    val vs = (0L until 6L).map(i => i -> deg(i * 0.5))
    val out = Dedup.semDedup(vs.toDF("vec_id", "embedding").repartition(4),
        dim = 4, minCosine = 0.9996, nlist = 1, maxCellWidth = 4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out.size == 6) // truncation never drops rows from the output
    assert(out.values.count(_ == false) >= 1)
    assert(out.values.count(_ == true) >= 2)
  }

  test("maxCellWidth <= 0 means uncapped (capBuckets convention), not empty") {
    val vs = Seq(1L -> deg(0), 2L -> deg(0), 3L -> deg(40))
    val out = Dedup.semDedup(vs.toDF("vec_id", "embedding"), dim = 4,
        minCosine = 0.99, nlist = 1, maxCellWidth = 0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("no embedding array crosses the cell-candidate exchange (plan)") {
    val vs = (0L until 40L).map(i => i -> deg(i * 3.0))
    val out = Dedup.semDedup(vs.toDF("vec_id", "embedding"),
      dim = 4, minCosine = 0.999, nlist = 4)
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // the within-cell pairing shuffles narrow (cell, rep_id) rows; vectors
    // rejoin BY ID only for the exact verify
    exchanges.foreach { e =>
      if (e.outputPartitioning.toString.contains("cell")) {
        val arrays = e.output.filter(
          _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
        assert(arrays.isEmpty,
          s"arrays ${arrays.map(_.name)} cross the cell exchange")
      }
    }
  }

  test("deterministic at any parallelism") {
    val vs = (0L until 60L).map(i => i -> deg((i % 20) * 7.0 + (i % 3) * 0.5))
    val a = run(vs, tau = 0.9999, nlist = 4, parts = 1)
    val b = run(vs, tau = 0.9999, nlist = 4, parts = 16)
    assert(a == b)
  }
}
