package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // pathological skew: 90% of rows share one key
  private lazy val big = (0L until 3000L)
    .map(i => (i, if (i % 10 == 0) s"k${i % 4}" else "mega"))
    .toDF("id", "k")
  private lazy val dim = Seq(("mega", 1L), ("k0", 2L), ("k2", 3L))
    .toDF("k", "dim_val")

  test("salted join returns exactly the plain join's rows") {
    val plain = big.join(dim, Seq("k"))
      .select("id", "k", "dim_val").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    val salted = Skew.saltedJoin(big, dim, "k", salts = 8)
      .select("id", "k", "dim_val").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(salted.sameElements(plain))
    assert(plain.nonEmpty)
  }

  test("the exchange keys on (key, salt): the mega-key scatters") {
    val out = Skew.saltedJoin(big, dim, "k", salts = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), "join did not key on the salt column")
    // the mega-key's rows actually spread over multiple salt values
    val saltSpread = big
      .withColumn("_salt",
        pmod(xxhash64(struct(big.columns.map(col): _*)), lit(8)).cast("int"))
      .filter($"k" === "mega").select("_salt").distinct().count()
    assert(saltSpread >= 6, s"mega-key rows landed on only $saltSpread salts")
  }

  test("salts=1 degenerates to the plain join") {
    val plain = big.join(dim, Seq("k")).count()
    assert(Skew.saltedJoin(big, dim, "k", salts = 1).count() == plain)
  }

  test("a map-typed column on the big side does not break the salt") {
    // regression: hashing the whole row struct threw AnalysisException on
    // MapType (UrlRow.meta is Map[String,String] — the scaladoc's own
    // example input); the salt now derives from the hashable columns only
    val bigWithMap = big.withColumn("meta",
      map(lit("a"), $"id".cast("string")))
    val plain = big.join(dim, Seq("k")).count()
    val salted = Skew.saltedJoin(bigWithMap, dim, "k", salts = 8)
    assert(salted.count() == plain)
    assert(salted.columns.contains("meta"))
  }
}
