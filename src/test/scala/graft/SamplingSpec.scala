package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Sampling

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val rows = (0L until 2000L)
    .map(i => (i, s"grp${i % 5}")).toDF("id", "grp")

  test("hash sample is a pure function of the data, not the partitioning") {
    val a = Sampling.hashSample(rows.repartition(1), col("id"), 0.3, "t")
      .select("id").collect().map(_.getLong(0)).sorted
    val b = Sampling.hashSample(rows.repartition(13), col("id"), 0.3, "t")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    // rate lands near the target (binomial, n=2000, p=0.3 → ±4σ ≈ ±82)
    assert(math.abs(a.length - 600) < 100, s"got ${a.length}")
  }

  test("different salts draw independent samples; same salt repeats") {
    val s1 = Sampling.hashSample(rows, col("id"), 0.5, "a")
      .select("id").collect().map(_.getLong(0)).toSet
    val s1b = Sampling.hashSample(rows, col("id"), 0.5, "a")
      .select("id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(rows, col("id"), 0.5, "b")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s1 == s1b)
    assert(s1 != s2)
    // a rate-r subsample with a different salt intersects at ~r² of n
    val inter = s1.intersect(s2).size
    assert(math.abs(inter - 500) < 150, s"got $inter")
  }

  test("rate monotonicity: a higher rate is a superset of a lower one") {
    val lo = Sampling.hashSample(rows, col("id"), 0.2, "m")
      .select("id").collect().map(_.getLong(0)).toSet
    val hi = Sampling.hashSample(rows, col("id"), 0.6, "m")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi))
  }

  test("weighted sample applies each group's own rate; rate 0 drops all") {
    val weights = Seq(("grp0", 0.0), ("grp1", 1.0), ("grp2", 0.5))
      .toDF("group", "rate")
    val out = Sampling.weightedSample(rows, col("grp"), weights, col("id"), "w")
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!out.contains("grp0"))
    assert(out("grp1") == 400L) // rate 1.0 keeps every row
    assert(math.abs(out("grp2") - 200L) < 60)
    assert(!out.contains("grp3") && !out.contains("grp4")) // unweighted drop
  }

  test("weighted sample clamps rates: negative drops all, >1 keeps all") {
    // regression: an unclamped negative rate turned into a negative long,
    // printed as 16 chars of two's complement, and kept the WHOLE group
    val weights = Seq(("grp0", -0.1), ("grp1", 1.7)).toDF("group", "rate")
    val out = Sampling.weightedSample(rows, col("grp"), weights, col("id"), "w")
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!out.contains("grp0"), "negative rate must behave like rate 0")
    assert(out("grp1") == 400L, "rate > 1 must behave like rate 1")
  }

  test("group quota caps each group at k, deterministically") {
    val a = Sampling.groupQuota(rows.repartition(3), col("grp"), col("id"), 7)
    val counts = a.groupBy("grp").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 7L))
    val b = Sampling.groupQuota(rows.repartition(17), col("grp"), col("id"), 7)
    assert(a.select("id").collect().map(_.getLong(0)).sorted
      .sameElements(b.select("id").collect().map(_.getLong(0)).sorted))
  }

  test("group quota keeps whole groups smaller than k") {
    val out = Sampling.groupQuota(rows.filter(col("id") < 3), col("grp"),
      col("id"), 10)
    assert(out.count() == 3)
  }

  test("group quota plan: constant rank bound engages WindowGroupLimit") {
    val plan = Sampling.groupQuota(rows, col("grp"), col("id"), 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "quota rank filter did not push a WindowGroupLimit below the exchange")
  }

  test("weighted sample plan: weights broadcast, corpus side never shuffles") {
    val weights = Seq(("grp0", 0.5)).toDF("group", "rate")
    val plan = Sampling.weightedSample(rows, col("grp"), weights, col("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "weights table was not broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "corpus side paid a shuffle join for a tiny weights table")
  }

  test("shard assignment: in-range, deterministic, roughly uniform") {
    val a = Sampling.assignShards(rows.repartition(2), col("id"), 16, "z")
      .select("id", "shard").collect().map(r => (r.getLong(0), r.getInt(1)))
    val b = Sampling.assignShards(rows.repartition(9), col("id"), 16, "z")
      .select("id", "shard").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1)))
    assert(a.forall { case (_, s) => s >= 0 && s < 16 })
    val sizes = a.groupBy(_._2).map(_._2.length)
    assert(sizes.size == 16)
    // 2000 keys over 16 shards → mean 125; Poisson 5σ ≈ ±56
    assert(sizes.forall(n => n > 65 && n < 185), s"skewed shards: $sizes")
  }

  test("sequence packing plan: map-only sharding + one pack-window exchange") {
    val docs = rows.withColumn("toks", (col("id") % 37) + 1)
    val out = Sampling.packSequences(docs, col("id"), col("toks"),
      budget = 100L, nShards = 8, salt = "p")
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(plan).size
    assert(exchanges == 1,
      s"expected exactly 1 exchange (the per-shard pack window), got $exchanges:\n${plan.take(1500)}")
  }

  test("shard assignment beyond 256 shards (the 100 TB packing path)") {
    val a = Sampling.assignShards(rows.repartition(3), col("id"), 1000, "z")
      .select("id", "shard").collect().map(r => (r.getLong(0), r.getInt(1)))
    val b = Sampling.assignShards(rows.repartition(7), col("id"), 1000, "z")
      .select("id", "shard").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1)))
    assert(a.forall { case (_, s) => s >= 0 && s < 1000 })
    // 2000 keys over 1000 shards: occupancy should be broad (≈864 expected)
    assert(a.map(_._2).distinct.length > 700)
  }

  test("global row numbers: contiguous 0..n-1, hash-canonical, parallelism-proof") {
    val a = Sampling.globalRowNumbers(rows.repartition(2), col("id"), "g")
      .select("id", "global_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Sampling.globalRowNumbers(rows.repartition(13), col("id"), "g")
      .select("id", "global_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    // exactly 0..n-1, each once
    assert(a.map(_._2).sorted.toSeq == (0L until 2000L).toSeq)
    // id order agrees with the (sha-prefix, id) canonical order
    def hex8(id: Long): String = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"${id}g".getBytes("UTF-8")).take(4).map(x => f"${x & 0xff}%02x").mkString
    val want = a.map(_._1).sortBy(id => (hex8(id), id)).zipWithIndex
      .map { case (id, i) => (id, i.toLong) }.sortBy(_._1)
    assert(a.sortBy(_._1).toSeq == want.toSeq)
  }

  test("epoch mix repeats rows per group factor; unweighted default 1") {
    val epochs = Seq(("grp0", 3), ("grp1", 2)).toDF("group", "epochs")
    val out = Sampling.epochMix(rows, col("grp"), epochs)
    val byGrp = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp("grp0") == 1200L)
    assert(byGrp("grp1") == 800L)
    assert(byGrp("grp2") == 400L)
    // epoch numbering is 1..k per row
    val eps = out.filter(col("grp") === "grp0" && col("id") === 0L)
      .select("epoch").collect().map(_.getInt(0)).sorted
    assert(eps.sameElements(Array(1, 2, 3)))
  }

  test("sequence packing: per-shard running sum, budget arithmetic, determinism") {
    val docs = rows.withColumn("toks", (col("id") % 37) + 1)
    val a = Sampling.packSequences(docs.repartition(2), col("id"), col("toks"),
      budget = 100L, nShards = 4, salt = "p")
    val b = Sampling.packSequences(docs.repartition(11), col("id"), col("toks"),
      budget = 100L, nShards = 4, salt = "p")
    val ra = a.select("id", "shard", "seq_id", "seq_offset").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val rb = b.select("id", "shard", "seq_id", "seq_offset").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(ra.sameElements(rb), "packing depends on the physical partitioning")
    // every offset is inside the budget and every input row survives
    assert(ra.length == 2000)
    assert(ra.forall { case (_, _, q, o) => q >= 0 && o >= 0 && o < 100 })
    // per shard: replay the running sum sequentially and compare exactly
    val byShard = a.select("shard", "id", "toks", "seq_id", "seq_offset").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    assert(byShard.keySet == Set(0, 1, 2, 3))
    // hash order within a shard is recomputable: sort by the same sha prefix
    def hex8(id: Long): String = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"${id}p".getBytes("UTF-8")).take(4).map(b => f"${b & 0xff}%02x").mkString
    byShard.foreach { case (_, members) =>
      var cum = 0L
      members.sortBy { case (_, id, _, _, _) => (hex8(id), id) }.foreach {
        case (_, _, toks, seqId, off) =>
          assert(seqId == cum / 100 && off == cum % 100)
          cum += toks
      }
    }
  }

  test("epoch mix: epochs <= 0 drops the group (sequence(1,0) counts DOWN)") {
    // the natural exclude spelling — must emit ZERO rows, not the two
    // ([1,0]) a bare sequence(1, 0) explode would produce
    val epochs = Seq(("grp0", 0), ("grp1", -2)).toDF("group", "epochs")
    val out = Sampling.epochMix(rows, col("grp"), epochs)
    val grps = out.select("grp").distinct().collect().map(_.getString(0)).toSet
    assert(grps == Set("grp2", "grp3", "grp4"), s"got $grps")
    assert(out.count() == 3 * 400L) // remaining groups at the default 1 epoch
  }
}

class SplitByHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val rows = (0L until 4000L).toDF("id")

  private def splits(fracs: Seq[Double], labels: Seq[String], parts: Int = 4) =
    Sampling.splitByHash(rows.repartition(parts), col("id"), fracs, labels,
        salt = "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("splitByHash: disjoint, exhaustive, roughly proportional") {
    val m = splits(Seq(0.8, 0.1), Seq("train", "val", "test"))
    assert(m.size == 4000) // every row got exactly one label
    val counts = m.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 3200) < 200, counts.toString)
    assert(math.abs(counts("val") - 400) < 120, counts.toString)
    assert(math.abs(counts("test") - 400) < 120, counts.toString)
  }

  test("splitByHash: growing a split only absorbs its right neighbor") {
    val small = splits(Seq(0.5, 0.25), Seq("train", "val", "test"))
    val big = splits(Seq(0.7, 0.05), Seq("train", "val", "test"))
    // every row train at 0.5 stays train at 0.7; no test row jumps to train
    // without passing val's moved boundary consistently
    assert(small.collect { case (id, "train") => id }
      .forall(id => big(id) == "train"))
    assert(big.collect { case (id, "test") => id }
      .forall(id => small(id) == "test"))
  }

  test("splitByHash: identical at any parallelism") {
    assert(splits(Seq(0.8, 0.1), Seq("a", "b", "c"), parts = 1) ==
      splits(Seq(0.8, 0.1), Seq("a", "b", "c"), parts = 16))
  }

  test("splitByHash: fractions summing to 1 leave the remainder truly empty") {
    val m = splits(Seq(0.9, 0.1), Seq("train", "val", "test"))
    assert(!m.values.exists(_ == "test")) // incl. a hash prefix of ffffffff
    assert(m.size == 4000)
  }
}
