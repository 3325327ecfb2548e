package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{SeqIn, SeqOut}
import java.sql.Timestamp

/** Stateful streaming ops: exactly-once dedup emission and cross-batch
  * custom state, driven through MemoryStream micro-batches. */
class StreamingOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("seenDedupStream emits each url exactly once across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val q = StreamingOps.seenDedupStream(in.toDF().toDF("url", "ts"), "ts", "10 seconds")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      in.addData(("a", ts(1)), ("b", ts(2)), ("a", ts(3))) // in-batch dup
      q.processAllAvailable()
      in.addData(("a", ts(4)), ("c", ts(5))) // cross-batch dup inside watermark
      q.processAllAvailable()
      val got = spark.table("dedup_out").select("url").as[String].collect().sorted
      assert(got.sameElements(Array("a", "b", "c")), s"got ${got.mkString(",")}")
    } finally q.stop()
  }

  test("hostFifoSeq: per-host counters persist across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SeqIn]
    val q = StreamingOps.hostFifoSeq(in.toDS())
      .writeStream.format("memory").queryName("seq_out").outputMode("append").start()
    try {
      // batch 1: two urls on h1 (out of ts order — must sort), one on h2
      in.addData(SeqIn("h1", "u2", ts(2)), SeqIn("h1", "u1", ts(1)),
        SeqIn("h2", "v1", ts(1)))
      q.processAllAvailable()
      // batch 2: counters must CONTINUE from the state store, not restart
      in.addData(SeqIn("h1", "u3", ts(3)), SeqIn("h2", "v2", ts(4)))
      q.processAllAvailable()
      val got = spark.table("seq_out").as[SeqOut].collect()
        .map(r => (r.host, r.url, r.seq)).sorted.toSeq
      assert(got == Seq(("h1", "u1", 0L), ("h1", "u2", 1L), ("h1", "u3", 2L),
        ("h2", "v1", 0L), ("h2", "v2", 1L)), s"got $got")
    } finally q.stop()
  }

  test("hostFifoSeq orders sub-millisecond timestamps by full precision") {
    // regression: the tie-break compared ts.getTime (millis), so rows a
    // microsecond apart tied and kept nondeterministic arrival order
    implicit val sqlCtx = spark.sqlContext
    def tsn(nanos: Int): Timestamp = {
      val t = new Timestamp(1000L); t.setNanos(nanos); t
    }
    val in = MemoryStream[SeqIn]
    val q = StreamingOps.hostFifoSeq(in.toDS())
      .writeStream.format("memory").queryName("seq_ns").outputMode("append").start()
    try {
      // same millisecond, different microseconds; fed in reverse order
      in.addData(SeqIn("h", "late", tsn(200000)), SeqIn("h", "early", tsn(100000)))
      q.processAllAvailable()
      val got = spark.table("seq_ns").as[SeqOut].collect()
        .map(r => r.url -> r.seq).toMap
      assert(got == Map("early" -> 0L, "late" -> 1L), s"got $got")
    } finally q.stop()
  }
}

class NearDupStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._
  import graft.streaming.StreamingOps.{SigIn, DupHit}

  private def ts(s: Long) = new Timestamp(s * 1000L)
  private def sigOf(id: Long, t: Long, text: String) =
    SigIn(id, ts(t), graft.ops.Dedup.minhashSignature(text, 3, 64).toSeq)

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val near = "the quick brown fox jumps over the lazy dog again and again tomorrow"
  private val other = "completely different content about apache spark distributed joins"

  test("nearDupStream: in-batch and cross-batch near-dups flagged at ingest") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SigIn]
    val q = StreamingOps.nearDupStream(in.toDS(), minEstJaccard = 0.4)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      in.addData(sigOf(1, 1, base), sigOf(2, 2, near), sigOf(3, 3, other))
      q.processAllAvailable()
      in.addData(sigOf(4, 4, base)) // exact dup of 1, a micro-batch later
      q.processAllAvailable()
      val rows = spark.table("neardup_out").as[DupHit].collect()
      val hits = rows.map(h => (h.docId, h.matchId)).distinct.toSet
      assert(hits.contains((2L, 1L))) // in-batch near-dup
      assert(hits.contains((4L, 1L)) && hits.contains((4L, 2L))) // cross-batch
      assert(!hits.exists(p => p._1 == 3L || p._2 == 3L))
      assert(rows.filter(h => h.docId == 4L && h.matchId == 1L)
        .forall(_.estJaccard == 1.0)) // identical signatures agree fully
    } finally q.stop()
  }

  test("nearDupStream: bucket cap evicts oldest members (FIFO recency)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SigIn]
    val q = StreamingOps.nearDupStream(in.toDS(), minEstJaccard = 0.4, cap = 1)
      .writeStream.format("memory").queryName("neardup_cap_out")
      .outputMode("append").start()
    try {
      in.addData(sigOf(1, 1, base)); q.processAllAvailable()
      in.addData(sigOf(2, 2, base)); q.processAllAvailable()
      in.addData(sigOf(3, 3, base)); q.processAllAvailable()
      val hits = spark.table("neardup_cap_out").as[DupHit].collect()
        .map(h => (h.docId, h.matchId)).distinct.toSet
      assert(hits == Set((2L, 1L), (3L, 2L))) // 1 was evicted before 3 arrived
    } finally q.stop()
  }

  test("nearDupStream: event-time TTL evicts idle buckets (bounded state)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SigIn]
    val q = StreamingOps.nearDupStream(in.toDS(), minEstJaccard = 0.4,
        watermarkDelay = "0 seconds", stateTtlMs = 1000L)
      .writeStream.format("memory").queryName("neardup_ttl_out")
      .outputMode("append").start()
    try {
      in.addData(sigOf(1, 1, base)); q.processAllAvailable()
      // two watermark-advancing batches: the first moves the watermark far
      // past doc 1's bucket TTL, the second lets its timer fire and remove
      // the bucket before any matching row arrives
      in.addData(sigOf(8, 100, other)); q.processAllAvailable()
      in.addData(sigOf(9, 101, other)); q.processAllAvailable()
      in.addData(sigOf(5, 102, base)); q.processAllAvailable()
      val hits = spark.table("neardup_ttl_out").as[DupHit].collect()
        .map(h => (h.docId, h.matchId)).toSet
      assert(!hits.contains((5L, 1L)), s"evicted bucket still matched: $hits")
      // sanity: the op still matches when state is live (8~9 are dups of
      // each other within the TTL window)
      assert(hits.contains((9L, 8L)))
    } finally q.stop()
  }
}
