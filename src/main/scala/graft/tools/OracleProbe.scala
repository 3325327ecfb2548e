package graft.tools

import graft.functions.{Funcs, Normalize, Sniff}
import graft.ops.{Dedup, TextAnalysis}

/** Scratch probe: prints pinned function outputs used to author oracle SQL
  * literals (deterministic functions; constants pasted into SparkEntry). */
object OracleProbe {
  def main(args: Array[String]): Unit = {
    // f1 input shape
    for (i <- Seq(0L, 7L, 13L, 49L, 50L)) {
      val raw = s"HTTP://Site${i % 50}.Example.COM:80//a/./doc/../d/$i"
      println(s"f1 $i -> ${Normalize.normalizeUrlString(raw)}")
    }
    // f5 sniff over candidate case prefixes
    val texts = Seq(
      "<html><body>hello world</body></html>",
      "%PDF-1.4 fake body",
      "plain words only here")
    texts.foreach(t => println(s"f5 '${t.take(12)}' -> ${Sniff.detectContentType(t.getBytes("UTF-8"))}"))
    // t4 fingerprint literals over 8 fixed texts
    val t4texts = (0 until 8).map(i =>
      s"doc $i alpha${i * 7} beta${i * 13} gamma${i * 29} delta${i * 31} epsilon zeta eta theta iota kappa lambda")
    t4texts.zipWithIndex.foreach { case (t, i) =>
      println(s"t4 $i -> ${TextAnalysis.fingerprint(t)}")
    }
    // t5 langid over 6 fixed texts
    val t5texts = Seq(
      "the cat and the dog of the house is that it was for them",
      "der hund die katze und das haus ist nicht mit ein auf sich",
      "les chats des chiens et est une dans que qui pour pas",
      "el gato los perros las casas y que en un una es no",
      "il gatto di cane che e un per non con del si da",
      "zzz qqq xxx yyy www vvv")
    t5texts.zipWithIndex.foreach { case (t, i) =>
      println(s"t5 $i -> ${TextAnalysis.detectLanguage(t)}")
    }
  }
}
