package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`. */
object TextAnalysis {

  // ------------------------------------------------------------ language id

  /** tiny stopword profiles — deterministic n-gram-free heuristic langid. */
  private val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
      "with", "as", "his", "on", "be", "at", "by", "had", "are", "this"),
    "de" -> Set("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "auf",
      "sich", "des", "dem", "den", "von", "zu", "im", "für", "als", "auch", "es"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "est", "un", "une", "dans",
      "que", "qui", "pour", "pas", "sur", "avec", "au", "par", "plus", "ce"),
    "es" -> Set("el", "la", "los", "las", "de", "y", "que", "en", "un", "una",
      "es", "no", "por", "con", "para", "se", "del", "al", "como", "más"),
    "it" -> Set("il", "la", "di", "che", "e", "un", "una", "per", "non", "con",
      "del", "le", "si", "da", "come", "anche", "nel", "alla", "più", "sono"))

  /** Unicode-script pre-classification: non-Latin scripts identify the
    * language (or its overwhelmingly dominant language) without stopwords —
    * CJK (Hiragana/Katakana ⇒ ja; Han alone ⇒ zh; Hangul ⇒ ko), Cyrillic ⇒
    * ru, Arabic ⇒ ar, Greek ⇒ el, Hebrew ⇒ he, Thai ⇒ th, Devanagari ⇒ hi.
    * Latin-script text falls through to the stopword profiles. Counts the
    * first 2000 chars' letters; a script wins at >= 25% of letter mass. */
  private def scriptLang(text: String): Option[String] = {
    import java.lang.Character.UnicodeScript
    var letters = 0
    var han = 0; var kana = 0; var hangul = 0; var cyr = 0; var arab = 0
    var greek = 0; var hebrew = 0; var thai = 0; var deva = 0
    var i = 0
    val n = math.min(text.length, 2000)
    while (i < n) {
      val cp = text.codePointAt(i)
      if (Character.isLetter(cp)) {
        letters += 1
        UnicodeScript.of(cp) match {
          case UnicodeScript.HAN                               => han += 1
          case UnicodeScript.HIRAGANA | UnicodeScript.KATAKANA => kana += 1
          case UnicodeScript.HANGUL                            => hangul += 1
          case UnicodeScript.CYRILLIC                          => cyr += 1
          case UnicodeScript.ARABIC                            => arab += 1
          case UnicodeScript.GREEK                             => greek += 1
          case UnicodeScript.HEBREW                            => hebrew += 1
          case UnicodeScript.THAI                              => thai += 1
          case UnicodeScript.DEVANAGARI                        => deva += 1
          case _                                               => ()
        }
      }
      i += Character.charCount(cp)
    }
    if (letters == 0) None
    else {
      def wins(c: Int): Boolean = c * 4 >= letters
      if (wins(kana) || (kana > 0 && wins(kana + han))) Some("ja")
      else if (wins(han)) Some("zh")
      else if (wins(hangul)) Some("ko")
      else if (wins(cyr)) Some("ru")
      else if (wins(arab)) Some("ar")
      else if (wins(greek)) Some("el")
      else if (wins(hebrew)) Some("he")
      else if (wins(thai)) Some("th")
      else if (wins(deva)) Some("hi")
      else None
    }
  }

  def detectLanguage(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    scriptLang(text) match {
      case Some(lang) => lang
      case None =>
        val toks = text.toLowerCase.split("\\W+").filter(_.nonEmpty).take(500)
        if (toks.isEmpty) return "und"
        var best = "und"; var bestScore = 0
        profiles.foreach { case (lang, stops) =>
          val score = toks.count(stops.contains)
          if (score > bestScore) { best = lang; bestScore = score }
        }
        if (bestScore * 20 < toks.length) "und" else best // >= 5% stopword mass
    }
  }

  val langIdUdf = udf((t: String) => detectLanguage(t))

  def withLanguage(docs: DataFrame): DataFrame =
    docs.withColumn("lang_detected", langIdUdf(col("text")))

  /** Per-document language-consistency signals — the corpus-QA pass that
    * catches template-mixed / partially-translated pages a doc-level langid
    * hides (a page whose nav is English and body is German ids as one or
    * the other; per-paragraph voting exposes the mix). Splits on blank
    * lines, ids each paragraph, and reports the majority language, its
    * paragraph share, and the distinct-language count per document.
    *
    * Output `(doc_id, n_paragraphs, n_langs, majority_lang, majority_ppm,
    * mixed)`; documents with no non-blank paragraph get (0, 0, 'und',
    * 0, false).
    *
    * Scale shape: explode → map-only langid → two aggregations over narrow
    * (id, lang) rows — the text itself never crosses a shuffle. Majority
    * ties break to the lexicographically smallest language (min-struct on
    * (-count, lang)); the share is integer ppm so the gate hash-compares
    * exactly cross-engine. */
  def mixedLanguageSignals(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val paras = docs.select(col(idCol),
        // CRLF-aware: a Windows-lineended page's blank lines are \r\n\r\n
        explode(filter(split(col(textCol), "(\\r?\\n){2,}"),
          p => length(trim(p)) > 0)).as("para"))
      .select(col(idCol), langIdUdf(col("para")).as("plang"))
    val counts = paras.groupBy(idCol, "plang").agg(count(lit(1)).as("n"))
    val agg = counts.groupBy(idCol).agg(
      sum("n").as("n_paragraphs"),
      count(lit(1)).as("n_langs"),
      min(struct((-col("n")).as("negn"), col("plang"))).as("maj"))
    val out = agg.select(col(idCol), col("n_paragraphs"), col("n_langs"),
      col("maj.plang").as("majority_lang"),
      expr("CAST((-maj.negn) * 1000000 div n_paragraphs AS BIGINT)")
        .as("majority_ppm"),
      (col("n_langs") > 1).as("mixed"))
    docs.select(col(idCol)).join(out, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_paragraphs"), lit(0L)).as("n_paragraphs"),
        coalesce(col("n_langs"), lit(0L)).as("n_langs"),
        coalesce(col("majority_lang"), lit("und")).as("majority_lang"),
        coalesce(col("majority_ppm"), lit(0L)).as("majority_ppm"),
        coalesce(col("mixed"), lit(false)).as("mixed"))
  }

  // ------------------------------------------------------------ tokens

  /** whitespace token count — pure built-ins, identical SQL exists for the
    * oracle: length-based to avoid regex dialect drift. */
  def tokenCountCol(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword segment count: word-piece boundaries at letter/digit/
    * punctuation class changes (a GPT-2-style pre-tokenizer regex). */
  val bpeishCountUdf = udf { (t: String) =>
    if (t == null) 0L
    else "[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]+|\\s+".r.findAllIn(t).count(_.trim.nonEmpty).toLong
  }

  // ------------------------------------------------------------ quality

  /** Quality signals with exact SQL twins (length arithmetic only):
    * n_chars, token count, mean token length, space ratio. */
  def qualitySignals(docs: DataFrame): DataFrame = {
    val t = col("text")
    val chars = length(t).cast("long")
    val spaces = (length(t) - length(replace(t, lit(" "), lit("")))).cast("long")
    val toks = tokenCountCol(t)
    docs.select(col("doc_id"), chars.as("n_chars_c"), toks.as("n_tokens"),
      spaces.as("n_spaces"),
      when(toks > 0, round(chars.cast("double") / toks, 4)).otherwise(lit(0.0))
        .as("mean_tok_len"))
  }

  /** Composite quality score (heuristic; UDF-free). */
  def qualityScore(docs: DataFrame): DataFrame = {
    val s = qualitySignals(docs)
    s.withColumn("quality",
      round(
        when(col("n_tokens") >= 10, lit(0.5)).otherwise(lit(0.0)) +
        when(col("mean_tok_len").between(3.0, 12.0), lit(0.3)).otherwise(lit(0.0)) +
        when(col("n_chars_c") >= 100, lit(0.2)).otherwise(lit(0.0)), 2))
  }

  // ------------------------------------------------------------ fingerprint

  /** Rolling-hash (Rabin-Karp window) document fingerprint: min of window
    * hashes — a winnowing-style content id robust to small edits. */
  def fingerprint(text: String, window: Int = 16): Long = {
    if (text == null || text.isEmpty) return 0L
    val bs = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (bs.length <= window) {
      var h = 0xcbf29ce484222325L
      bs.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      return h
    }
    val B = 257L
    var pow = 1L
    (1 until window).foreach(_ => pow *= B)
    var h = 0L
    var minH = Long.MaxValue
    var i = 0
    while (i < bs.length) {
      h = h * B + (bs(i) & 0xffL)
      if (i >= window) h -= pow * B * (bs(i - window) & 0xffL)
      if (i >= window - 1) {
        val m = h * 0x9e3779b97f4a7c15L // finalize for spread
        if (m < minH) minH = m
      }
      i += 1
    }
    minH
  }

  val fingerprintUdf = udf((t: String) => fingerprint(t))

  // ------------------------------------------------------------ corpus ops

  /** Paragraph-level exact dedup (the CCNet-style pass): explode documents
    * into newline-separated paragraphs, group identical paragraphs, keep the
    * lowest doc_id. One explode + one hash-groupBy shuffle keyed on the
    * paragraph text (or its sha at scale); map-side partial agg applies. */
  def paragraphDedup(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        explode(split(col(textCol), "\\r?\\n")).as("paragraph"))
      .filter(length(trim(col("paragraph"))) > 0)
      .groupBy("paragraph")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))

  /** PII scrubbing (training-data hygiene): replace email addresses and
    * international-format phone numbers with redaction tokens. Pure
    * `regexp_replace` — codegen'd, no UDF; the patterns are RE2-compatible
    * so the same expressions run in any engine. */
  // ONE pattern set shared by piiScrub and piiCounts: the routing
  // invariant "n_email == 0 implies the scrub is a no-op" holds only if
  // both methods literally reference the same regex
  private val piiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val piiPhoneRe = "\\+\\d{1,3}-\\d{3}-\\d{4}"
  private val piiIpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def piiScrub(text: Column): Column =
    regexp_replace(regexp_replace(text, piiEmailRe, "[EMAIL]"),
      piiPhoneRe, "[PHONE]")

  /** PII localization counts — the triage complement to [[piiScrub]]: how
    * many matches of each class a document carries, so a pipeline can
    * route "one stray email" differently from "a dumped address book"
    * (scrub vs drop). Same RE2-compatible patterns as the scrub, plus
    * IPv4; pure regexp_count built-ins, map-only, shuffle-free. */
  def piiCounts(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      regexp_count(col(textCol), lit(piiEmailRe)).cast("long").as("n_email"),
      regexp_count(col(textCol), lit(piiPhoneRe)).cast("long").as("n_phone"),
      regexp_count(col(textCol), lit(piiIpRe)).cast("long").as("n_ip"))

  /** Line-repetition ratio (boilerplate/spam signal): 1 - distinct/total
    * over newline-split lines. UDF-free array arithmetic. */
  def repetitionRatio(text: Column): Column = {
    val lines = split(text, "\n")
    when(size(lines) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(lines)).cast("double") / size(lines))
  }

  /** C4-style line filter (the Raffel et al. cleaning pass): keep only
    * lines that end in terminal punctuation, have at least `minWords`
    * whitespace words, and carry no code/boilerplate markers ("{",
    * "javascript", "lorem ipsum", "cookie", case-insensitive); then drop
    * documents left with fewer than `minLines` surviving lines. Pure
    * filter/transform array ops — codegen'd, no UDF, no shuffle: the pass
    * is embarrassingly parallel over documents, which is what makes it
    * viable as the first cut on a 100 TB raw crawl.
    *
    * Returns (doc_id, clean_text, n_kept_lines).
    */
  def c4LineFilter(docs: DataFrame, textCol: String = "text",
      minWords: Int = 3, minLines: Int = 1): DataFrame = {
    val keepLine = (l: Column) => {
      val t = trim(l)
      val lc = lower(t)
      t.rlike("[.!?\"']$") &&
        size(split(t, "\\s+")) >= minWords &&
        !lc.contains("{") && !lc.contains("javascript") &&
        !lc.contains("lorem ipsum") && !lc.contains("cookie")
    }
    val kept = filter(split(col(textCol), "\n"), keepLine)
    docs.withColumn("kept_", kept)
      .filter(size(col("kept_")) >= minLines)
      .select(col("doc_id"),
        array_join(col("kept_"), "\n").as("clean_text"),
        size(col("kept_")).as("n_kept_lines"))
  }

  /** Benchmark decontamination — the train/test-leak gate of an LLM data
    * pipeline: a training document is contaminated if any length-`n` token
    * window of it also occurs in an evaluation benchmark. Both sides
    * tokenize and slide the same window (transform/slice/xxhash64 — all
    * codegen'd, no UDF); the benchmark's gram-hash set is DISTINCT'd and
    * **broadcast**, so the 100 TB corpus side never shuffles: each doc is
    * scored with a map-side semi-join (benchmarks are small — ~10^4 docs →
    * ~10^7 64-bit hashes, well under broadcast limits). Returns one row per
    * input doc: (doc_id, n_contaminated distinct colliding grams,
    * contaminated flag).
    */
  /** Distinct xxhash64 of every n-token whitespace window — the ONE
    * window-hash contract shared by decontaminate (lowercase=true:
    * case-insensitive leak matching) and windowDedupStats (lowercase=false:
    * Lee et al.'s exact substrings). Both gates are oracle-checked against
    * the same hash recipe; keeping it in one place stops them drifting. */
  /** THE n-token window-hash kernel, positional (hash of the window
    * starting at each token index, in order, no dedup). Every pass that
    * measures, cuts, or compares window sets must build on this one
    * expression — a second copy of the recipe (separator, tokenizer,
    * hash) would let the measured and the edited sets drift. */
  private def positionalWindowHashes(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => xxhash64(array_join(slice(toks, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<bigint>"))

  private def windowHashes(c: Column, n: Int, lowercase: Boolean): Column =
    array_distinct(positionalWindowHashes(
      split(trim(if (lowercase) lower(c) else c), "\\s+"), n))

  /** Cross-document exact-substring REMOVAL (the cut pass of Lee et al.
    * 2021's EXACTSUBSTR, n-token-window formulation — [[windowDedupStats]]
    * measures, this one edits): every n-token window that appears in at
    * least `minDocs` documents is duplicated text; the corpus keeps its
    * FIRST occurrence (min (doc_id, pos)) and removes every token covered
    * by a non-first occurrence. Returns one row per input doc:
    * `(doc_id, clean_text, n_removed_windows)` — surviving tokens rejoin
    * in document order.
    *
    * Scale shape (the suffix-array replacement that buckets by hash):
    *   - positional window hashes explode to narrow (id, pos, hash) rows —
    *     O(corpus tokens), the only corpus-sized shuffle, hash-keyed with
    *     partial aggregation;
    *   - the duplicated-window set and its owner come from one groupBy
    *     (count-distinct docs + min-struct);
    *   - non-owner occurrences join back BY HASH and collapse to per-doc
    *     start lists (bounded by doc length);
    *   - the cut is map-only: covered = union of [p, p+n) spans, kept
    *     indices via array_except (hash-set membership — linear in doc
    *     length, never the T x P scan).
    * Within-doc repeats of a window the corpus doesn't share are t10/d7's
    * domain; this pass is the cross-document one. */
  def windowDedupRemove(docs: DataFrame, n: Int, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n >= 1, s"window must be >= 1 token, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    def toks(c: Column): Column = split(trim(c), "\\s+")
    val base = docs.select(col(idCol), col(textCol))
    // `wins` is consumed twice (owner election, join-back) and is
    // deliberately RECOMPUTED, not checkpointed: it is a map-only explode
    // of the corpus — re-running the scan is cheaper than materializing
    // O(corpus tokens) of narrow rows as cluster state
    val wins = base
      .select(col(idCol),
        when(length(trim(col(textCol))) > 0, toks(col(textCol)))
          .otherwise(array().cast("array<string>")).as("tk"))
      .select(col(idCol), positionalWindowHashes(col("tk"), n).as("ws"))
      .select(col(idCol), posexplode(col("ws")).as(Seq("pos", "h")))
    val dup = wins.groupBy("h")
      .agg(countDistinct(col(idCol)).as("ndocs"),
        min(struct(col(idCol).as("oid"), col("pos").as("opos"))).as("owner"))
      .filter(col("ndocs") >= minDocs)
      .select(col("h"), col("owner.oid").as("oid"), col("owner.opos").as("opos"))
    val remove = wins.join(dup, Seq("h"))
      .filter(!(col(idCol) === col("oid") && col("pos") === col("opos")))
      .groupBy(idCol).agg(collect_set(col("pos")).as("starts"))
    // clean_text is UNIFORMLY whitespace-normalized (tokens rejoined with
    // single spaces) — including docs with nothing removed. The rejoin is
    // unavoidable on edited docs, and normalizing the untouched branch the
    // same way means downstream structure-sensitive ops (paragraphDedup,
    // mixedLanguageSignals) see one canonical form instead of a form that
    // depends on whether a doc happened to be cut.
    base.join(remove, Seq(idCol), "left")
      .select(col(idCol),
        when(col("starts").isNull, array_join(toks(col(textCol)), " ")).otherwise {
          val t = toks(col(textCol))
          val covered = array_distinct(flatten(transform(col("starts"),
            p => sequence(p, p + n - 1))))
          val keptIdx = array_except(sequence(lit(0), size(t) - 1), covered)
          array_join(transform(keptIdx, i => element_at(t, i + 1)), " ")
        }.as("clean_text"),
        coalesce(size(col("starts")), lit(0)).cast("long")
          .as("n_removed_windows"))
  }

  def decontaminate(docs: DataFrame, benchmark: DataFrame,
      n: Int = 13, textCol: String = "text"): DataFrame = {
    def gramHashes(c: Column): Column = windowHashes(c, n, lowercase = true)
    val benchGrams = benchmark
      .select(explode(gramHashes(col(textCol))).as("gram")).distinct()
    val hits = docs
      .select(col("doc_id"), explode(gramHashes(col(textCol))).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("hits"))
    docs.select(col("doc_id")).join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("hits"), lit(0L)).as("n_contaminated"),
        (coalesce(col("hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Gopher-style document quality rules (Rae et al. 2021, appendix A —
    * the published repetition/format gate most corpus pipelines run after
    * line cleaning). Per document: word count bounds, mean word length
    * bounds, symbol-to-word ratio ("#" or "..."), bullet-line and
    * ellipsis-line fractions, alphabetic-word fraction, and a minimum
    * stop-word hit count; `keep` ANDs the canonical thresholds. Every
    * signal is pure array/length arithmetic over split() results —
    * codegen'd, no UDF, no shuffle: the gate is embarrassingly parallel
    * over documents (the property that makes it runnable as a map pass on
    * a 100 TB corpus). Ratios round to 4 places so the DuckDB oracle can
    * reproduce them bit-exactly.
    */
  def gopherSignals(docs: DataFrame, textCol: String = "text",
      minWords: Long = 50, maxWords: Long = 100000): DataFrame = {
    val t = col(textCol)
    val words = split(trim(t), "\\s+")
    val nWords = when(length(trim(t)) === 0, lit(0L))
      .otherwise(size(words).cast("long"))
    val sumWordLen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
    val meanWlen = when(nWords > 0,
      round(sumWordLen.cast("double") / nWords, 4)).otherwise(lit(0.0))
    val nHash = (length(t) - length(replace(t, lit("#"), lit("")))).cast("long")
    val nEllipsis = ((length(t) - length(replace(t, lit("..."), lit("")))) / 3).cast("long")
    val symbolRatio = when(nWords > 0,
      round((nHash + nEllipsis).cast("double") / nWords, 4)).otherwise(lit(0.0))
    val lines = filter(split(t, "\n"), l => length(trim(l)) > 0)
    val nLines = size(lines).cast("long")
    val bulletFrac = when(nLines > 0,
      round(size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("double") / nLines, 4))
      .otherwise(lit(0.0))
    val ellipsisFrac = when(nLines > 0,
      round(size(filter(lines, l => trim(l).rlike("\\.\\.\\.$"))).cast("double") / nLines, 4))
      .otherwise(lit(0.0))
    val alphaFrac = when(nWords > 0,
      round(size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double") / nWords, 4))
      .otherwise(lit(0.0))
    val stopSet = array(Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(lit): _*)
    val stopHits = size(array_intersect(transform(words, w => lower(w)), stopSet))
      .cast("long")
    docs.select(col("doc_id"),
      nWords.as("g_words"), meanWlen.as("g_mean_wlen"),
      symbolRatio.as("g_symbol_ratio"), bulletFrac.as("g_bullet_frac"),
      ellipsisFrac.as("g_ellipsis_frac"), alphaFrac.as("g_alpha_frac"),
      stopHits.as("g_stops"),
      (nWords.between(minWords, maxWords) &&
        meanWlen.between(3.0, 10.0) &&
        symbolRatio <= 0.1 &&
        bulletFrac <= 0.9 &&
        ellipsisFrac <= 0.3 &&
        alphaFrac >= 0.8 &&
        stopHits >= 2).as("keep"))
  }

  /** Exact-substring duplication stats (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better" — the EXACTSUBSTR pass):
    * for each document, how many of its n-token windows also occur in some
    * OTHER document. Lee et al. build a corpus suffix array; the Spark-first
    * equivalent hashes every n-token window (codegen'd transform/slice, no
    * UDF), explodes to narrow (doc_id, hash) rows, and group-counts distinct
    * documents per window — three shuffles that all carry two longs per row,
    * the bucketable-by-hash shape that scales to a 100 TB corpus where a
    * monolithic suffix array cannot be built.
    *
    * Returns (doc_id, n_windows, n_dup_windows): distinct window hashes in
    * the doc, and how many of them appear in >= 2 distinct documents.
    * Deterministic integers at any parallelism (the downstream gate is
    * typically n_dup_windows / n_windows > threshold). */
  def windowDedupStats(docs: DataFrame, n: Int, textCol: String = "text"): DataFrame = {
    val wh = windowHashes(col(textCol), n, lowercase = false)
    val win = docs.select(col("doc_id"), explode(wh).as("w"))
    val dupW = win.groupBy("w").agg(count(lit(1)).as("nd")).filter(col("nd") >= 2)
      .select("w")
    val perDoc = win.join(dupW, Seq("w"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_windows"))
    docs.select(col("doc_id"), size(wh).as("n_windows"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows").cast("long").as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
  }

  /** Encoding quality over raw page BYTES — the filter that runs before any
    * text op can trust `.cast("string")`: a crawl corpus carries mislabeled
    * charsets, truncated multibyte tails, and binary junk served as
    * text/html.
    *
    * Returns per row: byte count, count of bytes rejected by a UTF-8
    * validity scan, and a verdict column
    * (`ascii` | `utf8` | `utf8-bom` | `invalid`).
    *
    * Scan rules (deliberately the lenient-decoder semantics: one invalid
    * count per rejected byte, resync at the next byte — what a
    * REPLACE-mode decoder emits U+FFFD for): lead bytes C2–DF/E0–EF/F0–F4
    * open 2/3/4-byte sequences, continuations must be 80–BF, C0/C1/F5–FF
    * and bare continuations are invalid, a truncated tail counts once per
    * consumed lead. Overlong/surrogate payload checks are out of scope
    * (documented simplification — they need the decoded code point, and
    * mislabeled corpora are caught by the byte-level rules).
    *
    * A byte-level state machine is a deliberate UDF kernel (same rationale
    * as Sniff's signature scan); the pass is map-only — at 100 TB it
    * pipelines with the scan. */
  def encodingSignals(docs: DataFrame, binCol: String = "raw",
      idCol: String = "doc_id"): DataFrame = {
    val sigUdf = udf { (bytes: Array[Byte]) =>
      if (bytes == null) (0L, 0L, "invalid")
      else {
        val n = bytes.length
        val bom = n >= 3 && (bytes(0) & 0xff) == 0xef &&
          (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf
        var i = if (bom) 3 else 0
        var invalid = 0L
        var ascii = true
        while (i < n) {
          val b = bytes(i) & 0xff
          if (b < 0x80) i += 1
          else {
            ascii = false
            val len =
              if (b >= 0xc2 && b <= 0xdf) 2
              else if (b >= 0xe0 && b <= 0xef) 3
              else if (b >= 0xf0 && b <= 0xf4) 4
              else 0
            if (len == 0) { invalid += 1; i += 1 }
            else {
              var ok = i + len <= n
              var j = i + 1
              while (ok && j < i + len) {
                val c = bytes(j) & 0xff
                ok = c >= 0x80 && c <= 0xbf
                j += 1
              }
              if (ok) i += len
              else { invalid += 1; i += 1 } // reject the lead, resync
            }
          }
        }
        val verdict =
          if (invalid > 0) "invalid"
          else if (bom) "utf8-bom"
          else if (ascii) "ascii"
          else "utf8"
        (n.toLong, invalid, verdict)
      }
    }
    docs.withColumn("_enc", sigUdf(col(binCol)))
      .select(col(idCol), col("_enc._1").as("n_bytes"),
        col("_enc._2").as("n_invalid"), col("_enc._3").as("encoding"))
  }

  /** One-sided containment pairs — the near-dup relation symmetric Jaccard
    * misses: a short document quoted wholesale inside a long one has tiny
    * Jaccard but containment(A→B) = |W(A)∩W(B)| / |W(A)| ≈ 1 (the
    * "substring duplication" Lee et al. 2021 target, kept set-shaped here:
    * W = distinct n-token windows).
    *
    * Scale shape: windows explode to narrow (doc_id, hash) rows; windows
    * shared by more than `maxDocsPerWindow` docs are dropped BEFORE the
    * self-join (boilerplate windows would otherwise emit O(m²) pair rows —
    * the same hot-bucket cap as the LSH ops; dropping hot windows only
    * lowers measured containment for boilerplate, which is exactly the
    * content containment should not score). The join key is the window
    * hash, pair aggregation is a hash groupBy, and the score is integer
    * micro-units (shared·10⁶ div |W(a)|) so the gate hash-compares.
    * Emits both directions; `containment_micro >= minContainMicro` rows
    * only. */
  def containmentPairs(docs: DataFrame, n: Int, textCol: String = "text",
      minContainMicro: Long = 500000L, maxDocsPerWindow: Int = 64): DataFrame = {
    val wh = windowHashes(col(textCol), n, lowercase = true)
    val win = docs.select(col("doc_id"), explode(wh).as("h"))
    val cold = win.join(
      win.groupBy("h").agg(count(lit(1)).as("nd"))
        .filter(col("nd") <= maxDocsPerWindow).select("h"),
      Seq("h"), "left_semi")
    val sizes = docs.select(col("doc_id").as("doc_a"),
      size(wh).cast("long").as("nw_a")).filter(col("nw_a") > 0)
    val pairs = cold.alias("a").join(cold.alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    pairs.join(sizes, Seq("doc_a"))
      .withColumn("containment_micro", expr("shared * 1000000 div nw_a"))
      .filter(col("containment_micro") >= minContainMicro)
      .select("doc_a", "doc_b", "shared", "nw_a", "containment_micro")
  }

  /** TF-IDF top-k terms per document, in exact integer arithmetic so the
    * result hash-compares across engines (floating idf = ln(N/df) is libm-
    * dependent in its last ulp; `score_micro = tf·10^6 div df` preserves
    * the tf/df ordering for fixed tf ranges and is bit-identical
    * everywhere). Shapes, in corpus-scale order: one explode + hash-groupBy
    * for per-doc term counts (map-side combine applies), document frequency
    * re-aggregated FROM the tf frame (the (doc,term) distinct already
    * happened — no second pass over raw text), a sort-merge join on term
    * (the term dictionary can exceed broadcast size at web scale), and a
    * per-doc top-k window whose constant rank bound engages
    * WindowGroupLimit below the exchange. */
  def tfidfTopK(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col("doc_id"),
        explode(split(lower(col(textCol)), "\\W+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, Seq("term"))
      .withColumn("score_micro", expr("tf * 1000000L div df"))
      .withColumn("rn_", row_number().over(Window.partitionBy("doc_id")
        .orderBy(desc("score_micro"), asc("term"))))
      .filter(col("rn_") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score_micro"), col("rn_").cast("long").as("rank"))
  }

  /** Rarity bucketing (the CCNet head/middle/tail split, rank-based
    * instead of LM-perplexity so it is model-free and engine-exact): each
    * token gets its corpus frequency rank (1 = most frequent; row_number
    * over (count desc, term asc) — fully deterministic, no dense_rank
    * ties); each document scores the integer mean rank of its tokens in
    * micro units; buckets cut at FIXED fractions of the vocabulary size
    * (mean rank ≤ 25% of vocab → head, ≤ 60% → middle, else tail).
    *
    * The thresholds are two broadcast scalars — never a global ntile sort,
    * which would single-partition the corpus: every per-doc decision is a
    * map-side comparison, and the only shuffles are the token count
    * aggregation and the term-dictionary join.
    *
    * The dictionary rank itself is the classic global-enumeration trap: a
    * raw web-crawl vocabulary (typos, ids, urls — no frequency floor here)
    * is 10^8-10^9 distinct tokens, and `row_number() OVER (ORDER BY n
    * DESC, term)` with no partition funnels all of it through ONE task. So
    * the rank is decomposed exactly like [[Sampling.globalRowNumbers]] /
    * `HostAnalysis.crawlBudget`: range-bucket the dictionary by a MONOTONE
    * PREFIX of the sort key — (n, first two chars of term); UTF-8 byte
    * order makes the char prefix order-consistent with full-term order —
    * aggregate per-bucket counts, cumulative-sum them into per-bucket
    * offsets (a window over BUCKET-COUNT rows, never vocabulary rows:
    * distinct n values are O(sqrt(total tokens)) and only n values shared
    * by many terms fan out across char buckets), broadcast the offsets
    * back, and row_number WITHIN each (n, prefix) bucket. Rank values are
    * bit-identical to the naive spelling (the oracle still uses plain
    * row_number), but no vocabulary-sized partition-less WindowExec exists
    * in the plan (spec-asserted in OpsSpec). */
  def rarityBuckets(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col("doc_id"),
        explode(split(lower(col(textCol)), "\\W+")).as("term"))
      .filter(col("term") =!= "")
    // the dictionary feeds THREE consumers (bucket offsets, the rank join,
    // the vocab scalar) — checkpoint the one narrow vocabulary-sized frame
    // so the corpus explode+groupBy runs once, not per consumer (the
    // crawlBudget/semDedup staged-frame rule; note this makes the call
    // eager at the dictionary stage)
    val counted = toks.groupBy("term").agg(count(lit(1)).as("n"))
      .withColumn("_rb", substring(col("term"), 1, 2))
      .localCheckpoint(true)
    val offs = counted.groupBy("n", "_rb").agg(count(lit(1)).as("_rn"))
      .withColumn("_roff", coalesce(
        sum("_rn").over(Window.orderBy(desc("n"), asc("_rb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("n", "_rb", "_roff")
    val dict = counted.join(broadcast(offs), Seq("n", "_rb"))
      .withColumn("rank", (col("_roff") + row_number().over(
        Window.partitionBy("n", "_rb").orderBy(asc("term")))).cast("long"))
      .drop("_rb", "_roff")
    val vocab = dict.agg(count(lit(1)).as("vocab"))
    val perDoc = toks.join(dict.select("term", "rank"), Seq("term"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum("rank").as("sum_rank"))
      .withColumn("mean_rank_micro", expr("sum_rank * 1000000L div n_toks"))
    perDoc.crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("n_toks"), col("mean_rank_micro"),
        when(col("mean_rank_micro") * 100 <= col("vocab") * lit(25000000L), lit("head"))
          .when(col("mean_rank_micro") * 100 <= col("vocab") * lit(60000000L), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** DSIR featurization (Xie et al., "Data Selection for Language Models
    * via Importance Resampling", NeurIPS 2023): unigram + bigram whitespace
    * features. All built-ins (split/slice/zip_with), codegen'd. */
  private def dsirGramsCol(text: Column): Column = {
    val toks = filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)
    val n1 = greatest(size(toks) - 1, lit(0))
    val bi = zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    concat(toks, bi)
  }

  /** DSIR importance scores: per-document log-likelihood ratio between a
    * TARGET gram distribution and the RAW corpus distribution — the score
    * importance resampling ranks by when selecting pretraining data that
    * "looks like" a high-quality target domain.
    *
    *   score(d) = Σ_{g ∈ grams(d)} [ ln((p_g+1)/(P+V)) − ln((q_g+1)/(Q+V)) ]
    *
    * (+1 smoothing over the observed feature space V; p/q = target/corpus
    * gram counts, P/Q their totals). Rounded to 4 decimals so the value is
    * engine-portable despite float summation order.
    *
    * Two feature spaces, one pipeline:
    *   - `buckets = 0` (exact grams): the feature LUT is vocabulary-sized —
    *     the corpus⋈LUT scoring join is sort-merge. Oracle-friendly.
    *   - `buckets > 0` (hashed): DSIR's actual scale shape — grams hash
    *     into a FIXED feature dimension, the LUT is `buckets` rows and
    *     BROADCASTS, so scoring 100 TB is one map pass + a narrow
    *     (doc_id, partial-sum) combine; no corpus-wide gram shuffle ever.
    * Both smooth over the OCCUPIED feature count, so on a collision-free
    * corpus the two variants emit identical scores (spec-asserted).
    *
    * The distribution-learning pass (two gram groupBys) is one corpus scan;
    * at 100 TB q̂ is typically learned on a hash-sample (x1) first — the
    * scoring pass accepts any (corpus, target) pair so that composes. */
  def dsirScores(corpus: DataFrame, target: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 0): DataFrame = {
    val featOf: Column => Column =
      if (buckets > 0) g => pmod(xxhash64(g), lit(buckets.toLong))
      else g => g
    val docGrams = corpus.select(col(idCol),
      explode(dsirGramsCol(col(textCol))).as("gram"))
      .select(col(idCol), featOf(col("gram")).as("f"))
    val q = docGrams.groupBy("f").agg(count(lit(1)).as("qc"))
    val p = target.select(explode(dsirGramsCol(col(textCol))).as("gram"))
      .select(featOf(col("gram")).as("f"))
      .groupBy("f").agg(count(lit(1)).as("pc"))
    val feats = q.join(p, Seq("f"), "full_outer")
      .select(col("f"), coalesce(col("qc"), lit(0L)).as("qc"),
        coalesce(col("pc"), lit(0L)).as("pc"))
    val stats = feats.agg(count(lit(1)).as("v"),
      sum("qc").as("qt"), sum("pc").as("pt"))
    val lut = feats.crossJoin(broadcast(stats))
      .select(col("f"),
        (log((col("pc") + 1).cast("double") / (col("pt") + col("v"))) -
         log((col("qc") + 1).cast("double") / (col("qt") + col("v")))).as("l"))
    val scored =
      if (buckets > 0) docGrams.join(broadcast(lut), Seq("f"))
      else docGrams.join(lut, Seq("f"))
    scored.groupBy(idCol)
      .agg(round(sum("l"), 4).as("dsir_score"), count(lit(1)).as("n_grams"))
  }

  /** Top-k n-grams by frequency (corpus statistics): tokenize, slide an
    * n-window via transform/slice (codegen'd — no UDF), explode, count,
    * global top-k. The orderBy+limit is a TakeOrderedAndProject, so only k
    * rows cross the final exchange. */
  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val grams = transform(sequence(lit(0), size(toks) - n),
      i => array_join(slice(toks, i + 1, lit(n)), " "))
    docs.filter(size(toks) >= n)
      .select(explode(grams).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("ngram")).limit(k)
  }

  /** Unigram-LM cross-entropy per document — the absolute-perplexity leg of
    * the CCNet quality trio (rarityBuckets is the rank proxy, dsirScores the
    * target/corpus RATIO; this is the plain language-model surprisal a
    * perplexity filter thresholds on):
    *
    *   nll_sum(d) = Σ_{t ∈ tokens(d)} −ln((c_t + 1) / (T + V))
    *
    * with +1 smoothing over the observed vocabulary (c_t = corpus token
    * count, T total tokens, V vocab size). Cross-entropy = nll_sum /
    * n_tokens; emitted as the (rounded sum, count) pair so the division
    * never rides on float rounding. Rounded to 4 decimals (the dsirScores
    * treatment) so values hash-compare across engines despite summation
    * order.
    *
    * Shape at 100 TB: the LM pass is ONE token groupBy (map-side combine);
    * V and T broadcast as two scalars; the scoring join is token-keyed
    * sort-merge (the vocabulary of a web corpus exceeds broadcast) followed
    * by a per-doc combine of narrow (doc_id, nll) rows. In production the
    * LM is typically learned on a hash-sample (Sampling.hashSample) first —
    * scoring is unchanged. */
  def unigramCrossEntropy(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(filter(split(lower(trim(col(textCol))), "\\s+"),
        t => length(t) > 0)).as("tok"))
    val lm = toks.groupBy("tok").agg(count(lit(1)).as("tc"))
    val stats = lm.agg(count(lit(1)).as("v"), sum("tc").as("tt"))
    val lut = lm.crossJoin(broadcast(stats))
      .select(col("tok"),
        (-log((col("tc") + lit(1)).cast("double") / (col("tt") + col("v"))))
          .as("nll"))
    toks.join(lut, Seq("tok"))
      .groupBy(idCol)
      .agg(round(sum("nll"), 4).as("nll_sum"), count(lit(1)).as("n_tokens"))
  }
}
