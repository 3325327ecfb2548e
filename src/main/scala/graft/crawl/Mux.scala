package graft.crawl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** fetchbot-style response multiplexer (the full ResponseMatcher surface of
  * /root/reference/vendor/github.com/PuerkitoBio/fetchbot/handler.go:126-233)
  * re-expressed Spark-first: a registered rule set COMPILES into one
  * `when`-chain Column that assigns a handler id per response row — the
  * dispatch is a codegen'd projection over the wave's fetched DataFrame, and
  * each handler then operates on its `filter($"handler" === id)` slice
  * (the set-oriented equivalent of fetchbot calling one Handler per
  * response).
  *
  * Matching semantics follow `ResponseMatcher.match` (handler.go:139-177):
  * every set criterion must hold (method, content type compared on the
  * base type before ';' — handler.go:180-186, inclusive status range,
  * scheme, host, path prefix, custom predicate), a rule with a path
  * criterion scores len(path) and the highest score among matching rules
  * wins (handler.go:85-97), rules without a path score 0, and no match
  * falls through to the default handler (a no-op in fetchbot,
  * handler.go:62-64). One deliberate determinism pin: the reference leaves
  * same-score ties "undefined, but one and only one will be called"
  * (handler.go:44-46, map iteration order); here ties resolve by
  * registration order, so dispatch is reproducible at any parallelism.
  *
  * Custom predicates (`ResponseMatcher.Custom`, handler.go:258-264) take a
  * boolean Column instead of a Go closure — any Catalyst expression over
  * the response row participates in matching without leaving codegen. */
object Mux {

  /** One registered response rule; unset criteria always match. */
  final case class ResponseRule(
      handler: String,
      method: Option[String] = None,
      contentType: Option[String] = None,
      statusMin: Option[Int] = None,
      statusMax: Option[Int] = None,
      scheme: Option[String] = None,
      host: Option[String] = None,
      pathPrefix: Option[String] = None,
      predicate: Option[Column] = None)

  /** Compile the rule set into the dispatch column. Column arguments name
    * the response-row fields (defaults match the Scheduler's fetched
    * frame). Go-parity url components come from the GoUrl kernels, so a
    * rule's host/path criteria see exactly what fetchbot's
    * res.Request.URL saw. */
  def dispatch(rules: Seq[ResponseRule], default: String = "default",
      methodCol: Column = col("method"), urlCol: Column = col("url"),
      statusCol: Column = col("status"),
      contentTypeCol: Column = col("content_type")): Column = {
    val ctBase = trim(split(contentTypeCol, ";").getItem(0))
    def cond(r: ResponseRule): Column = {
      val checks = Seq(
        r.method.map(m => methodCol === m),
        r.contentType.map(ct => ctBase === ct),
        (r.statusMin, r.statusMax) match {
          case (None, None) => None
          case (lo, hi) => Some(statusCol >= lo.getOrElse(0) &&
            statusCol <= hi.getOrElse(Int.MaxValue))
        },
        r.scheme.map(s => Funcs.schemeUdf(urlCol) === s),
        r.host.map(h => Funcs.hostUdf(urlCol) === h),
        r.pathPrefix.map(p => Funcs.pathUdf(urlCol).startsWith(p)),
        r.predicate
      ).flatten
      checks.reduceOption(_ && _).getOrElse(lit(true))
    }
    // highest score first (score = path length, no path = 0), ties by
    // registration order: a when-chain evaluated in this order implements
    // fetchbot's max-score scan deterministically
    val ordered = rules.zipWithIndex
      .sortBy { case (r, i) => (-r.pathPrefix.map(_.length).getOrElse(0), i) }
    ordered.foldLeft(Option.empty[Column]) { case (acc, (r, _)) =>
      Some(acc match {
        case None    => when(cond(r), lit(r.handler))
        case Some(c) => c.when(cond(r), lit(r.handler))
      })
    }.map(_.otherwise(lit(default))).getOrElse(lit(default))
  }
}
