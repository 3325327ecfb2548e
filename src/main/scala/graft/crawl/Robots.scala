package graft.crawl

import scala.util.matching.Regex

/** robots.txt parsing + matching with the reference's semantics.
  *
  * Mirrors the matcher the reference's fetcher uses
  * (/root/reference/vendor/github.com/temoto/robotstxt-go/robotstxt.go:155-233,
  * applied at vendor/github.com/PuerkitoBio/fetchbot/fetch.go:387-401):
  *  - group selection: most-specific user-agent prefix match, `*` weakest;
  *  - rule selection: longest path-prefix match wins; wildcard rules (`*`,
  *    `$`) match by pattern with precedence = pattern string length; a bare
  *    "/" is the weakest possible rule;
  *  - default allow when no rule matches;
  *  - Crawl-delay in a matched group overrides the fetcher's politeness delay
  *    (fetch.go:377-386).
  *
  * Everything is immutable and serializable so parsed rules can live in the
  * per-host frontier state table and be evaluated inside fetch mapPartitions.
  */
object Robots {

  final case class Rule(path: String, allow: Boolean, pattern: Option[String]) {
    @transient private lazy val rx: Option[Regex] = pattern.map(new Regex(_))
    def matches(p: String): Boolean = rx match {
      case Some(r) => r.findFirstIn(p).isDefined
      case None    => p.startsWith(path)
    }
    /** precedence length, per robotstxt-go findRule */
    def specLen: Int = pattern.map(_.length).getOrElse(path.length)
  }

  final case class Group(agents: List[String], rules: List[Rule], crawlDelaySec: Option[Double]) {
    def test(path: String): Boolean = findRule(path).forall(_.allow)
    private def findRule(path: String): Option[Rule] = {
      var best: Option[Rule] = None
      var bestLen = 0
      rules.foreach { r =>
        r.pattern match {
          case Some(_) =>
            if (r.matches(path) && r.specLen > bestLen) { best = Some(r); bestLen = r.specLen }
          case None =>
            if (r.path == "/" && bestLen == 0) { best = Some(r); bestLen = 1 }
            else if (path.startsWith(r.path) && r.path.length > bestLen) {
              best = Some(r); bestLen = r.path.length
            }
        }
      }
      best
    }
  }

  final case class RobotsData(groups: List[Group]) {
    /** FindGroup: most specific user-agent prefix; `*` weakest (robotstxt.go:162-185). */
    def findGroup(agent: String): Option[Group] = {
      val a = agent.toLowerCase(java.util.Locale.ROOT)
      var best: Option[Group] = None
      var bestLen = 0
      groups.foreach { g =>
        g.agents.foreach { ga =>
          if (ga == "*" && bestLen == 0) { best = Some(g); bestLen = 1 }
          else if (a.startsWith(ga) && ga.length > bestLen) { best = Some(g); bestLen = ga.length }
        }
      }
      best
    }
    def testAgent(path: String, agent: String): Boolean =
      findGroup(agent).forall(_.test(path))
    def crawlDelay(agent: String): Option[Double] =
      findGroup(agent).flatMap(_.crawlDelaySec)
  }

  /** allow-everything sentinel (host had no robots.txt / fetch failed →
    * fetchbot treats agent==nil as allow, fetch.go:387). */
  val AllowAll: RobotsData = RobotsData(Nil)

  private def compileWildcard(path: String): Option[String] =
    if (path.contains('*') || path.endsWith("$")) {
      val sb = new StringBuilder("^")
      path.foreach {
        case '*' => sb.append(".*")
        case '$' => sb.append("$")
        case c   => sb.append(Regex.quote(c.toString))
      }
      Some(sb.toString)
    } else None

  def parse(content: String): RobotsData = {
    val groups = scala.collection.mutable.ListBuffer.empty[Group]
    var agents = List.empty[String]
    var rules = List.empty[Rule]
    var delay: Option[Double] = None
    var inAgentRun = false // consecutive user-agent lines accumulate

    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.reverse, rules.reverse, delay)
      agents = Nil; rules = Nil; delay = None
    }

    content.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val ci = line.indexOf(':')
        if (ci > 0) {
          val field = line.substring(0, ci).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(ci + 1).trim
          field match {
            case "user-agent" | "useragent" =>
              if (!inAgentRun) { flush(); inAgentRun = true }
              agents = value.toLowerCase(java.util.Locale.ROOT) :: agents
            case "allow" =>
              inAgentRun = false
              if (value.nonEmpty && agents.nonEmpty)
                rules = Rule(value, allow = true, compileWildcard(value)) :: rules
            case "disallow" =>
              inAgentRun = false
              if (value.nonEmpty && agents.nonEmpty)
                rules = Rule(value, allow = false, compileWildcard(value)) :: rules
            case "crawl-delay" | "crawldelay" =>
              inAgentRun = false
              try { delay = Some(value.toDouble) } catch { case _: NumberFormatException => () }
            case _ => inAgentRun = false // sitemap/host/unknown: ignored
          }
        }
      }
    }
    flush()
    RobotsData(groups.toList)
  }
}
