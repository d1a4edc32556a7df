package graft.core

/** robots.txt evaluation with the reference's gating semantics
  * (reference: crawler/internal/fetcher/robots.go):
  *
  * - only 2xx robots responses are parsed; anything else (404, 5xx, fetch
  *   error, parse error) means allow-all (robots.go:195-218, 138-162)
  * - body capped at 512 KB (robots.go:25)
  * - per-host rules; disallowed URL ⇒ frontier dead("robots_blocked")
  *
  * The matcher implements the robots exclusion protocol (RFC 9309 /
  * Google REP — the spec the reference's matcher, temoto/robotstxt,
  * implements): User-agent groups, Allow/Disallow with `*` (any
  * sequence) and `$` (end anchor, only at pattern end — elsewhere
  * literal) wildcards, Crawl-delay; the MOST SPECIFIC rule wins, where
  * specificity is the raw pattern's octet length, and allow wins ties.
  * Plain prefixes behave exactly as before (anchored prefix match,
  * specificity = length), so the wildcard support strictly extends the
  * previous subset.
  */
final case class RobotsRules(
    allowAll: Boolean,
    allows: Vector[String],
    disallows: Vector[String],
    crawlDelayMs: Option[Long]
) {

  // compiled once per JVM that evaluates the rules (broadcast-friendly)
  @transient private lazy val allowPats = allows.map(RobotsRules.compile)
  @transient private lazy val disallowPats = disallows.map(RobotsRules.compile)

  /** Longest (most specific) match wins; tie → allow; no match → allow.
    * Empty Disallow lines are ignored (allow-everything markers).
    */
  def isAllowed(path: String): Boolean = {
    if (allowAll) return true
    val p = if (path.isEmpty) "/" else path
    def best(pats: Vector[(java.util.regex.Pattern, Int)]): Int =
      pats.collect { case (rx, spec) if rx.matcher(p).find() => spec }
        .maxOption.getOrElse(-1)
    best(allowPats) >= best(disallowPats)
  }
}

object RobotsRules {
  val AllowAll: RobotsRules = RobotsRules(allowAll = true, Vector.empty, Vector.empty, None)

  /** Compile one robots pattern to (anchored regex, specificity).
    * `*` → `.*`; a TRAILING `$` anchors the end (elsewhere it is a
    * literal, matching Google's parser); everything else is literal.
    * Specificity is the raw pattern length (RFC 9309 "octets in the
    * pattern" order).
    */
  private[core] def compile(pattern: String): (java.util.regex.Pattern, Int) = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < pattern.length) {
      pattern.charAt(i) match {
        case '*' => sb.append(".*")
        case '$' if i == pattern.length - 1 => sb.append('$')
        case c if "\\^$.|?+()[]{}".indexOf(c.toInt) >= 0 =>
          sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    (java.util.regex.Pattern.compile(sb.toString), pattern.length)
  }

  /** Gate + parse per the reference's parseAndBuildEntry (robots.go:195-218). */
  def fromResponse(body: String, statusCode: Int, userAgent: String): RobotsRules =
    if (statusCode < 200 || statusCode >= 300) AllowAll
    else parse(truncate(body), userAgent)

  private def truncate(body: String): String =
    if (body.length > CrawlDefaults.MaxRobotsBytes)
      body.substring(0, CrawlDefaults.MaxRobotsBytes)
    else body

  /** Group selection: the group whose User-agent token is the longest
    * case-insensitive prefix of our agent wins; "*" is the fallback group.
    */
  def parse(body: String, userAgent: String): RobotsRules = {
    final case class Group(agents: Vector[String], allows: Vector[String],
        disallows: Vector[String], crawlDelayMs: Option[Long])
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var curAgents = Vector.empty[String]
    var curAllows = Vector.empty[String]
    var curDisallows = Vector.empty[String]
    var curDelay: Option[Long] = None
    var inRules = false

    def flush(): Unit = {
      if (curAgents.nonEmpty)
        groups += Group(curAgents, curAllows, curDisallows, curDelay)
      curAgents = Vector.empty; curAllows = Vector.empty
      curDisallows = Vector.empty; curDelay = None; inRules = false
    }

    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (inRules) flush()
              curAgents = curAgents :+ value.toLowerCase
            case "allow" =>
              inRules = true
              if (value.nonEmpty) curAllows = curAllows :+ value
            case "disallow" =>
              inRules = true
              if (value.nonEmpty) curDisallows = curDisallows :+ value
            case "crawl-delay" =>
              inRules = true
              curDelay = value.toDoubleOption.map(d => (d * 1000).toLong)
            case _ => ()
          }
        }
      }
    }
    flush()

    val ua = userAgent.toLowerCase
    val matching = groups.flatMap { g =>
      g.agents.collect {
        case "*"                         => (0, g) // fallback specificity
        case a if ua.startsWith(a)       => (a.length, g)
        case a if a.startsWith(ua) && ua.nonEmpty => (ua.length, g)
      }
    }
    if (matching.isEmpty) AllowAll
    else {
      val (_, g) = matching.maxBy(_._1)
      RobotsRules(allowAll = false, g.allows, g.disallows, g.crawlDelayMs)
    }
  }
}
