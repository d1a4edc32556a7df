package graft.engine

import graft.core._
import java.io.StringReader
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** A feed fixture row: the corpus stand-in for polling a feed URL
  * (FIXTURES.md §2 `feeds`).
  */
final case class FeedRow(
    source_id: String,
    feed_url: String,
    body: String,
    etag: String, // server-side etag ("" = none)
    status_code: Int,
    kind: String // "rss" | "atom" | "sitemap"
)

/** Feed polling state (reference: domain/frontier.go:85-98, migrations
  * 016-018).
  */
final case class FeedPollState(
    source_id: String,
    last_etag: String, // "" = none
    last_item_count: Int,
    consecutive_errors: Int,
    last_error_type: String, // "" = none
    next_poll_at: Long
)

/** F4/F5: RSS/Atom + sitemap ingest with conditional-GET state and
  * rate-limit backoff (reference: crawler/internal/feed/parser.go:26-60,
  * sitemap.go:49-130, poller.go:95-231,288-316,
  * database/feed_state_repository.go:69-78).
  *
  * XML parsing is StAX (JDK built-in) over the fixture body — scalar
  * per-feed work that runs inside a mapPartitions stage when driven at
  * scale; feeds are control-plane-small next to the frontier.
  */
object FeedIngest {

  /** Item links of an RSS (`item/link` text) or Atom (`entry/link@href`)
    * document, in document order.
    */
  def parseFeedLinks(xml: String): Either[String, Seq[String]] = parse(xml) {
    (reader, links) =>
      var inItem = false
      var inLink = false
      val text = new StringBuilder
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            reader.getLocalName.toLowerCase match {
              case "item" | "entry" => inItem = true
              case "link" if inItem =>
                val href = attr(reader, "href")
                if (href.nonEmpty) links += href
                else { inLink = true; text.clear() }
              case _ => ()
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inLink) text.append(reader.getText)
          case XMLStreamConstants.END_ELEMENT =>
            reader.getLocalName.toLowerCase match {
              case "item" | "entry" => inItem = false
              case "link" if inLink =>
                inLink = false
                if (text.toString.trim.nonEmpty) links += text.toString.trim
              case _ => ()
            }
          case _ => ()
        }
      }
  }

  /** `<urlset>` page locs and `<sitemapindex>` child sitemap locs
    * (reference: feed/sitemap.go:49-58,104-130).
    */
  def parseSitemap(xml: String): Either[String, (Seq[String], Seq[String])] = {
    var inUrl = false
    var inSitemap = false
    var inLoc = false
    val urls = scala.collection.mutable.ArrayBuffer.empty[String]
    val children = scala.collection.mutable.ArrayBuffer.empty[String]
    val text = new StringBuilder
    val res = parse(xml) { (reader, _) =>
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            reader.getLocalName.toLowerCase match {
              case "url"     => inUrl = true
              case "sitemap" => inSitemap = true
              case "loc"     => inLoc = true; text.clear()
              case _         => ()
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inLoc) text.append(reader.getText)
          case XMLStreamConstants.END_ELEMENT =>
            reader.getLocalName.toLowerCase match {
              case "url"     => inUrl = false
              case "sitemap" => inSitemap = false
              case "loc" =>
                inLoc = false
                val loc = text.toString.trim
                if (loc.nonEmpty) {
                  if (inSitemap) children += loc
                  else if (inUrl) urls += loc
                }
              case _ => ()
            }
          case _ => ()
        }
      }
    }
    res.map(_ => (urls.toSeq, children.toSeq))
  }

  private def attr(reader: javax.xml.stream.XMLStreamReader, name: String): String = {
    var i = 0
    while (i < reader.getAttributeCount) {
      if (reader.getAttributeLocalName(i).equalsIgnoreCase(name))
        return Option(reader.getAttributeValue(i)).getOrElse("")
      i += 1
    }
    ""
  }

  private def parse(xml: String)(
      body: (javax.xml.stream.XMLStreamReader,
        scala.collection.mutable.ArrayBuffer[String]) => Unit)
      : Either[String, Seq[String]] = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      val reader = factory.createXMLStreamReader(new StringReader(xml))
      try body(reader, out)
      finally reader.close()
      Right(out.toSeq)
    } catch {
      case e: Exception => Left(s"parse_error: ${e.getMessage}")
    }
  }

  /** F5 rate-limit backoff: `LEAST(2^consecutive_errors, 96) * 5 min`
    * (database/feed_state_repository.go:76-78).
    */
  def backoffMs(consecutiveErrors: Int): Long =
    math.min(math.pow(2, consecutiveErrors.toDouble), 96.0).toLong * 5 * 60000L

  /** Poll one due feed against its fixture row: conditional GET via etag
    * (poller.go:109-122: 304 → skip), parse, build submissions at the
    * origin-specific priority (feed +2 = 7, sitemap +1 = 6 —
    * domain/frontier.go:29-34, feed/poller.go:217-224), classify errors
    * with backoff.
    */
  def poll(feed: FeedRow, state: FeedPollState, now: Long)
      : (Seq[Submission], FeedPollState) = {
    if (state.next_poll_at > now) return (Nil, state)
    // conditional GET: unchanged etag → 304-equivalent skip
    if (feed.etag.nonEmpty && feed.etag == state.last_etag)
      return (Nil, state.copy(consecutive_errors = 0, last_error_type = "",
        next_poll_at = now + 5 * 60000L))
    if (feed.status_code == 429)
      return (Nil, state.copy(
        consecutive_errors = state.consecutive_errors + 1,
        last_error_type = "rate_limited",
        next_poll_at = now + backoffMs(state.consecutive_errors + 1)))
    if (feed.status_code < 200 || feed.status_code >= 300)
      return (Nil, state.copy(
        consecutive_errors = state.consecutive_errors + 1,
        last_error_type = "http_error",
        next_poll_at = now + backoffMs(state.consecutive_errors + 1)))

    val (links, priority) = feed.kind match {
      case "sitemap" =>
        (parseSitemap(feed.body).map(_._1),
          Priorities.Default + Priorities.SitemapBonus)
      case _ =>
        (parseFeedLinks(feed.body), Priorities.Default + Priorities.FeedBonus)
    }
    links match {
      case Left(_) =>
        (Nil, state.copy(
          consecutive_errors = state.consecutive_errors + 1,
          last_error_type = "parse_error",
          next_poll_at = now + backoffMs(state.consecutive_errors + 1)))
      case Right(ls) =>
        val subs = ls.flatMap { raw =>
          (UrlNormalizer.normalize(raw), UrlNormalizer.urlHash(raw),
            UrlNormalizer.extractHost(raw)) match {
            case (Right(u), Right(h), Right(host)) =>
              Some(Submission(u, h, host, feed.source_id,
                if (feed.kind == "sitemap") FrontierOrigin.Sitemap
                else FrontierOrigin.Feed,
                Some(feed.feed_url), 0, priority, now))
            case _ => None
          }
        }
        (subs, state.copy(last_etag = feed.etag, last_item_count = subs.size,
          consecutive_errors = 0, last_error_type = "",
          next_poll_at = now + 5 * 60000L))
    }
  }
}
