package graft.corpus

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.xml.sax.Attributes
import org.xml.sax.helpers.DefaultHandler

/** One parsed Atom entry (the reference's FlickrPhoto analog:
  * tools/FlickrPhoto.java:22-41 — title, page url, media url, tags,
  * author name/id).
  */
final case class AtomEntry(
    title: String, link: String, mediaUrl: String,
    author: String, authorId: String, tags: Seq[String])

/** Atom feed source — the reference's Flickr ingestion family
  * (tools/FlickrPhotoGrabber.java:22-120: SAX handler over the public
  * Atom feed; tools/FlickrSolrIndexingTool.java turns entries into
  * uploadable docs). Zero-egress graft: the feed XML arrives as strings
  * (already-downloaded files, a streaming drop directory, a Kafka-shaped
  * column) and parsing happens per-row inside tasks — the fetch loop of
  * the reference becomes a data-parallel map.
  */
object Atom {

  /** SAX handler mirroring the reference's event structure (entry ->
    * title / link / author name+uri / category terms). Tags come from
    * `category term="..."` attributes; the media link from
    * `link rel="enclosure"` (or the entry link as fallback).
    */
  private final class FeedHandler extends DefaultHandler {
    val entries = scala.collection.mutable.ListBuffer[AtomEntry]()
    private var inEntry = false
    private var inSource = false // <source> metadata inside an entry is NOT the entry's
    private var inTitle = false
    private var inAuthor = false
    private var inAuthorName = false
    private var inAuthorUri = false
    private val title = new StringBuilder
    private val authorName = new StringBuilder
    private val authorUri = new StringBuilder
    private var link = ""
    private var mediaUrl = ""
    private var tags = scala.collection.mutable.ListBuffer[String]()
    private def inOwn = inEntry && !inSource

    // namespace-aware: match the local name so prefixed feeds
    // (<atom:entry>, <atom:title>) parse identically to default-namespace
    // ones — but ONLY for elements in the Atom namespace (or none):
    // extension elements with clashing local names (media:title,
    // media:category, dc:title) must not corrupt the entry's own fields.
    // qName fallback covers non-namespace-aware parser configs.
    private val AtomNs = "http://www.w3.org/2005/Atom"
    private def nameOf(uri: String, local: String, qName: String): String =
      if (uri != null && uri.nonEmpty && uri != AtomNs) "" // foreign namespace
      else if (local != null && local.nonEmpty) local
      else qName.substring(qName.indexOf(':') + 1)

    override def startElement(uri: String, local: String, qName: String,
                              atts: Attributes): Unit = nameOf(uri, local, qName) match {
      case "entry" =>
        inEntry = true; inSource = false
        title.clear(); authorName.clear(); authorUri.clear()
        link = ""; mediaUrl = ""; tags = scala.collection.mutable.ListBuffer[String]()
      case "source" if inEntry => inSource = true
      case "title" if inOwn => inTitle = true
      case "author" if inOwn => inAuthor = true
      case "name" if inAuthor => inAuthorName = true
      case "uri" if inAuthor => inAuthorUri = true
      case "link" if inOwn =>
        val rel = Option(atts.getValue("rel")).getOrElse("alternate")
        val href = Option(atts.getValue("href")).getOrElse("")
        if (rel == "enclosure") mediaUrl = href
        else if (rel == "alternate" && link.isEmpty) link = href
      case "category" if inOwn =>
        Option(atts.getValue("term")).filter(_.nonEmpty).foreach(tags += _)
      case _ =>
    }

    override def endElement(uri: String, local: String, qName: String): Unit = nameOf(uri, local, qName) match {
      case "entry" =>
        inEntry = false
        entries += AtomEntry(title.toString.trim, link,
          if (mediaUrl.nonEmpty) mediaUrl else link,
          authorName.toString.trim, authorUri.toString.trim, tags.toSeq)
      case "source" => inSource = false
      case "title" => inTitle = false
      case "author" => inAuthor = false
      case "name" => inAuthorName = false
      case "uri" => inAuthorUri = false
      case _ =>
    }

    override def characters(ch: Array[Char], start: Int, length: Int): Unit = {
      if (inTitle) title.appendAll(ch, start, length)
      else if (inAuthorName) authorName.appendAll(ch, start, length)
      else if (inAuthorUri) authorUri.appendAll(ch, start, length)
    }
  }

  /** Parse one feed document into its entries (pure, driver or task side). */
  def parseFeed(xml: String): Seq[AtomEntry] = {
    val factory = javax.xml.parsers.SAXParserFactory.newInstance()
    factory.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    factory.setNamespaceAware(true)
    val parser = factory.newSAXParser()
    val handler = new FeedHandler
    parser.parse(new org.xml.sax.InputSource(new java.io.StringReader(xml)), handler)
    handler.entries.toSeq
  }

  /** Dataset of feed XML documents -> corpus-shaped table (repo = author
    * id, path = media url, lang = "atom", content = title + tags — the
    * searchable text the reference builds from title/tags_ws fields,
    * FlickrPhoto.java:70-72). Feed-parallel: one task parses many feeds.
    * Compose with [[Corpus.withDocIds]] + IndexBuild for an end-to-end
    * feed -> index pipeline.
    */
  def fromFeeds(feeds: Dataset[String]): DataFrame = {
    val spark = feeds.sparkSession
    import spark.implicits._
    feeds.flatMap(parseFeed _)
      .select(
        // authorId is "" (not null) when the feed has no <uri>: fall back
        // to the author NAME on empty, not on null
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("authorId")) > 0,
          org.apache.spark.sql.functions.col("authorId"))
          .otherwise(org.apache.spark.sql.functions.col("author")).as("repo"),
        org.apache.spark.sql.functions.col("mediaUrl").as("path"),
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.concat_ws("|",
            org.apache.spark.sql.functions.col("link"),
            org.apache.spark.sql.functions.col("title"))).substr(1, 12).as("commit"),
        org.apache.spark.sql.functions.lit("atom").as("lang"),
        org.apache.spark.sql.functions.concat_ws(" ",
          org.apache.spark.sql.functions.col("title"),
          org.apache.spark.sql.functions.concat_ws(" ",
            org.apache.spark.sql.functions.col("tags"))).as("content"))
  }
}
