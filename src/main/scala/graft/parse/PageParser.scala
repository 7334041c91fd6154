package graft.parse

import graft.urlkit.UrlKit

/** Pure HTML→rows parse functions (SURVEY.md §2.8 F6/F7, §2.2 P2-P4).
  *
  * Deliberately regex-based — the reference's own extractors are
  * regex/selector-based (lib/utils.py:80-160), so parity is regex parity.
  * Pure functions: callable from the Spark parse stage, the oracle
  * crawler, and unit tests alike.
  */
object PageParser {

  final case class Link(url: String, text: String)
  final case class ImageRef(src: String, imageId: String, fmt: String, caption: String)

  private val HrefRe = """(?is)<a\s[^>]*href\s*=\s*"([^"]*)"[^>]*>(.*?)</a>""".r
  private val ImgRe = """(?i)<img\s[^>]*src\s*=\s*"([^"]*)"[^>]*alt\s*=\s*"([^"]*)"[^>]*>""".r
  private val IdExtRe = """([^/]+)\.(png|jpg|jpeg)$""".r
  private val TitleRe = """(?is)<title>(.*?)</title>""".r
  private val TotalRe = """of\s*<b>(\d+)</b>""".r

  /** F6: `<a href>` extraction with base resolution (lib/utils.py:80-113). */
  def links(baseUrl: String, html: String): Seq[Link] =
    HrefRe.findAllMatchIn(html).map { m =>
      Link(UrlKit.resolve(baseUrl, m.group(1)), stripTags(m.group(2)).trim)
    }.toSeq

  /** F7: `<img src alt>` extraction (lib/utils.py:116-160); src resolved
    * against the base, image_id + fmt derived from the src filename. */
  def images(baseUrl: String, html: String): Seq[ImageRef] =
    ImgRe.findAllMatchIn(html).flatMap { m =>
      val src = UrlKit.resolve(baseUrl, m.group(1))
      IdExtRe.findFirstMatchIn(src).map { fm =>
        val ext = fm.group(2).toLowerCase
        val fmt = if (ext == "jpg" || ext == "jpeg") "jpeg" else "png"
        ImageRef(src, fm.group(1), fmt, m.group(2))
      }
    }.toSeq

  /** F8: page title. */
  def title(html: String): Option[String] =
    TitleRe.findFirstMatchIn(html).map(_.group(1).trim)

  /** F8: meta tags `<meta name=... content=...>` (lib/utils.py:163-239). */
  private val MetaRe =
    """(?i)<meta\s[^>]*name\s*=\s*"([^"]*)"[^>]*content\s*=\s*"([^"]*)"[^>]*>""".r
  def metaTags(html: String): Map[String, String] =
    MetaRe.findAllMatchIn(html).map(m => m.group(1).toLowerCase -> m.group(2)).toMap

  /** F8: headings h1-h6 in document order. */
  private val HeadingRe = """(?is)<h([1-6])[^>]*>(.*?)</h\1>""".r
  def headings(html: String): Seq[(Int, String)] =
    HeadingRe.findAllMatchIn(html)
      .map(m => m.group(1).toInt -> stripTags(m.group(2)).trim).toSeq

  /** F3: pagination total — 3rd `<b>` "Results 1-30 of <b>N</b>"
    * (fpds_enhanced_extractor.py:177-202). */
  def paginationTotal(html: String): Option[Long] =
    TotalRe.findFirstMatchIn(html).map(_.group(1).toLong)

  /** F1: clean_field_name (fpds_enhanced_extractor.py:503-509). */
  def cleanFieldName(s: String): String =
    s.trim.replaceAll("[^\\w\\s]", "").replaceAll("\\s+", "_").toLowerCase

  /** P2-P4: resultbox table rows → (field, value) pairs; handles the
    * 2-cell and 4-cell row shapes (fpds_enhanced_extractor.py:231-242). */
  private val TableRe = """(?is)<table\s[^>]*class="(resultbox[12])"[^>]*>(.*?)</table>""".r
  private val RowRe = """(?is)<tr[^>]*>(.*?)</tr>""".r
  private val CellRe = """(?is)<td[^>]*>(.*?)</td>""".r

  def resultboxFields(html: String): Seq[(String, String)] =
    TableRe.findAllMatchIn(html).flatMap { t =>
      RowRe.findAllMatchIn(t.group(2)).flatMap { r =>
        val cells = CellRe.findAllMatchIn(r.group(1)).map(c => stripTags(c.group(1)).trim).toSeq
        cells match {
          case Seq(l, v) => Seq(cleanFieldName(l) -> v)
          case Seq(l1, v1, l2, v2) => Seq(cleanFieldName(l1) -> v1, cleanFieldName(l2) -> v2)
          case _ => Seq.empty
        }
      }
    }.toSeq

  /** F2: View-link param extraction — regex over
    * `viewLinkController.jsp?...`, split on '&'/'=', URL-decode
    * (fpds_enhanced_extractor.py:257-276). */
  private val ViewLinkRe = """viewLinkController\.jsp\?([^')\s"]+)""".r
  def viewLinkParams(html: String): Map[String, String] =
    ViewLinkRe.findFirstMatchIn(html).map { m =>
      m.group(1).replace("&amp;", "&").split("&").filter(_.nonEmpty).map { p =>
        val i = p.indexOf('=')
        val (k, v) = if (i < 0) (p, "") else (p.substring(0, i), p.substring(i + 1))
        java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
    }.getOrElse(Map.empty)

  /** F4/F5-lite: strip tags + collapse whitespace (lib/utils.py:47-77). */
  def stripTags(html: String): String =
    html.replaceAll("(?is)<script.*?</script>", "")
      .replaceAll("(?is)<style.*?</style>", "")
      .replaceAll("<[^>]+>", " ")
      .replaceAll("\\s+", " ")
      .trim
}
