package graft.query

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Driver-side extraction-config store (SURVEY.md §2.1 S9, §2.2 P7 —
  * lib/config_manager.py:53-446 semantics): save/load/update/delete JSON
  * configs with a metadata envelope, list with domain/tag filters sorted
  * by creation time descending, stats, and export/import.
  *
  * Config is control-plane state (broadcast to executors after load);
  * plain file IO is the right tool — no Spark here by design.
  */
final case class ExtractionConfig(
    name: String,
    domain: String,
    tags: Seq[String],
    selectors: Map[String, String],
    confidence: Map[String, Double],
    createdAtMs: Long,
    /** per-field fallback selector chains, tried in order when the primary
      * yields nothing (lib/rule_parser.py:177-201) */
    fallbacks: Map[String, Seq[String]] = Map.empty)

class ConfigStore(root: String) {

  private def dir: Path = Paths.get(root)
  private def pathOf(name: String): Path = dir.resolve(s"${sanitize(name)}.json")

  /** F15: filename sanitization (lib/config_manager.py:471-492). */
  def sanitize(name: String): String =
    name.replaceAll("[^\\w\\-.]", "_").take(120)

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def save(c: ExtractionConfig): Path = {
    Files.createDirectories(dir)
    val selectors = c.selectors.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val confidence = c.confidence.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":$v""" }.mkString("{", ",", "}")
    val tags = c.tags.map(t => s""""${esc(t)}"""").mkString("[", ",", "]")
    // fallback chains flattened with U+2016 (printable, never escaped, not
    // a plausible selector character) so the flat-pair parser round-trips
    val fallbacks = c.fallbacks.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v.mkString("‖"))}"""" }
      .mkString("{", ",", "}")
    val json =
      s"""{"name":"${esc(c.name)}","domain":"${esc(c.domain)}","tags":$tags,
         |"selectors":$selectors,"confidence":$confidence,
         |"fallbacks":$fallbacks,
         |"created_at_ms":${c.createdAtMs}}""".stripMargin
    val p = pathOf(c.name)
    Files.write(p, json.getBytes(StandardCharsets.UTF_8))
    p
  }

  private val NameRe = "\"name\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
  private val DomainRe = "\"domain\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
  private val TagsRe = "\"tags\":\\[(.*?)\\]".r
  private val CreatedRe = "\"created_at_ms\":(\\d+)".r
  // string-valued objects are matched pair-atomically (quoted strings
  // consumed whole) so a '}' INSIDE a selector value — e.g. a regex
  // quantifier like {1,5} — can't truncate the object early
  private val StrPairPat = "\"(?:[^\"\\\\]|\\\\.)*\"\\s*:\\s*\"(?:[^\"\\\\]|\\\\.)*\""
  private val SelRe = ("\"selectors\":\\{((?:" + StrPairPat + ",?)*)\\}").r
  private val ConfRe = "\"confidence\":\\{(.*?)\\}".r
  private val FbRe = ("\"fallbacks\":\\{((?:" + StrPairPat + ",?)*)\\}").r
  private val PairRe = "\"((?:[^\"\\\\]|\\\\.)*)\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
  private val NumPairRe = "\"((?:[^\"\\\\]|\\\\.)*)\":([0-9.Ee+-]+)".r

  private def unesc(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\").replace("\\n", "\n")

  def load(name: String): Option[ExtractionConfig] = {
    val p = pathOf(name)
    if (!Files.exists(p)) return None
    val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    for {
      n <- NameRe.findFirstMatchIn(s).map(m => unesc(m.group(1)))
      d <- DomainRe.findFirstMatchIn(s).map(m => unesc(m.group(1)))
      created <- CreatedRe.findFirstMatchIn(s).map(_.group(1).toLong)
    } yield {
      val tags = TagsRe.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
        .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
      val sels = SelRe.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
      val selectors = PairRe.findAllMatchIn(sels)
        .map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap
      val confs = ConfRe.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
      val confidence = NumPairRe.findAllMatchIn(confs)
        .map(m => unesc(m.group(1)) -> m.group(2).toDouble).toMap
      val fbs = FbRe.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
      val fallbacks = PairRe.findAllMatchIn(fbs)
        .map(m => unesc(m.group(1)) -> unesc(m.group(2)).split('‖').toSeq).toMap
      ExtractionConfig(n, d, tags, selectors, confidence, created, fallbacks)
    }
  }

  def delete(name: String): Boolean = Files.deleteIfExists(pathOf(name))

  def listNames(): Seq[String] = {
    if (!Files.isDirectory(dir)) return Seq.empty
    val stream = Files.list(dir)
    try {
      stream.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(".json"))
        .map(_.stripSuffix(".json")).toSeq.sorted
    } finally stream.close()
  }

  /** P7: list with optional domain/tag filters, newest first
    * (lib/config_manager.py:176-204). */
  def list(domain: Option[String] = None, tag: Option[String] = None): Seq[ExtractionConfig] =
    listNames().flatMap(load)
      .filter(c => domain.forall(_ == c.domain))
      .filter(c => tag.forall(c.tags.contains))
      .sortBy(-_.createdAtMs)

  /** A6 analogue: distinct domains/tags + the 5 most recent
    * (lib/config_manager.py:292-331). */
  def stats(): (Set[String], Set[String], Seq[String]) = {
    val all = list()
    (all.map(_.domain).toSet, all.flatMap(_.tags).toSet,
      all.take(5).map(_.name))
  }
}
