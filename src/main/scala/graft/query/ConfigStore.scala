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

  /** Single-pass decoder for [[esc]]'s escapes. Sequential `.replace`
    * calls would mis-order: a literal backslash+n escapes to `\\n`,
    * which a later `\n`-replace would corrupt into a newline. */
  private def unesc(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) s.charAt(i + 1) match {
        case 'n' => sb.append('\n'); i += 2
        case '"' => sb.append('"'); i += 2
        case '\\' => sb.append('\\'); i += 2
        case 'u' if i + 5 < s.length =>
          sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
        case _ => sb.append(c); i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def load(name: String): Option[ExtractionConfig] = {
    val p = pathOf(name)
    if (!Files.exists(p)) return None
    parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
  }

  /** Parse one config document (the [[save]] format). */
  def parse(s: String): Option[ExtractionConfig] = {
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

  // ---- export / import bundles (config_manager.py:333-446) -------------

  /** Export every stored config into one bundle; returns the count.
    * `json` → a single `{"configs":{<name>:<config>, …}}` document (each
    * embedded config is the stored file's exact JSON, newlines folded —
    * [[save]] escapes every literal newline, so folding is lossless);
    * `zip` → the config files verbatim plus a `metadata.json` name list. */
  def exportConfigs(outPath: String, format: String = "json"): Int = {
    val names = listNames()
    format.toLowerCase match {
      case "json" =>
        val entries = names.map { n =>
          val raw = new String(Files.readAllBytes(pathOf(n)), StandardCharsets.UTF_8)
          s""""${esc(n)}":${raw.replace("\n", "")}"""
        }
        Files.write(Paths.get(outPath),
          entries.mkString("{\"configs\":{\n", ",\n", "\n}}")
            .getBytes(StandardCharsets.UTF_8))
      case "zip" =>
        val zos = new java.util.zip.ZipOutputStream(
          Files.newOutputStream(Paths.get(outPath)))
        try {
          val meta = names.map(n => s""""${esc(n)}"""").mkString("{\"configs\":[", ",", "]}")
          zos.putNextEntry(new java.util.zip.ZipEntry("metadata.json"))
          zos.write(meta.getBytes(StandardCharsets.UTF_8)); zos.closeEntry()
          names.foreach { n =>
            zos.putNextEntry(new java.util.zip.ZipEntry(s"${sanitize(n)}.json"))
            zos.write(Files.readAllBytes(pathOf(n))); zos.closeEntry()
          }
        } finally zos.close()
      case f => throw new IllegalArgumentException(s"unknown export format: $f")
    }
    names.size
  }

  /** Import a bundle written by [[exportConfigs]] (either format): every
    * parseable config re-saves through [[save]] (normalizing layout, like
    * the reference's re-save through `save_config`); unparseable entries
    * are skipped, matching its warn-and-continue. Returns the count. */
  def importConfigs(inPath: String, format: String = "json"): Int =
    format.toLowerCase match {
      case "json" =>
        val s = new String(Files.readAllBytes(Paths.get(inPath)), StandardCharsets.UTF_8)
        val body = s.indexOf("\"configs\":") match {
          case -1 => return 0
          case i => s.substring(i + "\"configs\":".length)
        }
        splitTopLevelObjects(body).flatMap(parse).map(save).size
      case "zip" =>
        val zf = new java.util.zip.ZipFile(inPath)
        try {
          import scala.jdk.CollectionConverters._
          zf.entries().asScala.toSeq
            .filter(e => e.getName.endsWith(".json") && e.getName != "metadata.json")
            .flatMap { e =>
              val bytes = zf.getInputStream(e).readAllBytes()
              parse(new String(bytes, StandardCharsets.UTF_8))
            }.map(save).size
        } finally zf.close()
      case f => throw new IllegalArgumentException(s"unknown import format: $f")
    }

  /** The `{…}` object literals nested one level under `body`'s outer
    * object, in order — an exact scanner (string-aware, escape-aware,
    * depth-counted), NOT a regex: selector values may hold unbalanced
    * braces (`{1,` in a regex quantifier) that defeat brace-matching
    * patterns. */
  private def splitTopLevelObjects(body: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0; var depth = 0; var start = -1
    var inStr = false; var escp = false
    while (i < body.length) {
      val c = body.charAt(i)
      if (inStr) {
        if (escp) escp = false
        else if (c == '\\') escp = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' =>
          depth += 1
          if (depth == 2) start = i // children of the outer {"configs":{…}}
        case '}' =>
          if (depth == 2 && start >= 0) { out += body.substring(start, i + 1); start = -1 }
          depth -= 1
          if (depth < 0) i = body.length // past the outer object: stop
        case _ =>
      }
      i += 1
    }
    out.toSeq
  }
}
