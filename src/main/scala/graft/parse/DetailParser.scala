package graft.parse

/** Detail-page parser — exact reference semantics
  * (fpds_enhanced_extractor.py:295-497; golden contract: the parse of
  * template/detail.html equals the 133-key data/detail.json record).
  *
  * Per table row with a labeled first cell:
  *   inputs (text|hidden, non-empty value) beat selects beat displayText;
  *   input fields are named `label_title` (or `label_name`/`label_id`);
  *   select fields take the label; displayText fields take `label_display`.
  * Then two by-id sweeps: textareas and displayText cells labeled by a
  * `lbl<Id>` span. Field names run through the detail variant of
  * clean_field_name (strips "(mm/dd/yyyy)" noise first).
  */
object DetailParser {

  private val MmDdYyyy1 = """(?i)\s*\(?mm/dd/yyyy\)?""".r
  private val MmDdYyyy2 = """(?i)\s*\(?mmddyyyy\)?""".r

  /** Detail-variant clean_field_name (fpds_enhanced_extractor.py:303-311). */
  def cleanFieldName(s: String): String = {
    var c = MmDdYyyy1.replaceAllIn(s, "")
    c = MmDdYyyy2.replaceAllIn(c, "")
    c = c.replaceAll("[^\\w\\s]", "").trim.replaceAll("\\s+", "_").toLowerCase
    if (c.isEmpty) "field" else c
  }

  private def stripTrailingColon(s: String): String = s.reverse.dropWhile(_ == ':').reverse

  private def inputValue(n: DomNode): Option[String] =
    n.attr("value").map(_.trim).filter(_.nonEmpty)

  private def selectValue(n: DomNode): Option[String] =
    n.findAll("option").find(_.attrs.contains("selected"))
      .map(_.strippedText).filter(_.nonEmpty)

  private def textareaValue(n: DomNode): Option[String] =
    n.attr("value").map(_.trim).filter(_.nonEmpty)
      .orElse(Some(n.strippedText).filter(_.nonEmpty))

  def parse(html: String): Map[String, String] = {
    val root = MiniDom.parse(html)
    val details = scala.collection.mutable.LinkedHashMap.empty[String, String]

    // ---- row sweep: every table, every descendant row (doc order) ----
    for (table <- root.findAll("table"); row <- table.findAll("tr")) {
      val cells = row.childElements("td")
      if (cells.size >= 2) {
        cells.head.find("span").foreach { labelSpan =>
          val labelText = stripTrailingColon(labelSpan.strippedText)
          if (labelText.nonEmpty) {
            val allInputs = row.findAll("input")
              .filter(i => i.attr("type").exists(t => t == "text" || t == "hidden"))
            if (allInputs.nonEmpty) {
              for (inp <- allInputs; value <- inputValue(inp)) {
                val title = inp.attr("title").map(_.trim).getOrElse("")
                val fieldName =
                  if (title.nonEmpty) cleanFieldName(s"${labelText}_$title")
                  else {
                    val nameOrId = inp.attr("name").filter(_.nonEmpty)
                      .orElse(inp.attr("id")).getOrElse("")
                    if (nameOrId.nonEmpty) cleanFieldName(s"${labelText}_$nameOrId")
                    else cleanFieldName(labelText)
                  }
                details(fieldName) = value
              }
            }
            val allSelects = row.findAll("select")
            if (allSelects.nonEmpty && allInputs.isEmpty) {
              for (sel <- allSelects; value <- selectValue(sel))
                details(cleanFieldName(labelText)) = value
            }
            if (allInputs.isEmpty && allSelects.isEmpty) {
              cells.tail.iterator
                .filter(c => c.classes.contains("displayText"))
                .map(_.strippedText).find(_.nonEmpty)
                .foreach { text =>
                  details(cleanFieldName(s"${labelText}_display")) = text
                }
            }
          }
        }
      }
    }

    // ---- textarea sweep (by id, labeled by span lbl<id>) ----
    val allSpans = root.findAll("span")
    def spanById(id: String): Option[DomNode] =
      allSpans.find(_.attr("id").contains(id))
    for (ta <- root.findAll("textarea"); id <- ta.attr("id") if id.nonEmpty) {
      val label = spanById(s"lbl$id")
        .orElse(if (id == "descriptionOfContractRequirement")
          spanById("lblDescriptionOfContractRequirement") else None)
      for (span <- label; value <- textareaValue(ta)) {
        val labelText = stripTrailingColon(span.strippedText)
        details(cleanFieldName(labelText)) = value
      }
    }

    // ---- displayText-by-id sweep ----
    for (td <- root.findAll("td")
         if td.classes.contains("displayText");
         id <- td.attr("id") if id.nonEmpty) {
      val label = spanById(s"lbl$id")
        .orElse(spanById(s"lbl${id.head.toUpper}${id.tail}"))
      for (span <- label) {
        val text = td.strippedText
        if (text.nonEmpty) {
          val labelText = stripTrailingColon(span.strippedText)
          details(cleanFieldName(labelText)) = text
        }
      }
    }

    details.toMap
  }
}
