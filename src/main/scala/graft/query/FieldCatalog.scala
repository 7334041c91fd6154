package graft.query

/** NL query layer over the output tables — the Spark re-expression of the
  * reference's field catalog + natural-language scoring + query builder
  * (fpds_field_mappings.py: catalog :15-790, aliases :792-936, scoring
  * :938-978, expansion :980-990, query build :992-1019). The catalog here
  * is our own representative field set in the same descriptor shape; the
  * scoring weights reproduce the reference semantics: description match
  * +10, search-term match +5, category match +3.
  */
final case class FieldDescriptor(
    field: String,
    description: String,
    category: String,
    searchTerms: Seq[String],
    dataType: String)

object FieldCatalog {

  /** Representative catalog covering the reference's 13 category families
    * with this engine's output-table fields. Descriptions are plain
    * lowercase ASCII (they are embedded into oracle SQL literals). */
  val fields: Seq[FieldDescriptor] = Seq(
    FieldDescriptor("award_id", "unique award identifier for the contract", "identification",
      Seq("award", "id", "piid", "contract number"), "string"),
    FieldDescriptor("modification_number", "modification number of the award", "identification",
      Seq("mod", "modification", "amendment"), "string"),
    FieldDescriptor("award_type", "type of the award such as delivery order", "classification",
      Seq("type", "order", "delivery"), "string"),
    FieldDescriptor("action_obligation", "obligated dollar amount of the action", "financial",
      Seq("amount", "obligation", "dollars", "money", "value"), "currency"),
    FieldDescriptor("total_contract_value", "total base and exercised contract value", "financial",
      Seq("total", "value", "ceiling", "amount"), "currency"),
    FieldDescriptor("date_signed", "date the contract action was signed", "dates",
      Seq("signed", "date", "when"), "date"),
    FieldDescriptor("completion_date", "estimated completion date of the contract", "dates",
      Seq("completion", "end", "finish", "date"), "date"),
    FieldDescriptor("effective_date", "date the contract becomes effective", "dates",
      Seq("effective", "start", "begin"), "date"),
    FieldDescriptor("legal_business_name", "legal business name of the vendor", "vendor",
      Seq("vendor", "company", "business", "contractor", "name"), "string"),
    FieldDescriptor("unique_entity_id", "unique entity identifier of the vendor", "vendor",
      Seq("uei", "entity", "duns"), "string"),
    FieldDescriptor("cage_code", "commercial and government entity code", "vendor",
      Seq("cage", "code"), "string"),
    FieldDescriptor("contracting_agency", "name of the contracting agency", "agency",
      Seq("agency", "department", "bureau", "office"), "string"),
    FieldDescriptor("contracting_office", "name of the contracting office", "agency",
      Seq("office", "contracting"), "string"),
    FieldDescriptor("funding_agency", "agency providing the funds", "agency",
      Seq("funding", "agency", "sponsor"), "string"),
    FieldDescriptor("entity_city", "city of the vendor address", "location",
      Seq("city", "town", "place"), "string"),
    FieldDescriptor("entity_state", "state of the vendor address", "location",
      Seq("state", "province", "region"), "string"),
    FieldDescriptor("entity_zip", "postal code of the vendor address", "location",
      Seq("zip", "postal", "code"), "string"),
    FieldDescriptor("naics_code", "north american industry classification code", "classification",
      Seq("naics", "industry", "sector"), "string"),
    FieldDescriptor("psc_code", "product or service code of the action", "classification",
      Seq("psc", "product", "service"), "string"),
    FieldDescriptor("extent_competed", "extent of competition for the award", "competition",
      Seq("competed", "competition", "bids"), "string"),
    FieldDescriptor("number_of_offers", "number of offers received", "competition",
      Seq("offers", "bids", "count"), "string"),
    FieldDescriptor("description_of_requirement", "description of the contract requirement", "description",
      Seq("description", "requirement", "scope", "work"), "string"),
    FieldDescriptor("image_caption", "caption text stored with a fetched image", "payload",
      Seq("caption", "image", "alt", "text"), "string"),
    FieldDescriptor("image_phash", "perceptual hash of the stored image pixels", "payload",
      Seq("phash", "hash", "image", "similar"), "string"))

  /** Alias expansion (fpds_field_mappings.py:980-990 semantics). */
  val aliases: Map[String, Seq[String]] = Map(
    "agency" -> Seq("department", "bureau"),
    "amount" -> Seq("obligation", "dollars", "value", "money"),
    "vendor" -> Seq("company", "contractor", "business"),
    "date" -> Seq("signed", "effective", "completion"),
    "image" -> Seq("caption", "phash", "picture"))

  /** Lowercased query terms + alias expansion (F13). */
  def expandTerms(query: String): Seq[String] = {
    val base = query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    (base ++ base.flatMap(aliases.getOrElse(_, Seq.empty))).distinct
  }

  /** Reference scoring weights (fpds_field_mappings.py:938-978). */
  val DescriptionWeight = 10
  val SearchTermWeight = 5
  val CategoryWeight = 3
}

/** Deterministic NL→predicate building (fpds_field_mappings.py:992-1019
  * semantics: money-magnitude patterns, date lower bounds, keyword
  * equality — re-targeted at Column predicates instead of Mongo operators). */
object NLQuery {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  private val MoneyRe = """over\s+\$([\d,]+)""".r
  private val AfterRe = """after\s+(\d{2}/\d{2}/\d{4})""".r

  /** Build a predicate for the orders table from an NL query string. */
  def ordersPredicate(query: String): Column = {
    val q = query.toLowerCase
    var pred: Column = lit(true)
    MoneyRe.findFirstMatchIn(q).foreach { m =>
      pred = pred && col("o_totalprice") >= m.group(1).replace(",", "").toDouble
    }
    AfterRe.findFirstMatchIn(q).foreach { m =>
      pred = pred && col("o_orderdate") >= to_timestamp(lit(
        java.time.LocalDate.parse(m.group(1),
          java.time.format.DateTimeFormatter.ofPattern("MM/dd/yyyy")).toString))
    }
    if (q.contains("urgent")) pred = pred && col("o_orderpriority") === "1-URGENT"
    pred
  }
}
