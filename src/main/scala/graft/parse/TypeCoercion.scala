package graft.parse

/** Typed-record coercion — exact reference semantics
  * (bulk_insert_helper.py:160-339): field whitelists first, then value
  * patterns in the order datetime → date → money → integer → float;
  * null/empty → null; anything else stays a string. This is the sink-side
  * typing contract the DataFrame layer applies via cast/to_date
  * (SURVEY.md §1.2 F11); the scalar form here is used by the golden
  * detail-record test and the oracle crawler. */
object TypeCoercion {

  sealed trait Typed
  final case class TInt(v: Long) extends Typed
  final case class TFloat(v: Double) extends Typed
  final case class TDate(v: java.time.LocalDate) extends Typed
  final case class TDateTime(v: java.time.LocalDateTime) extends Typed
  final case class TString(v: String) extends Typed
  case object TNull extends Typed

  private val DateP = """^\d{2}/\d{2}/\d{4}$""".r
  private val MoneyP = """^\$[\d,]+\.\d{2}$""".r
  private val IntP = """^\d+$""".r
  private val FloatP = """^\d+\.\d+$""".r
  private val DateTimeP = """^\d{2}/\d{2}/\d{4}\s+\d{2}:\d{2}:\d{2}$""".r

  val integerFields: Set[String] = Set(
    "award_id_modification_number", "award_id_transaction_number",
    "referenced_idv_id_idv_mod_number", "number_of_actions_number_of_actions",
    "idv_number_of_offers_idv_number_of_offers",
    "number_of_offers_received_number_of_offers_received",
    "unique_entity_id_entity_congressional_district")

  val dateFields: Set[String] = Set(
    "date_signed_date_signed", "date_signed_period_of_performance_start_date",
    "date_signed_award_completion_date",
    "date_signed_estimated_ultimate_completion_date",
    "period_of_performance_start_date_period_of_performance_start_date",
    "completion_date_award_completion_date",
    "est_ultimate_completion_date_estimated_ultimate_completion_date")

  val datetimeFields: Set[String] = Set(
    "prepared_date", "last_modified_date", "approved_date")

  val moneyFields: Set[String] = Set(
    "date_signed_current_obligation_amount", "date_signed_total_obligation_amount",
    "date_signed_current_base_and_excercised_options_value",
    "date_signed_total_base_and_excercised_options_value",
    "date_signed_base_and_all_options_value",
    "date_signed_total_base_and_all_options_value",
    "date_signed_fee_paid_for_use_of_indefinite_delivery_vehicle",
    "action_obligation_current_obligation_amount",
    "action_obligation_total_obligation_amount",
    "base_and_exercised_options_value_current_base_and_excercised_options_value",
    "base_and_exercised_options_value_total_base_and_excercised_options_value",
    "base_and_all_options_value_total_contract_value_base_and_all_options_value",
    "base_and_all_options_value_total_contract_value_total_base_and_all_options_value",
    "fee_paid_for_use_of_idv_fee_paid_for_use_of_indefinite_delivery_vehicle")

  private val DateFmt = java.time.format.DateTimeFormatter.ofPattern("MM/dd/yyyy")
  private val DateTimeFmt = java.time.format.DateTimeFormatter.ofPattern("MM/dd/yyyy HH:mm:ss")

  def parseInteger(v: String): Typed = {
    val cleaned = v.replaceAll("[^\\d-]", "")
    if (cleaned.isEmpty) TNull
    else try TInt(cleaned.toLong) catch { case _: Exception => TNull }
  }

  def parseFloat(v: String): Typed = {
    val cleaned = v.replaceAll("[^\\d.-]", "")
    if (cleaned.isEmpty) TNull
    else try TFloat(cleaned.toDouble) catch { case _: Exception => TNull }
  }

  def parseMoney(v: String): Typed = {
    val cleaned = v.replaceAll("[$,]", "")
    if (cleaned.isEmpty) TNull
    else try TFloat(cleaned.toDouble) catch { case _: Exception => TNull }
  }

  def parseDate(v: String): Typed =
    if (DateP.matches(v))
      try TDate(java.time.LocalDate.parse(v, DateFmt)) catch { case _: Exception => TNull }
    else TNull

  def parseDateTime(v: String): Typed =
    if (DateTimeP.matches(v))
      try TDateTime(java.time.LocalDateTime.parse(v.replaceAll("\\s+", " "), DateTimeFmt))
      catch { case _: Exception => TNull }
    else TNull

  /** _format_value: whitelists then patterns then string. */
  def coerce(fieldName: String, value: String): Typed = {
    if (value == null || value.isEmpty) return TNull
    val v = MiniDom.pyStrip(value)
    if (integerFields(fieldName)) return parseInteger(v)
    if (dateFields(fieldName)) return parseDate(v)
    if (datetimeFields(fieldName)) return parseDateTime(v)
    if (moneyFields(fieldName)) return parseMoney(v)
    if (DateTimeP.matches(v)) return parseDateTime(v)
    if (DateP.matches(v)) return parseDate(v)
    if (MoneyP.matches(v)) return parseMoney(v)
    if (IntP.matches(v)) return parseInteger(v)
    if (FloatP.matches(v)) return parseFloat(v)
    TString(v)
  }

  def coerceRecord(record: Map[String, String]): Map[String, Typed] =
    record.map { case (k, v) => k -> coerce(k, v) }
}
