package graft.etl

/** Engine settings ≙ reference `Settings` pydantic model
  * (/root/reference/src/finance_etl/config.py:8–16).
  */
final case class Settings(
    baseCurrency: String = "USD",
    allowedCurrencies: Seq[String] = Seq("USD", "TZS", "EUR"))

/** DQ gate mode (reference pipeline.py:58–61). */
object FailOn {
  val Error = "ERROR"
  val Warn = "WARN"
  val Never = "NEVER"
  val all: Set[String] = Set(Error, Warn, Never)

  def normalize(s: String): String = {
    val v = Option(s).map(_.trim.toUpperCase).filter(_.nonEmpty).getOrElse(Error)
    require(all.contains(v), s"fail_on must be one of: ERROR, WARN, NEVER (got $s)")
    v
  }
}
