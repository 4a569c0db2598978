package graft.functions

/** chrono (Rust/Polars strftime) → JDK DateTimeFormatter pattern
  * translation (SURVEY.md §7 kit 1 — "a real correctness trap").
  *
  * The reference parses dates with chrono patterns: `%Y-%m-%d`,
  * `%m/%d/%Y`, `%Y%m%d`, `%B %d, %Y`, `%Y-%-m-%-d`,
  * `%Y-%m-%d %H:%M:%S%.f`, `%-m/%-d/%Y %-l:%-M:%-S %p`
  * (reference `delinquent_data_submitters.py:96`, `od.py:27`,
  * `activity_request.py:189`, `error_pharmacies.py:49`,
  * `unreg_pharmacists.py:111`). Spark's `to_date`/`to_timestamp` take
  * JDK-style patterns, so every format string crossing the boundary goes
  * through this table.
  */
object DateFormats {

  private val table: Seq[(String, String)] = Seq(
    // order matters: translate %-X (non-padded) before %X
    "%-m" -> "M",
    "%-d" -> "d",
    "%-l" -> "h",   // non-padded 12-hour
    "%-H" -> "H",
    "%-M" -> "m",
    "%-S" -> "s",
    "%Y" -> "yyyy",
    "%y" -> "yy",
    "%m" -> "MM",
    "%d" -> "dd",
    "%B" -> "MMMM",
    "%b" -> "MMM",
    "%H" -> "HH",
    "%I" -> "hh",
    "%l" -> "h",
    "%M" -> "mm",
    "%S" -> "ss",
    "%p" -> "a",
    "%.f" -> ".SSSSSS", // chrono %.f = dot + fractional seconds
    "%f" -> "SSSSSS",
    "%%" -> "%"
  )

  /** Translate a chrono strftime pattern to a JDK DateTimeFormatter
    * pattern. Literal text is passed through; unknown specifiers throw
    * (fail loud beats silently mis-parsing dates).
    */
  def chronoToJdk(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%') {
        table.find { case (chrono, _) => fmt.startsWith(chrono, i) } match {
          case Some((chrono, jdk)) =>
            sb.append(jdk)
            i += chrono.length
          case None =>
            throw new IllegalArgumentException(
              s"unsupported chrono specifier at index $i in '$fmt'")
        }
      } else {
        val c = fmt.charAt(i)
        // quote everything JDK could interpret: letters (pattern
        // chars), [ ] (optional sections), # { } (reserved). A literal
        // apostrophe is the JDK escape itself — emit the doubled ''
        // form, never wrapped in quotes (wrapping would unbalance the
        // quote run: "o'clock" must become "'o''clock'"-safe output)
        if (c == '\'') sb.append("''")
        else if (c.isLetter || "[]#{}".contains(c))
          sb.append('\'').append(c).append('\'')
        else sb.append(c)
        i += 1
      }
    }
    sb.toString
  }
}
