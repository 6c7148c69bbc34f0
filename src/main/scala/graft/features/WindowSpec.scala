package graft.features

import java.time.LocalDate
import java.time.temporal.ChronoUnit

/** The reference's four feature windows (`04a_Task__Feature_Engineering.py:
  * 150-176`): trailing 30/60/90-day windows ending at `current_day`, plus
  * the "1yr" window which is deliberately NOT a trailing year but the
  * 30-day slice starting one year back (`04a:164-167`:
  * `min_day = max_day - 364; max_day = min_day + 29`, i.e.
  * `[cur-364, cur-335]`) — a same-season comparison baseline. Bounds are
  * computed driver-side from the dataset's max day and baked into the plan
  * as literals (EP2's signature pattern, SURVEY.md §3) so parquet row-group
  * skipping on `day` applies.
  *
  * `startSql`/`endSql` are the DuckDB-oracle forms of the same bounds,
  * expressed against a `bounds` CTE alias `b` (`b.cur` = max day) so the
  * oracle derives identical dates from identical data.
  */
final case class WindowDef(
    name: String,
    start: LocalDate,
    end: LocalDate,
    startSql: String,
    endSql: String) {

  /** `days_in_window` (`04a:174`): inclusive day count — 30/60/90/30. */
  def days: Long = ChronoUnit.DAYS.between(start, end) + 1
}

object WindowSpec {
  def windows(cur: LocalDate): Seq[WindowDef] = Seq(
    WindowDef("30d", cur.minusDays(29), cur, "(b.cur - 29)", "b.cur"),
    WindowDef("60d", cur.minusDays(59), cur, "(b.cur - 59)", "b.cur"),
    WindowDef("90d", cur.minusDays(89), cur, "(b.cur - 89)", "b.cur"),
    WindowDef("1yr", cur.minusDays(364), cur.minusDays(335),
      "(b.cur - 364)", "(b.cur - 335)"))
}
