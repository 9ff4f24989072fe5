package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date-window predicates (SURVEY.md §2.2 P4/P5/P6).
  *
  * The reference hand-writes the same logical 30-day window in four SQL
  * dialects plus OData (`DATE_SUB(CURRENT_DATE(), INTERVAL 30 DAY)` at
  * `Template-to-MySQL/BigQuery-to-MySQL-Method-2.py:58`,
  * `DATEADD(DAY,-30,GETDATE())` at `SQLServer-to-MySQL-Method-2.py:60`,
  * `CURRENT_DATE - INTERVAL '30 days'` at `PgSQL-to-MySQL-Method-2.py:56`,
  * OData `$filter=date_trans ge …` at `Dynamics365-to-MySQL-Method-2.py:69`).
  * Here it is ONE logical predicate; Catalyst pushes it into whatever source
  * sits underneath (parquet min/max pruning, JDBC `compileFilter`, DSv2
  * `SupportsPushDownFilters`).
  *
  * The reference date is parameterized instead of `current_date()` so that
  * fixtures with historical dates (1995–2001) and the DuckDB oracle evaluate
  * the identical literal (SURVEY.md §7.3, FIXTURES.md §C).
  */
object Windows {

  /** Inclusive lower bound of an N-day window ending at `refDate`:
    * `refDate - days` at midnight, as a timestamp literal (fixture date
    * columns are TimestampType).
    */
  def cutoffTs(refDate: LocalDate, days: Int): Column =
    lit(refDate.minusDays(days.toLong).toString).cast("timestamp")

  /** P4: extract predicate — rows inside the trailing window
    * (`date_trans >= refDate - days`).
    */
  def inWindow(dateCol: Column, refDate: LocalDate, days: Int): Column =
    dateCol >= cutoffTs(refDate, days)

  /** P5: retention-delete predicate — rows OLDER than the window, i.e. the
    * rows a rolling-retention DELETE removes
    * (`Template-to-MySQL/BigQuery-to-MySQL-Method-2.py:77`).
    */
  def olderThanWindow(dateCol: Column, refDate: LocalDate, days: Int): Column =
    dateCol < cutoffTs(refDate, days)

  /** P6: refresh-window-delete predicate — rows INSIDE the window being
    * re-loaded (note opposite sign of P5;
    * `Template-to-BigQuery/Dynamics365-to-BigQuery-Method-2.py:86-88`).
    */
  def insideRefreshWindow(dateCol: Column, refDate: LocalDate, days: Int): Column =
    inWindow(dateCol, refDate, days)
}
