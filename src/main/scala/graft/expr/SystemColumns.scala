package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Global system-column conventions and sentinel timestamps
  * (reference: `dbt_project.yml:17-25,47-81`).
  */
object SystemColumns {
  val LdtsAlias = "ldts"
  val RsrcAlias = "rsrc"
  val LedtsAlias = "ledts"
  val SdtsAlias = "sdts"
  val IsCurrentAlias = "is_current"

  /** `dbt_project.yml:57` beginning_of_all_times (databricks dialect) */
  val BeginningOfAllTimes = "0001-01-01 00:00:01"
  /** `dbt_project.yml:58` end_of_all_times */
  val EndOfAllTimes = "8888-12-31 23:59:59"
  val BeginningOfAllTimesDate = "0001-01-01"
  val EndOfAllTimesDate = "8888-12-31"

  /** ghost-record record sources (`macros/staging/stage.sql` defaults:
    * unknown → 'SYSTEM', error → 'ERROR') */
  val UnknownRsrc = "SYSTEM"
  val ErrorRsrc = "ERROR"

  val UnknownString = "(unknown)"
  val ErrorString = "(error)"
  val UnknownNumeric = -1
  val ErrorNumeric = -2

  def beginningOfAllTimesTs: Column = to_timestamp(lit(BeginningOfAllTimes))
  def endOfAllTimesTs: Column = to_timestamp(lit(EndOfAllTimes))
}

/** Ghost-record value per datatype (reference:
  * `macros/supporting/ghost_record_per_datatype.sql:583-632`, databricks).
  */
object GhostRecords {
  import SystemColumns._

  sealed trait Kind
  case object Unknown extends Kind
  case object Error extends Kind

  def valueFor(dt: DataType, kind: Kind)(implicit cfg: HashConfig): Column = {
    val (ts, date, str, num) = kind match {
      case Unknown => (BeginningOfAllTimes, BeginningOfAllTimesDate, UnknownString, UnknownNumeric)
      case Error   => (EndOfAllTimes, EndOfAllTimesDate, ErrorString, ErrorNumeric)
    }
    dt match {
      case TimestampType | TimestampNTZType => to_timestamp(lit(ts)).cast(dt)
      case DateType                         => to_date(lit(date))
      case StringType                       => lit(str)
      case ByteType | ShortType | IntegerType | LongType | DoubleType | FloatType =>
        lit(num).cast(dt)
      case d: DecimalType                   => lit(num).cast(d)
      case BooleanType                      => lit(false)
      case BinaryType =>
        lit(if (kind == Unknown) cfg.zeroKey else cfg.errorKey).cast(BinaryType)
      case other                            => lit(null).cast(other)
    }
  }

  /** hash columns on ghost rows carry the zero/error key
    * (reference `staging/databricks/stage.sql:526-532,592-598`) */
  def hashValueFor(kind: Kind)(implicit cfg: HashConfig): Column = kind match {
    case Unknown => cfg.zeroKeyLit
    case Error   => cfg.errorKeyLit
  }
}
