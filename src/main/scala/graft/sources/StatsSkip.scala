package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file data skipping over Delta `add.stats` (numRecords / minValues /
  * maxValues / nullCount — the protocol's optional per-file column stats).
  *
  * [[DeltaFileIndex.listFiles]] receives the scan's pushed dataFilters and
  * asks, per live file, "can any row of this file satisfy them?" — a file
  * whose [min, max] interval provably excludes every matching value is
  * never scheduled. At 100 TB this is the scan economy for NON-partition
  * predicates (partition pruning already covers the layout columns): a
  * range-clustered corpus answers a key-range query touching O(matching
  * files), not O(table).
  *
  * Soundness rules (the only hard requirement — stats are OPTIONAL in the
  * spec, so a reader must stay correct when they're absent):
  *  - unknown expression shape, missing stat, unsupported type ⇒ KEEP;
  *  - And/Or recurse; Not and casts are kept conservatively;
  *  - string bounds compare in UTF8 binary order (Spark's own ordering),
  *    and a truncated bound is only ever used prefix-wise (StartsWith) —
  *    [[DeltaWrite]] omits the stat entirely rather than truncate.
  *
  * Null semantics: comparisons/EqualTo are null-rejecting, so a file whose
  * column is ALL null (nullCount == numRecords) can be skipped for them;
  * IsNull keeps a file iff nullCount > 0 (or unknown); IsNotNull keeps
  * unless all-null. */
object StatsSkip {

  /** Stats of one file, as parsed JSON (typing is deferred to the table
    * schema at evaluation time). */
  final case class FileStats(numRecords: Long, min: Map[String, JsonNode],
                             max: Map[String, JsonNode], nullCount: Map[String, Long])

  /** true ⇔ the file may contain a row satisfying ALL `filters`. */
  def keep(stats: Option[FileStats], filters: Seq[Expression],
           dataSchema: StructType): Boolean = stats match {
    case None => true
    case Some(st) => filters.forall(f => mayMatch(f, st, dataSchema))
  }

  private def mayMatch(e: Expression, st: FileStats, sch: StructType): Boolean = e match {
    case And(l, r) => mayMatch(l, st, sch) && mayMatch(r, st, sch)
    case Or(l, r) => mayMatch(l, st, sch) || mayMatch(r, st, sch)
    case EqualTo(a: AttributeReference, Literal(v, _)) => inRange(a, v, st, sch)
    case EqualTo(Literal(v, _), a: AttributeReference) => inRange(a, v, st, sch)
    case EqualNullSafe(a: AttributeReference, Literal(v, _)) =>
      if (v == null) mayHaveNull(a, st) else inRange(a, v, st, sch)
    case EqualNullSafe(Literal(v, _), a: AttributeReference) =>
      if (v == null) mayHaveNull(a, st) else inRange(a, v, st, sch)
    case LessThan(a: AttributeReference, Literal(v, _)) => cmpMin(a, v, st, sch) < 0
    case LessThan(Literal(v, _), a: AttributeReference) => cmpMax(a, v, st, sch) > 0
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => cmpMin(a, v, st, sch) <= 0
    case LessThanOrEqual(Literal(v, _), a: AttributeReference) => cmpMax(a, v, st, sch) >= 0
    case GreaterThan(a: AttributeReference, Literal(v, _)) => cmpMax(a, v, st, sch) > 0
    case GreaterThan(Literal(v, _), a: AttributeReference) => cmpMin(a, v, st, sch) < 0
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => cmpMax(a, v, st, sch) >= 0
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => cmpMin(a, v, st, sch) <= 0
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists { case Literal(v, _) => inRange(a, v, st, sch) }
    case InSet(a: AttributeReference, vs) => vs.exists(v => inRange(a, v, st, sch))
    case IsNull(a: AttributeReference) => mayHaveNull(a, st)
    case IsNotNull(a: AttributeReference) => !allNull(a, st)
    case StartsWith(a: AttributeReference, Literal(p: UTF8String, StringType)) =>
      prefixInRange(a, p, st, sch)
    case _ => true // unknown shape — never prune on it
  }

  /** -1/0/+1 comparing the file's MIN for `a` against literal `v`; returns
    * Int.MinValue ("min is -inf") when the stat is missing/unsupported so
    * `min < v`-style checks conservatively keep. */
  private def cmpMin(a: AttributeReference, v: Any, st: FileStats,
                     sch: StructType): Int =
    statValue(a, st.min, sch).flatMap(m => compare(m, v, typeOf(a, sch)))
      .getOrElse(Int.MinValue)

  /** symmetric: missing stat acts as "+inf" so `max > v` keeps. */
  private def cmpMax(a: AttributeReference, v: Any, st: FileStats,
                     sch: StructType): Int =
    statValue(a, st.max, sch).flatMap(m => compare(m, v, typeOf(a, sch)))
      .getOrElse(Int.MaxValue)

  private def inRange(a: AttributeReference, v: Any, st: FileStats,
                      sch: StructType): Boolean =
    if (v == null) false // null-rejecting comparison: no row matches
    else cmpMin(a, v, st, sch) <= 0 && cmpMax(a, v, st, sch) >= 0

  private def mayHaveNull(a: AttributeReference, st: FileStats): Boolean =
    st.nullCount.get(a.name).forall(_ > 0)

  private def allNull(a: AttributeReference, st: FileStats): Boolean =
    st.nullCount.get(a.name).exists(_ == st.numRecords)

  /** may a string in [min, max] start with prefix `p`? Compare the bounds
    * truncated to |p| — sound in binary order. */
  private def prefixInRange(a: AttributeReference, p: UTF8String, st: FileStats,
                            sch: StructType): Boolean = {
    def trunc(n: JsonNode): UTF8String = {
      val s = UTF8String.fromString(n.asText)
      if (s.numChars > p.numChars) s.substring(0, p.numChars) else s
    }
    if (typeOf(a, sch) != StringType) return true
    val lo = statValue(a, st.min, sch).map(n => trunc(n).compareTo(p) <= 0)
    val hi = statValue(a, st.max, sch).map(n => trunc(n).compareTo(p) >= 0)
    lo.getOrElse(true) && hi.getOrElse(true)
  }

  private def typeOf(a: AttributeReference, sch: StructType): DataType =
    sch.fields.find(_.name == a.name).map(_.dataType).getOrElse(NullType)

  private def statValue(a: AttributeReference, m: Map[String, JsonNode],
                        sch: StructType): Option[JsonNode] =
    m.get(a.name).filterNot(_.isNull)

  /** compare a stats JsonNode against a Catalyst literal value under the
    * column's type; None ⇒ can't compare (keep). */
  private def compare(stat: JsonNode, v: Any, dt: DataType): Option[Int] =
    (dt, v) match {
      case (_, null) => None
      case (ByteType | ShortType | IntegerType | LongType, n: Number)
          if stat.isIntegralNumber =>
        Some(java.lang.Long.compare(stat.asLong, n.longValue))
      case (FloatType | DoubleType, n: Number) if stat.isNumber =>
        // SQL comparison semantics: -0.0 = 0.0 (Double.compare's total
        // order says -0.0 < 0.0, which would wrongly skip a file with
        // min=max=0.0 for a pushed `x = -0.0`). Normalize both sides.
        def norm(d: Double): Double = if (d == 0.0d) 0.0d else d
        Some(java.lang.Double.compare(norm(stat.asDouble), norm(n.doubleValue)))
      case (StringType, u: UTF8String) if stat.isTextual =>
        Some(Integer.signum(UTF8String.fromString(stat.asText).compareTo(u)))
      case (BooleanType, b: java.lang.Boolean) if stat.isBoolean =>
        Some(java.lang.Boolean.compare(stat.asBoolean, b))
      case (DateType, d: Integer) if stat.isTextual =>
        // Delta serializes date stats as ISO yyyy-MM-dd; Catalyst dates
        // are epoch days
        scala.util.Try(java.time.LocalDate.parse(stat.asText).toEpochDay.toInt)
          .toOption.map(Integer.compare(_, d))
      case _ => None // timestamps/decimals/binary: writer omits, reader keeps
    }
}
