package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset surface: case-class rows, a custom `Aggregator` (the
  * Dataset-native UDAF — compiled reduce/merge over an encoded buffer,
  * mergeable exactly like any Catalyst partial aggregate), and
  * imperative per-group logic for `flatMapGroups`. Used where type
  * safety genuinely helps (domain invariants inside the fold); plain
  * Column expressions everywhere else.
  */
object TypedOps {

  /** input row for the typed aggregation demo */
  final case class SegPrice(segment: String, price: Double)

  /** input row for the streak computation */
  final case class ActiveDay(userId: Long, epochDay: Int)

  /** output row of the streak computation */
  final case class Streak(user_id: Long, longest_streak: Int, n_active_days: Int)

  /** Geometric mean as a typed Aggregator: buffer = (Σ ln x, n) — both
    * reduce and merge are associative/commutative, so Spark runs it
    * map-side-combined like a built-in agg. */
  object GeoMean extends Aggregator[SegPrice, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), a: SegPrice): (Double, Long) =
      (b._1 + math.log(a.price), b._2 + 1L)
    def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0L) Double.NaN else math.exp(b._1 / b._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Longest run of CONSECUTIVE active days for one user's sorted
    * distinct day list. Per-group state is O(active days) — bounded by
    * the calendar span, not the event count (callers pre-distinct). */
  def longestStreak(userId: Long, days: Iterator[Int]): Streak = {
    val sorted = days.toArray.sorted
    var best = 0; var cur = 0; var prev = Int.MinValue
    sorted.foreach { d =>
      cur = if (d == prev + 1) cur + 1 else 1
      if (cur > best) best = cur
      prev = d
    }
    Streak(userId, best, sorted.length)
  }
}
