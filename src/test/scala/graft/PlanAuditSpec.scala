package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec, RangeExec, SparkPlan, TakeOrderedAndProjectExec}

/** Scale-design gate over the ENTIRE query registry: every SparkEntry query
  * is planned (AQE off, so the physical tree is inspectable) and must not
  * contain
  *   - a CartesianProduct: every intentional cross join in the library is
  *     `crossJoin(broadcast(tiny))` (PIT backbones, eff-sat history
  *     matrices, date spines) and plans as BroadcastNestedLoopJoin — a
  *     CartesianProduct means both sides were unbounded, which at 100 TB
  *     is quadratic shuffle I/O, never intended;
  *   - a partition-less Window (all rows to ONE task — the classic
  *     silent-scale-killer) outside the whitelisted queries whose global
  *     window runs over a bounded-by-construction frame (the snapshot
  *     control table: one row per day).
  */
class PlanAuditSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  /** global window over a bounded-by-construction frame: the snapshot
    * control table (one row/day, documented in SnapshotLoaders),
    * blob_embed_topk's rank over an already-LIMIT-10 result, and
    * range_interval_window's RANGE frame over the per-day pre-aggregate
    * (one row/day by construction — see ConformanceQueries) */
  private val globalWindowOk: Set[String] =
    Set("snap_latest_row", "snap_v1_customer", "snap_v1_multi",
      "pit_customer", "pit_multisat", "snap_logarithmic",
      "blob_embed_topk", "range_interval_window",
      // one-row-per-day pre-aggregates feed these (~366 and ~30 rows);
      // boundedInput additionally asserts the collapse is in the plan
      "rolling_median_7d", "new_vs_returning",
      // 25-row nation dimension behind a plan-visible LIMIT
      "null_ordering_conformance",
      // 5-row segment aggregate feeds the collated rank window
      "collation_conformance")

  /** An allowlisted global window is only OK when its input is bounded by
    * construction — every path from the window down to a leaf must pass
    * through a row-collapsing operator (aggregate, limit, or a literal
    * Range date spine) BEFORE reaching an unbounded scan. This keeps the
    * allowlist from exempting a whole query: adding a second, genuinely
    * unbounded global window to an allowlisted query still fails. */
  private def boundedInput(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec => true
    case _: GlobalLimitExec | _: LocalLimitExec |
         _: TakeOrderedAndProjectExec => true
    case _: RangeExec => true // sequence()/spine generators: bounded literal
    case leaf if leaf.children.isEmpty => false // an unbounded scan reached
    case other => other.children.forall(boundedInput)
  }

  test("no registry query plans a CartesianProduct or an undocumented global window") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val names = SparkEntry.queries.keys.toSeq.sorted
      val problems = names.flatMap { name =>
        try {
          val plan = SparkEntry.queries(name)(spark, sfDir)
            .queryExecution.executedPlan
          val cart = plan.collect { case c: CartesianProductExec => c }
          val gw = plan.collect {
            case w: WindowExec if w.partitionSpec.isEmpty => w
          }
          (if (cart.nonEmpty) Seq(s"$name: CartesianProduct") else Nil) ++
            (if (gw.nonEmpty && !globalWindowOk(name))
              Seq(s"$name: partition-less Window") else Nil) ++
            (if (globalWindowOk(name))
              gw.filterNot(w => boundedInput(w.child)).map(w =>
                s"$name: allowlisted global window over UNBOUNDED input")
            else Nil)
        } catch {
          case e: Throwable => Seq(s"$name: failed to plan — ${e.getMessage}")
        }
      }
      assert(problems.isEmpty,
        s"scale-hostile plans:\n  ${problems.mkString("\n  ")}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }
}
