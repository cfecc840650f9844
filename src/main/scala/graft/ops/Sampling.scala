package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic weighted-sampling keys (Efraimidis–Spirakis A-ES,
  * "Weighted random sampling with a reservoir", IPL 2006): the k rows with
  * the LARGEST `ln(u)/w` keys — u ~ Uniform(0,1] derived from a hash of the
  * row id, w the row's weight — are a w-proportional sample without
  * replacement of the whole population. Shared by the batch
  * `weighted_sample` query and the streaming reservoir
  * ([[graft.streaming.StreamingLoaders.weightedReservoirStream]]) so both
  * provably draw with the same key function: merging per-partition or
  * per-batch top-k sets by key is exactly a top-k of the union, which is
  * what makes the operator distributable AND streamable.
  */
object Sampling {

  /** `round(ln(u)/w, 10)` with u = (md5₃₂(id)+1)/2³² ∈ (0,1], deterministic
    * per id. Rounded so the double is stable across engines (the batch
    * query's DuckDB oracle computes the identical expression). Weight 0
    * yields NULL via try_divide — under ANSI mode (Spark 4's default) a
    * plain `/` would abort the whole job on one degenerate row; NULL
    * matches DuckDB's division-by-zero result, and both the batch top-k
    * (desc ordering, nulls last) and the streaming reservoir (explicit
    * NULL-key filter) keep such rows out of the sample. */
  def aresKey(id: Column, weight: Column): Column =
    round(
      try_divide(
        log((conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
          .cast("double") + lit(1.0)) / lit(4294967296.0)), weight),
      10)
}
