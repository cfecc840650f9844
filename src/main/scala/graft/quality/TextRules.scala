package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style word-level quality heuristics (Rae et al. 2021 §A1.1,
  * adapted for single-line docs) as ONE stateless codegen'd projection —
  * shared verbatim by the batch `gopher_rules` oracle query
  * ([[graft.queries.TextQueries]]) and the streaming quality router
  * ([[graft.streaming.StreamingLoaders.qualityRouterSink]]), so the
  * in-flight gate provably applies the same policy as the batch audit.
  * Reference anchor: the staging layer's derived-column projection
  * (macros/staging/stage.sql:34-38) — quality columns are just derived
  * columns; the thresholds are the pipeline's, not the reference's.
  */
object TextRules {

  /** the six stopwords the rules probe for (lowercase) */
  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in")

  /** Append `n_words, mean_word_len, frac_alpha, stopword_hits,
    * symbol_ratio, keep` derived from `textCol`. Pure projection: runs
    * inside the scan's WholeStageCodegen span, preserves partitioning, and
    * is replay-safe by construction (same rows in → same rows out). */
  def withGopherColumns(df: DataFrame, textCol: String): DataFrame = {
    // NULL text ⇒ empty doc, NOT a null row: size(split(NULL)) is -1 under
    // the legacy sizeOfNull default, which would record n_words = -1 in the
    // reject audit. Coalescing pins the disposition: n_words = 0, keep=false.
    val txt = coalesce(col(textCol), lit(""))
    val words = filter(split(txt, "\\s+"), w => length(w) > 0)
    val nw = size(col("__words"))
    df.withColumn("__words", words)
      .withColumn("n_words", nw.cast("long"))
      // try_divide: an empty doc (n_words = 0) yields NULL ratios — a plain
      // `/` under ANSI mode (Spark 4's default) would abort the whole job
      // on one degenerate row; NULL is also what DuckDB's /0 returns, so
      // the oracle agrees. keep stays false (NULL fails every bound).
      .withColumn("mean_word_len",
        round(try_divide(aggregate(col("__words"), lit(0), (a, w) => a + length(w))
          .cast("double"), nw), 4))
      .withColumn("frac_alpha",
        round(try_divide(size(filter(col("__words"), w => w.rlike("^[A-Za-z]+$")))
          .cast("double"), nw), 4))
      .withColumn("stopword_hits",
        size(filter(col("__words"), w => lower(w).isin(Stopwords: _*))).cast("long"))
      .withColumn("symbol_ratio",
        round(try_divide(regexp_count(txt, lit("[^A-Za-z0-9\\s]")).cast("double"), nw), 4))
      .withColumn("keep", keepExpr)
      .drop("__words")
  }

  /** the gate over the derived columns (word-count bounds, mean word
    * length, alphabetic fraction, stopword presence, symbol density) */
  def keepExpr: Column =
    col("n_words").between(10, 100000) &&
      col("mean_word_len").between(2.0, 10.0) &&
      col("frac_alpha") >= 0.8 && col("stopword_hits") >= 2 &&
      col("symbol_ratio") <= 0.1
}
