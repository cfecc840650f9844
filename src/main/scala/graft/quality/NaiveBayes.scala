package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over whitespace unigrams, trained and applied
  * inside the engine — shared by the batch `nb_train_score` oracle query
  * ([[graft.queries.TextQueries]]) and the streaming scorer
  * ([[graft.streaming.StreamingLoaders.nbScoreSink]]), so the in-flight
  * labeler provably applies the model the batch eval measured.
  *
  * "Training" is nothing but distributed counting — one groupBy for the
  * per-(label, word) counts, one for per-label totals, one distinct for
  * |V| — so the model trains in a single pass with map-side combine and no
  * parameter server; at corpus scale the count table shards by (label,
  * word) like any aggregate. Scoring broadcasts only the label-level stats
  * (#labels rows) and equi-joins the count table; add-1 smoothing keeps
  * unseen words finite. Scores are rounded to 6 dp BEFORE the argmax so
  * two engines summing in different orders pick the same label.
  */
object NaiveBayes {

  /** `langStats`: one row per label (`l`, `t_l`, `log_prior`, `v`);
    * `classCounts`: (`l`, `w`, `c_lw`). Both are plain DataFrames — write
    * them through a store to persist the model, read back to score later. */
  final case class Model(langStats: DataFrame, classCounts: DataFrame)

  private def tokens(d: DataFrame, idCols: Seq[String], textCol: String) =
    d.select(idCols.map(col) :+
        explode(split(col(textCol), "\\s+")).as("w"): _*)
      .filter(length(col("w")) > 0)

  def train(d: DataFrame, labelCol: String = "lang",
            textCol: String = "text"): Model = {
    val dw = tokens(d, Seq(labelCol), textCol)
    val classCounts = dw.groupBy(col(labelCol).as("l"), col("w"))
      .agg(count(lit(1)).as("c_lw"))
    val classTotals = dw.groupBy(col(labelCol).as("l"))
      .agg(count(lit(1)).as("t_l"))
    val vocab = dw.select("w").distinct().agg(count(lit(1)).as("v"))
    val priors = d.groupBy(col(labelCol).as("l")).agg(count(lit(1)).as("n_l"))
      .crossJoin(broadcast(d.select(count(lit(1)).as("n_docs"))))
      .select(col("l"), (log(col("n_l")) - log(col("n_docs"))).as("log_prior"))
    Model(classTotals.join(broadcast(priors), Seq("l"))
      .crossJoin(broadcast(vocab)), classCounts)
  }

  /** Argmax label per document: (`idCol`, `pred_lang`, `log_score`). */
  def score(d: DataFrame, m: Model, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val docWord = tokens(d, Seq(idCol), textCol)
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("n_dw"))
    val scored = docWord
      .crossJoin(broadcast(m.langStats))
      .join(m.classCounts, Seq("l", "w"), "left")
      .groupBy(col(idCol), col("l"))
      .agg((first(col("log_prior")) + sum(col("n_dw") *
        (log(coalesce(col("c_lw"), lit(0L)) + lit(1)) -
          log(col("t_l") + col("v"))))).as("score"))
      .withColumn("score_r", round(col("score"), 6))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score_r").desc, col("l").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("l").as("pred_lang"),
        col("score_r").as("log_score"))
  }
}
