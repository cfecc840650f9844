package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Invariant checks for the round-5 training-data operators (exact values
  * are driver-verified against the DuckDB oracle; these pin the semantic
  * properties a hash compare can't express). */
class TrainingOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, dir)

  test("bloom_dedup: no false negatives, FP accounting is consistent") {
    val rows = run("bloom_dedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bloom, exact, fp) =
        (r.getAs[Boolean]("bloom_hit"), r.getAs[Boolean]("exact_dup"),
          r.getAs[Boolean]("false_positive"))
      // a Bloom filter can lie positive, never negative
      if (exact) assert(bloom, s"false negative at doc ${r.get(0)}")
      assert(fp === (bloom && !exact))
    }
  }

  test("gopher_rules: ratios bounded, keep implies every threshold") {
    run("gopher_rules").collect().foreach { r =>
      val frac = r.getAs[Double]("frac_alpha")
      assert(frac >= 0.0 && frac <= 1.0)
      if (r.getAs[Boolean]("keep")) {
        assert(r.getAs[Long]("n_words") >= 10)
        assert(r.getAs[Long]("stopword_hits") >= 2)
        assert(r.getAs[Double]("symbol_ratio") <= 0.1)
      }
    }
  }

  test("word_entropy: 0 <= H <= log2(n_unique)") {
    run("word_entropy").collect().foreach { r =>
      val h = r.getAs[Double]("entropy")
      val maxH = math.log(r.getAs[Long]("n_unique").toDouble) / math.log(2)
      assert(h >= -1e-9 && h <= maxH + 1e-6,
        s"doc ${r.get(0)}: H=$h max=$maxH")
    }
  }

  test("boilerplate_ngrams: every emitted gram clears the doc-freq floor") {
    val rows = run("boilerplate_ngrams").collect()
    assert(rows.nonEmpty, "threshold too high for the test corpus")
    rows.foreach(r => assert(r.getAs[Long]("doc_freq") >= 4))
  }

  test("stratified_sample: exact per-stratum quota, reproducible") {
    val a = run("stratified_sample").collect().map(_.toString).sorted
    val b = run("stratified_sample").collect().map(_.toString).sorted
    assert(a.sameElements(b), "sample not deterministic")
    val perLang = run("stratified_sample").groupBy("lang").count().collect()
    perLang.foreach(r => assert(r.getAs[Long]("count") <= 40))
  }

  test("semdedup: one keeper per cell, keeper self-similarity is 1") {
    val rows = run("semdedup").collect()
    val keepers = rows.filter(r => r.getAs[Long]("vec_id") == r.getAs[Long]("keeper_id"))
    assert(keepers.map(_.getAs[Long]("cell")).distinct.length === keepers.length)
    keepers.foreach { r =>
      assert(math.abs(r.getAs[Double]("cos_to_keeper") - 1.0) < 1e-9)
      assert(!r.getAs[Boolean]("is_dup"))
    }
    // every cell's members reference that cell's keeper
    val keeperOf = keepers.map(r => r.getAs[Long]("cell") -> r.getAs[Long]("keeper_id")).toMap
    rows.foreach(r =>
      assert(r.getAs[Long]("keeper_id") === keeperOf(r.getAs[Long]("cell"))))
  }

  test("dup_span_rewrite: removal accounting matches the clean text") {
    val rows = run("dup_span_rewrite").collect()
    assert(rows.exists(_.getAs[Long]("n_removed") > 0), "corpus has no dup spans?")
    rows.foreach { r =>
      val kept = r.getAs[String]("clean_text")
      val keptWords = if (kept.isEmpty) 0L else kept.split(" ").length.toLong
      assert(keptWords === r.getAs[Long]("n_words") - r.getAs[Long]("n_removed"),
        s"doc ${r.get(0)}: $keptWords kept vs ${r.getAs[Long]("n_words")}-${r.getAs[Long]("n_removed")}")
      assert(r.getAs[Long]("n_removed") <= r.getAs[Long]("n_words"))
    }
    // the lowest doc_id can never lose a span to an earlier doc
    val firstDoc = rows.minBy(_.getAs[Long]("doc_id"))
    assert(firstDoc.getAs[Long]("n_removed") === 0L)
  }

  test("dsir_weights: target-language docs score higher on average") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang")
    val rows = run("dsir_weights").join(docs, "doc_id").collect()
    val (en, rest) = rows.partition(_.getAs[String]("lang") == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("log_weight")).sum / rs.length
    // the estimator's defining property: importance weights separate the
    // target domain from the rest of the corpus in expectation
    assert(mean(en) > mean(rest),
      s"mean(en)=${mean(en)} !> mean(rest)=${mean(rest)}")
    rows.foreach(r =>
      assert(r.getAs[Boolean]("keep") === (r.getAs[Double]("log_weight") > 0.0)))
  }

  test("kmeans_embed: total assignment, valid cells, within-cell distance sane") {
    val rows = run("kmeans_embed").collect()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.length.toLong === nVecs, "every vector must be assigned")
    rows.foreach { r =>
      assert((0 to 3).contains(r.getAs[Int]("cell")))
      assert(r.getAs[Double]("d2") >= 0.0)
    }
    assert(rows.map(_.getAs[Int]("cell")).distinct.length > 1,
      "degenerate clustering: everything in one cell")
  }

  test("weighted_sample: k rows, keys non-positive and descending") {
    val rows = run("weighted_sample").collect()
    assert(rows.length === 20)
    val keys = rows.map(_.getAs[Double]("sample_key"))
    assert(keys.forall(_ <= 0.0), "ln(u)/w must be <= 0")
    assert(keys.sameElements(keys.sorted.reverse), "not ordered by key desc")
    // higher weight (n_chars) biases toward inclusion: the sampled docs'
    // mean length should beat the corpus mean
    val corpusMean = spark.read.parquet(s"$dir/documents.parquet")
      .agg(org.apache.spark.sql.functions.avg("n_chars")).head().getDouble(0)
    val sampleMean = rows.map(_.getAs[Long]("n_chars").toDouble).sum / rows.length
    assert(sampleMean > corpusMean * 0.9,
      s"sample mean $sampleMean far below corpus mean $corpusMean")
  }

  test("bigram_perplexity: positive entropy, bigram count = words - 1") {
    val wc = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id",
        "size(filter(split(text, '\\\\s+'), w -> length(w) > 0)) AS nw")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("nw")).toMap
    run("bigram_perplexity").collect().foreach { r =>
      assert(r.getAs[Double]("cross_entropy") > 0.0)
      assert(r.getAs[Long]("n_bigrams") === wc(r.getAs[Long]("doc_id")) - 1L)
    }
  }

  test("pagerank_sim: mass conserved, every candidate-graph node ranked") {
    val ranks = run("pagerank_sim").collect()
    assert(ranks.nonEmpty)
    // the candidate graph is symmetric, so every node has out-edges and
    // total rank is conserved at 1 through every power iteration (up to
    // the 4-dp output rounding × node count)
    val total = ranks.map(_.getAs[Double]("pagerank")).sum
    assert(math.abs(total - 1.0) <= 5e-5 * ranks.length,
      s"rank mass $total over ${ranks.length} nodes")
    ranks.foreach(r => assert(r.getAs[Double]("pagerank") > 0.0))
    // node set = exactly the clustered (non-isolated) docs
    val clustered = run("dedup_clusters").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(ranks.map(_.getAs[Long]("doc_id")).toSet === clustered)
  }

  test("temperature_mix: weights sum to 1 and compress the source skew") {
    val rows = run("temperature_mix").collect()
    assert(rows.length > 1)
    assert(math.abs(rows.map(_.getAs[Double]("sample_weight")).sum - 1.0) <= 1e-3)
    // α < 1 flattens: below-average sources are upsampled, above-average
    // sources downsampled — factors must straddle 1 in a skewed corpus
    val f = rows.map(_.getAs[Double]("upsample_factor"))
    rows.foreach { r =>
      val share = r.getAs[Double]("doc_share")
      val factor = r.getAs[Double]("upsample_factor")
      assert(factor > 0.0, s"source ${r.get(0)}")
      // smaller share ⇒ larger upsample factor (monotone in p^(α-1))
      rows.foreach { o =>
        if (o.getAs[Double]("doc_share") < share - 1e-12)
          assert(o.getAs[Double]("upsample_factor") >= factor - 1e-9)
      }
    }
    assert(f.max >= f.min, "degenerate")
  }

  test("triangle_count: bounds, divisibility, node set = candidate graph") {
    val rows = run("triangle_count").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (deg, t) = (r.getAs[Long]("degree"), r.getAs[Long]("triangles"))
      assert(t <= deg * (deg - 1) / 2, s"doc ${r.get(0)}: $t > C($deg,2)")
      val c = r.getAs[Double]("clustering_coeff")
      assert(c >= 0.0 && c <= 1.0 + 1e-9)
    }
    // every triangle contributes exactly 3 node-participations
    assert(rows.map(_.getAs[Long]("triangles")).sum % 3 === 0)
    val ranked = run("pagerank_sim").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet === ranked,
      "triangle/pagerank node sets must both equal the candidate graph")
  }

  test("nb_train_score: one prediction per doc, beats uniform random") {
    val rows = run("nb_train_score").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(rows.length === docs.count())
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length === rows.length)
    val langs = docs.select("lang").distinct().collect()
      .map(_.getString(0)).toSet
    rows.foreach { r =>
      assert(langs.contains(r.getAs[String]("pred_lang")))
      // log of a product of probabilities ≤ 0 for any real document
      assert(r.getAs[Double]("log_score") < 0.0)
    }
    val acc = rows.count(_.getAs[Boolean]("correct")).toDouble / rows.length
    assert(acc > 1.0 / langs.size,
      s"resubstitution accuracy $acc not above uniform ${1.0 / langs.size}")
  }

  test("classifier_pr_curve: label total invariant, recall monotone down") {
    val rows = run("classifier_pr_curve").collect()
      .sortBy(_.getAs[Double]("threshold"))
    assert(rows.length === 9)
    // tp + fn = total positive labels, independent of the threshold
    val positives = rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn")).distinct
    assert(positives.length === 1, s"tp+fn varies: ${positives.toSeq}")
    // raising the threshold can only lose true positives
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi.getAs[Long]("tp") <= lo.getAs[Long]("tp"))
    }
    rows.foreach { r =>
      Seq("precision", "recall", "f1").foreach { c =>
        val v = r.getAs[java.lang.Double](c)
        if (v != null) assert(v >= 0.0 && v <= 1.0, s"$c=$v")
      }
    }
  }

  test("event_spike_detection: flag agrees with the rounded z-score") {
    val rows = run("event_spike_detection").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getAs[java.lang.Double]("z")
      val spike = r.getAs[java.lang.Boolean]("spike")
      if (z == null) assert(spike == null, "NULL z must not decide a flag")
      else assert(spike === (z >= 3.0), s"z=$z spike=$spike")
      // the baseline never sees the current row, so a constant-rate stream
      // can't flag itself: zero std ⇒ z is NULL, handled above
      val std = r.getAs[java.lang.Double]("baseline_std")
      if (std != null && std > 0 && z != null) {
        val recomputed = (r.getAs[Long]("n") - r.getAs[Double]("baseline_mean")) / std
        assert(math.abs(recomputed - z) <= 0.01,
          s"z=$z vs recomputed=$recomputed")
      }
    }
  }

  test("event_sliding_window: every event lands in exactly 4 windows") {
    val slid = run("event_sliding_window").collect()
    assert(slid.nonEmpty)
    val nEvents = spark.read.parquet(s"$dir/events.parquet").count()
    // 1h window / 15min slide ⇒ overlap factor 4: the window counts must
    // sum to exactly 4× the raw event count
    assert(slid.map(_.getAs[Long]("n_events")).sum === 4 * nEvents)
    slid.foreach { r =>
      val (s0, s1) = (r.getAs[java.sql.Timestamp]("window_start"),
        r.getAs[java.sql.Timestamp]("window_end"))
      assert(s1.getTime - s0.getTime === 3600000L, s"window span $s0..$s1")
      assert(s0.getTime % 900000L === 0L, s"unaligned window start $s0")
    }
  }

  test("event_dwell_time: gaps non-negative, mean within min/max") {
    val rows = run("event_dwell_time").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("min_gap_us"), r.getAs[Long]("max_gap_us"))
      val mean = r.getAs[Double]("mean_gap_s") * 1e6
      assert(lo >= 0L, "time went backwards within a user")
      assert(lo <= hi)
      assert(mean >= lo - 1e2 && mean <= hi + 1e2, s"mean $mean outside [$lo,$hi]")
    }
  }

  test("user_value_quantiles: monotone percentiles over all users") {
    val r = run("user_value_quantiles").collect().head
    val ps = Seq("p25", "p50", "p75", "p90", "p99").map(r.getAs[Double])
    assert(ps === ps.sorted, s"non-monotone percentiles $ps")
    val nUsers = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("n_users") === nUsers)
  }

  test("event_topk_paths: ≤20 rows, counts cover users, descending") {
    val rows = run("event_topk_paths").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val counts = rows.map(_.getAs[Long]("n_users"))
    assert(counts.sameElements(counts.sorted.reverse), "not count-descending")
    val nUsers = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count()
    assert(counts.sum <= nUsers)
    rows.foreach { r =>
      val steps = r.getAs[String]("path").split(">")
      assert(steps.nonEmpty && steps.length <= 3)
    }
  }

  test("embed_norm_outliers: z recomputes from published stats") {
    val rows = run("embed_norm_outliers").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getAs[java.lang.Double]("z")
      val out = r.getAs[java.lang.Boolean]("outlier")
      if (z == null) assert(out == null)
      else assert(out === (math.abs(z) >= 2.5), s"z=$z outlier=$out")
    }
    // a data-quality screen that flags everything is as useless as one
    // that flags nothing: outliers must be a strict minority
    val flagged = rows.count(r => Option(r.getAs[java.lang.Boolean]("outlier")).exists(_.booleanValue))
    assert(flagged.toDouble / rows.length < 0.1, s"$flagged/${rows.length} flagged")
  }

  test("doc_length_histogram: buckets partition the corpus, bounds honor bucket") {
    val rows = run("doc_length_histogram").collect()
    assert(rows.nonEmpty)
    val nDocs = spark.read.parquet(s"$dir/documents.parquet")
      .filter("n_chars > 0").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val (lo, hi) = (r.getAs[Long]("min_chars"), r.getAs[Long]("max_chars"))
      assert(lo >= (1L << b) && hi < (1L << (b + 1)),
        s"bucket $b holds [$lo,$hi]")
    }
  }

  test("quality_deciles: 10 deciles per source, contiguous score ranges") {
    val rows = run("quality_deciles").collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Long]("decile")).sorted.sameElements(1L to 10L),
        s"$src deciles ${rs.map(_.getAs[Long]("decile")).sorted.toSeq}")
      // ntile balance: group sizes differ by at most 1
      val sizes = rs.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1, s"$src sizes ${sizes.toSeq}")
      // decile k's max_score ≤ decile k+1's min_score (ties allowed)
      val ordered = rs.sortBy(_.getAs[Long]("decile"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("max_score") <= b.getAs[Double]("min_score") + 1e-9)
        case _ =>
      }
    }
  }

  test("tokenizer_fertility: ratios recompute from the published sums") {
    val rows = run("tokenizer_fertility").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nc, nt, nd) = (r.getAs[Long]("n_chars"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_docs"))
      assert(math.abs(r.getAs[Double]("chars_per_token") - nc.toDouble / nt) <= 1e-4)
      assert(math.abs(r.getAs[Double]("tokens_per_doc") - nt.toDouble / nd) <= 1e-4)
    }
  }

  test("multi_touch_attribution: credit conserves — one unit per purchase") {
    val rows = run("multi_touch_attribution").collect()
    assert(rows.nonEmpty)
    // last-touch attribution emits exactly one row per attributed
    // purchase, so its row count IS the number of purchases with ≥1
    // touch — and each such purchase distributes exactly 1.0 of credit
    // under both schemes
    val nAttributed = run("click_attribution").count().toDouble
    val linTotal = rows.map(_.getAs[Double]("linear_credit")).sum
    val decTotal = rows.map(_.getAs[Double]("decay_credit")).sum
    val tol = rows.length * 5e-5 + 1e-6 // 4-dp rounding per row
    assert(math.abs(linTotal - nAttributed) <= tol, s"linear $linTotal vs $nAttributed")
    assert(math.abs(decTotal - nAttributed) <= tol, s"decay $decTotal vs $nAttributed")
    rows.foreach { r =>
      assert(r.getAs[Double]("linear_credit") > 0.0)
      assert(r.getAs[Double]("decay_credit") > 0.0)
    }
  }

  test("event_type_user_overlap: all pairs, Jaccard bounds, intersection caps") {
    val rows = run("event_type_user_overlap").collect()
    val nTypes = spark.read.parquet(s"$dir/events.parquet")
      .select("event_type").distinct().count().toInt
    assert(rows.length === nTypes * (nTypes - 1) / 2, s"${rows.length} pairs")
    rows.foreach { r =>
      val (na, nb, both) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_both"))
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
      assert(both <= math.min(na, nb))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(math.abs(j - both.toDouble / (na + nb - both)) <= 1e-6)
    }
  }

  test("event_hour_heatmap: cells partition all events, keys in range") {
    val rows = run("event_hour_heatmap").collect()
    val nEvents = spark.read.parquet(s"$dir/events.parquet").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum === nEvents)
    rows.foreach { r =>
      val (d, h) = (r.getAs[Long]("dow"), r.getAs[Long]("hour_of_day"))
      assert(d >= 1L && d <= 7L, s"dow $d")
      assert(h >= 0L && h <= 23L, s"hour $h")
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_events"))
    }
  }

  test("ivf_bcast_ann: full top-3 per query, codebook-as-table plan has no cartesian") {
    val rows = run("ivf_bcast_ann").collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size === 10)
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.sameElements(Array(1L, 2L, 3L)),
        s"query $q ranks ${rs.map(_.getAs[Long]("rank")).toSeq}")
      rs.foreach(r => assert(math.abs(r.getAs[Double]("cos_sim")) <= 1.0001))
    }
    // the centroid cross join must plan as a broadcast nested loop —
    // a CartesianProduct here would shuffle corpus × nlist at scale
    val plan = run("ivf_bcast_ann").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "centroid join not broadcast")
  }

  test("contrastive_pairs: labels honored, valid cosines, margin recomputes") {
    val rows = run("contrastive_pairs").collect()
    assert(rows.nonEmpty)
    val labelOf = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    rows.foreach { r =>
      val aLabel = r.getAs[Int]("anchor_label")
      Option(r.getAs[java.lang.Long]("pos_id")).foreach { p =>
        assert(labelOf(p) === aLabel, s"positive $p label mismatch")
        assert(math.abs(r.getAs[Double]("pos_cos")) <= 1.0001)
      }
      Option(r.getAs[java.lang.Long]("neg_id")).foreach { n =>
        assert(labelOf(n) !== aLabel, s"negative $n shares the label")
        assert(math.abs(r.getAs[Double]("neg_cos")) <= 1.0001)
      }
      val m = r.getAs[java.lang.Double]("margin")
      if (m != null)
        assert(math.abs(m - (r.getAs[Double]("pos_cos") -
          r.getAs[Double]("neg_cos"))) <= 2e-4)
    }
  }

  test("label_class_weights: frequencies sum to 1, weights are inverse-frequency") {
    val rows = run("label_class_weights").collect()
    assert(rows.nonEmpty)
    val freqSum = rows.map(_.getAs[Double]("freq")).sum
    assert(math.abs(freqSum - 1.0) <= rows.length * 1e-6)
    // expected count under balanced sampling: sum over labels of
    // n · weight = total for every label ⇒ weights × freq are constant
    rows.foreach { r =>
      val expected = r.getAs[Long]("total").toDouble /
        (rows.length * r.getAs[Long]("n"))
      assert(math.abs(r.getAs[Double]("balanced_weight") - expected) <= 1e-4)
    }
  }

  test("embed_centroid_drift: cosine bounded, shift non-negative and consistent") {
    val rows = run("embed_centroid_drift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cos = r.getAs[Double]("centroid_cos")
      val shift = r.getAs[Double]("l2_shift")
      // the synthetic embeddings are ~zero-mean, so the half-centroids are
      // small residuals and their cosine can land anywhere in [-1, 1] —
      // only the cosine bound and the metric's non-negativity are invariant
      assert(math.abs(cos) <= 1.0001, s"cos $cos")
      assert(shift >= 0.0)
    }
  }

  test("lsh_band_sweep: recall rises and precision falls with band count") {
    val rows = run("lsh_band_sweep").collect()
      .sortBy(_.getAs[Long]("n_bands"))
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bands") * r.getAs[Long]("rows_per_band") === 8L)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_cands"))
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_truth"))
    }
    // more bands ⇒ a pair collides on ≥1 band more easily: the candidate
    // set (and so recall) is monotone non-decreasing in band count
    val cands = rows.map(_.getAs[Long]("n_cands"))
    assert(cands.zip(cands.tail).forall { case (a, b) => a <= b },
      s"candidate counts not monotone: ${cands.toSeq}")
    val recalls = rows.map(r => Option(r.getAs[java.lang.Double]("recall"))
      .map(_.doubleValue).getOrElse(0.0))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b + 1e-9 },
      s"recall not monotone: ${recalls.toSeq}")
  }

  test("key_skew_report: shares and salt recompute from counts") {
    val rows = run("key_skew_report").collect()
    assert(rows.length === 10)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.sameElements(ns.sorted.reverse), "not ordered by count desc")
    rows.foreach { r =>
      val (n, keys, total) = (r.getAs[Long]("n"), r.getAs[Long]("n_keys"),
        r.getAs[Long]("n_rows"))
      assert(math.abs(r.getAs[Double]("skew_vs_uniform") -
        n.toDouble * keys / total) <= 1e-3)
      val salt = r.getAs[Long]("suggested_salt")
      assert(salt >= 1L && salt <= 32L)
      assert(salt === math.max(1L, math.ceil(n.toDouble * 32 / total).toLong))
    }
  }

  test("pq_ann: top-3 per query, approx cosine is a valid cosine") {
    val rows = run("pq_ann").collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.sameElements(Array(1L, 2L, 3L)),
        s"query $q ranks ${rs.map(_.getAs[Long]("rank")).toSeq}")
      // score is the cosine between the query and a RECONSTRUCTED vector,
      // so it is bounded like any cosine (up to 4-decimal rounding)
      rs.foreach(r =>
        assert(math.abs(r.getAs[Double]("approx_cos")) <= 1.0001))
    }
  }
}
