package graft

import graft.SparkSpec

/** SQL-text access to the native expressions via function registration. */
class GraftExtensionsSpec extends SparkSpec {

  test("dot_product / vec_norm / ma_list_agg are callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS dp,
        |       vec_norm(array(3.0F, 4.0F)) AS nrm""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    val agg = spark.sql(
      """SELECT ma_list_agg(struct(k, s)) AS l FROM VALUES (2, 'b'), (1, 'a') AS t(k, s)
        |""".stripMargin).head()
    assert(agg.getString(0) == "a,b")
  }

  test("ngrams generator: rows, positions, and empty/NULL/short edge cases") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      """SELECT t.id, g.pos, g.ngram
        |FROM VALUES (1, 'a b c d'), (2, 'x y'), (3, ''), (4, CAST(NULL AS STRING)),
        |            (5, '  padded   words  here  ')
        |  AS t(id, txt)
        |LATERAL VIEW ngrams(txt, 3) g AS pos, ngram
        |ORDER BY id, pos""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq
    assert(got === Seq(
      (1, 0, "a b c"), (1, 1, "b c d"),
      (5, 0, "padded words here")),
      s"short/empty/NULL docs must generate zero rows: $got")
  }

  test("dv_hashkey / dv_hashdiff from SQL equal the Column-API hashes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    GraftExtensions.register(spark)
    val df = Seq((1, "alice", 10.0), (2, null.asInstanceOf[String], 20.0))
      .toDF("k", "n", "b")
    df.createOrReplaceTempView("ext_hash_t")
    val sql = spark.sql(
      """SELECT dv_hashkey(k) AS hk, dv_hashdiff(n, b) AS hd
        |FROM ext_hash_t ORDER BY k""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    implicit val hc: graft.expr.HashConfig = graft.expr.HashConfig()
    val api = df
      .select(graft.expr.Hashing.hashkey(Seq(col("k"))).as("hk"),
        graft.expr.Hashing.hashdiff(Seq(col("n"), col("b"))).as("hd"))
      .orderBy(col("hk")) // same rows, order by content below
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(sql.toSet === api.toSet,
      "SQL surface must produce stage-identical keys, incl. NULL handling")
  }

  test("ma_list_agg rejects non-struct and non-string-tail arguments at analysis") {
    GraftExtensions.register(spark)
    val e1 = intercept[Exception] {
      spark.sql("SELECT ma_list_agg(k) FROM VALUES (1) AS t(k)").head()
    }
    assert(e1.getMessage.contains("ma_list_agg"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT ma_list_agg(struct(s, k)) FROM VALUES (1, 'a') AS t(k, s)").head()
    }
    assert(e2.getMessage.contains("ma_list_agg"))
  }
}
