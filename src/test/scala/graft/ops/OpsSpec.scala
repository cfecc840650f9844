package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join and spreads a hot key across buckets") {
    // one hot key (90% of rows) + a long tail
    val left = ((1 to 900).map(i => ("hot", s"p$i")) ++
      (1 to 100).map(i => (s"k$i", s"q$i"))).toDF("bk", "payload")
    val right = (Seq("hot") ++ (1 to 50).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("bk", "dim")

    for (jt <- Seq("inner", "left", "left_semi")) {
      val plain = left.join(right, Seq("bk"), jt)
      val salted = Ops.saltedJoin(left, right, Seq("bk"), buckets = 8, joinType = jt)
      assert(salted.columns.toSeq == plain.columns.toSeq, jt)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty, jt)
    }

    // the hot key's rows really do scatter over multiple salt buckets
    val spread = left.withColumn("__salt",
        pmod(hash(left.columns.map(col): _*), lit(8)))
      .filter($"bk" === "hot").select("__salt").distinct().count()
    assert(spread > 1, s"hot key should span several buckets, got $spread")
  }

  test("saltedJoin rejects join types that replication would corrupt") {
    val df = Seq(("a", 1)).toDF("bk", "v")
    intercept[IllegalArgumentException] {
      Ops.saltedJoin(df, df, Seq("bk"), 4, "right")
    }
    intercept[IllegalArgumentException] {
      Ops.saltedJoin(df, df, Seq("bk"), 4, "full_outer")
    }
  }

  test("system-alias bridge round-trips custom column names") {
    val std = Seq(("h1", "2024-01-01 00:00:00", "SRC", "9999-01-01 00:00:00"))
      .toDF("hk", "ldts", "rsrc", "ledts")
    val custom = Ops.withSystemAliases(std,
      ldts = "loaddate", rsrc = "record_source", ledts = "load_end_date")
    assert(custom.columns.toSeq ===
      Seq("hk", "loaddate", "record_source", "load_end_date"))
    val back = Ops.toStandardAliases(custom,
      ldts = "loaddate", rsrc = "record_source", ledts = "load_end_date")
    assert(back.columns.toSeq === std.columns.toSeq)
    assert(back.collect() === std.collect())
    // absent columns are ignored, present non-system columns untouched
    val partial = Ops.withSystemAliases(std.drop("ledts"), ldts = "lt")
    assert(partial.columns.toSeq === Seq("hk", "lt", "rsrc"))
    // swapping two system names transits cleanly (no duplicate-name state)
    val swapped = Ops.withSystemAliases(std, ldts = "rsrc", rsrc = "ldts")
    assert(swapped.select("rsrc").as[String].head() === "2024-01-01 00:00:00")
    assert(swapped.select("ldts").as[String].head() === "SRC")
    // a rename onto an unrelated existing column fails loudly
    val e = intercept[IllegalArgumentException] {
      Ops.withSystemAliases(std, ldts = "hk")
    }
    assert(e.getMessage.contains("collides"))
  }
}
