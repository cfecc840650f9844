package graft.runtime

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cdc.diff contract: op classification, NULL-safe value compare,
  * unchanged-row suppression, and multi-column keys. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies I/U/D, drops unchanged, and is NULL-safe") {
    val old = Seq(
      (1L, Some("a"), 10),  // unchanged
      (2L, Some("b"), 20),  // value update
      (3L, None: Option[String], 30), // NULL → value update
      (4L, Some("d"), 40)   // deleted
    ).toDF("k", "v", "n")
    val neu = Seq(
      (1L, Some("a"), 10),
      (2L, Some("B"), 20),
      (3L, Some("c"), 30),
      (5L, Some("e"), 50)   // inserted
    ).toDF("k", "v", "n")
    val got = Cdc.diff(old, neu, Seq("k"))
      .select("op", "k", "old_v", "new_v")
      .as[(String, Long, Option[String], Option[String])]
      .collect().sortBy(_._2)
    assert(got.toSeq == Seq(
      ("U", 2L, Some("b"), Some("B")),
      ("U", 3L, None, Some("c")),
      ("D", 4L, Some("d"), None),
      ("I", 5L, None, Some("e"))))
  }

  test("multi-column key and value→NULL transitions") {
    val old = Seq(("a", 1, Some(1.0)), ("a", 2, Some(2.0))).toDF("k1", "k2", "x")
    val neu = Seq(("a", 1, None: Option[Double]), ("a", 2, Some(2.0))).toDF("k1", "k2", "x")
    val got = Cdc.diff(old, neu, Seq("k1", "k2")).collect()
    assert(got.length == 1)
    assert(got.head.getString(0) == "U" && got.head.getInt(2) == 1)
  }

  test("patch law: apply(old, diff(old, new)) == new on random tables") {
    val rnd = new scala.util.Random(42)
    (0 until 5).foreach { _ =>
      val oldRows = (1 to 40).filter(_ => rnd.nextBoolean())
        .map(k => (k.toLong, rnd.nextInt(3).toString, rnd.nextInt(5)))
      val newRows = (1 to 40).filter(_ => rnd.nextBoolean())
        .map(k => (k.toLong, rnd.nextInt(3).toString, rnd.nextInt(5)))
      val old = oldRows.toDF("k", "v", "n")
      val neu = newRows.toDF("k", "v", "n")
      val rebuilt = Cdc.apply(old, Cdc.diff(old, neu, Seq("k")), Seq("k"))
        .as[(Long, String, Int)].collect().toSet
      assert(rebuilt == newRows.toSet,
        s"patch law violated: rebuilt=$rebuilt want=${newRows.toSet}")
    }
  }

  test("mismatched schemas are rejected") {
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "x", 2)).toDF("k", "v", "extra")
    assertThrows[IllegalArgumentException](Cdc.diff(a, b, Seq("k")))
  }

  test("empty value-column set: only I and D are emitted") {
    val a = Seq(Tuple1(1L), Tuple1(2L)).toDF("k")
    val b = Seq(Tuple1(2L), Tuple1(3L)).toDF("k")
    val got = Cdc.diff(a, b, Seq("k")).orderBy("k").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("D", 1L), ("I", 3L)))
  }
}
