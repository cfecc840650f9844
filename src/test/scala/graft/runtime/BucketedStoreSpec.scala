package graft.runtime

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed-layout contract: joins between tables bucketed on the same key
  * must plan WITHOUT a shuffle — the scale-defining property. */
class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucket join plans with zero Exchange nodes") {
    val wh = Files.createTempDirectory("graft_bucket").toString
    val store = new TableStore(spark, wh)
    // at fixture size Spark prefers a broadcast join (which also avoids the
    // shuffle, but trivially); disable it to expose the bucketed sort-merge
    // path a 100 TB join would take
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val hub = (1 to 100).map(i => (s"hk$i", s"bk$i")).toDF("hk", "bk")
      .withColumn("ldts", to_timestamp(lit("2024-01-01 00:00:00")))
    val sat = (1 to 100).flatMap(i => Seq((s"hk$i", s"v$i-1"), (s"hk$i", s"v$i-2")))
      .toDF("hk", "payload")
      .withColumn("ldts", to_timestamp(lit("2024-01-01 00:00:00")))
    store.overwriteBucketed("b_hub", hub, "hk", 4, "ldts")
    store.overwriteBucketed("b_sat", sat, "hk", 4, "ldts")

    val joined = store.readTable("b_hub").join(store.readTable("b_sat"), "hk")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle; plan was:\n$plan")
    assert(joined.count() == 200)

    // appends preserve the layout
    store.appendBucketed("b_sat", Seq(("hk1", "v1-3")).toDF("hk", "payload")
      .withColumn("ldts", to_timestamp(lit("2024-01-02 00:00:00"))), "hk", 4, "ldts")
    assert(store.readTable("b_sat").count() == 201)
    val plan2 = store.readTable("b_hub").join(store.readTable("b_sat"), "hk")
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("Exchange"))

    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_hub")
      spark.sql("DROP TABLE IF EXISTS b_sat")
      store.drop("b_hub"); store.drop("b_sat")
    }
  }
}
