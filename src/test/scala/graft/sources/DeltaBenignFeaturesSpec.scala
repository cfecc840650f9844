package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reader tolerance for READER-IRRELEVANT Delta features (PROTOCOL.md:
  * only readerFeatures gate a read): a table carrying the writer
  * features modern Databricks enables — rowTracking, domainMetadata,
  * clusteringColumns/clusteredTable — plus domainMetadata actions and
  * row-tracking add fields (baseRowId/defaultRowCommitVersion) must
  * read correctly; an UNKNOWN reader feature must still reject. */
class DeltaBenignFeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("rowTracking/domainMetadata/clusteredTable tables read correctly") {
    val t = Files.createTempDirectory("graft_benign").resolve("t").toString
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "s").coalesce(1)
    DeltaWrite.write(df, t)
    // rewrite the log the way a clustered, row-tracked Databricks table
    // carries it: table-features protocol with benign writer features,
    // a domainMetadata action, and row-tracking fields on the add
    val logDir = Paths.get(t, "_delta_log")
    val commit = logDir.resolve(f"${0L}%020d.json")
    val lines = Files.readAllLines(commit)
    val out = new java.util.ArrayList[String]()
    out.add("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      """"readerFeatures":[],"writerFeatures":["rowTracking","domainMetadata",""" +
      """"clustering","clusteredTable","appendOnly","invariants"]}}""")
    out.add("""{"domainMetadata":{"domain":"delta.clustering",""" +
      """"configuration":"{\"clusteringColumns\":[[\"id\"]]}","removed":false}}""")
    lines.forEach { l =>
      if (l.contains("\"add\"")) {
        // graft row-tracking fields onto the add action
        out.add(l.replaceFirst("\\{\"add\":\\{",
          "{\"add\":{\"baseRowId\":0,\"defaultRowCommitVersion\":0,"))
      } else if (!l.contains("\"protocol\"")) out.add(l)
    }
    Files.write(commit, out)
    val snap = DeltaRead.snapshot(t)
    assert(snap.protocol.writerFeatures.contains("rowTracking"))
    assert(DeltaRead.read(spark, t).as[(Long, String)].collect().toSet ==
      (1L to 20L).map(i => (i, s"v$i")).toSet)
    // maintenance still works on such a table (checkpoint re-emits the
    // full feature set)
    DeltaWrite.checkpoint(spark, t)
    assert(DeltaRead.snapshot(t).protocol.writerFeatures
      .contains("domainMetadata"))
  }

  test("an unknown READER feature still rejects loudly") {
    val t = Files.createTempDirectory("graft_benign_rej").resolve("t").toString
    DeltaWrite.write(Seq((1L, "x")).toDF("id", "s"), t)
    val commit = Paths.get(t, "_delta_log").resolve(f"${0L}%020d.json")
    val lines = Files.readAllLines(commit)
    val out = new java.util.ArrayList[String]()
    out.add("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      """"readerFeatures":["futureColumnarCodec"],"writerFeatures":[]}}""")
    lines.forEach(l => if (!l.contains("\"protocol\"")) out.add(l))
    Files.write(commit, out)
    val ex = intercept[IllegalArgumentException] { DeltaRead.snapshot(t) }
    assert(ex.getMessage.contains("futureColumnarCodec"))
  }
}
