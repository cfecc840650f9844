package graft.meta

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expr.HashConfig
import graft.loaders._

class MetadataSpec extends SparkSpec {
  implicit val hc: HashConfig = HashConfig()
  import spark.implicits._

  test("YamlLite parses the datavault4dbt metadata subset") {
    val y =
      """# stage metadata
        |ldts: "edwLoadDate"
        |rsrc: '!SAP.Accounts'
        |source_model: source_account
        |include_source_columns: false
        |counts: 42
        |hashed_columns:
        |  hk_account_h:
        |    - account_number
        |    - account_key
        |  hd_account_s:
        |    is_hashdiff: true
        |    columns: [name, balance]
        |prejoined_columns:
        |  - ref_model: nation   # trailing comment
        |    this_column_name: c_nationkey
        |    ref_column_name: n_nationkey
        |    extract_columns:
        |      - n_name
        |inline_map: {a: 1, b: 'x y'}
        |nothing: null
        |""".stripMargin
    val m = YamlLite.parse(y).asInstanceOf[Map[String, Any]]
    assert(m("ldts") == "edwLoadDate")
    assert(m("rsrc") == "!SAP.Accounts")
    assert(m("include_source_columns") == false)
    assert(m("counts") == 42L)
    val hashed = m("hashed_columns").asInstanceOf[Map[String, Any]]
    assert(hashed("hk_account_h") == List("account_number", "account_key"))
    val hd = hashed("hd_account_s").asInstanceOf[Map[String, Any]]
    assert(hd("is_hashdiff") == true && hd("columns") == List("name", "balance"))
    val pj = m("prejoined_columns").asInstanceOf[List[Any]].head.asInstanceOf[Map[String, Any]]
    assert(pj("ref_model") == "nation" && pj("extract_columns") == List("n_name"))
    assert(m("inline_map") == Map("a" -> 1L, "b" -> "x y"))
    assert(m("nothing") == null)
  }

  test("map order is preserved past 4 entries; trailing bare dash is an empty item") {
    val m = YamlLite.parse(
      """a: 1
        |b: 2
        |c: 3
        |d: 4
        |e: 5
        |f: 6
        |items:
        |  - x
        |  -
        |""".stripMargin).asInstanceOf[Map[String, Any]]
    assert(m.keys.toSeq == Seq("a", "b", "c", "d", "e", "f", "items"))
    assert(m("items") == List("x", null))
  }

  test("stage built from YAML metadata equals the directly-configured stage") {
    val customer = Seq((1L, "Alice", 10, 5.0, "AUTO"), (2L, "Bob", 20, 6.0, "BIKE"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val nation = Seq((10, "FRANCE"), (20, "PERU")).toDF("n_nationkey", "n_name")
    val resolve: String => org.apache.spark.sql.DataFrame = {
      case "customer" => customer
      case "nation"   => nation
    }
    val yaml =
      """ldts: '!2024-01-01 00:00:00'
        |rsrc: '!CRM/Customer'
        |source_model: customer
        |enable_ghost_records: false
        |hashed_columns:
        |  hk_customer_h:
        |    - c_custkey
        |  hd_customer_s:
        |    is_hashdiff: true
        |    columns:
        |      - c_name
        |      - c_acctbal
        |derived_columns:
        |  segment_uc: "upper(c_mktsegment)"
        |prejoined_columns:
        |  - ref_model: nation
        |    this_column_name: c_nationkey
        |    ref_column_name: n_nationkey
        |    extract_columns:
        |      - n_name
        |""".stripMargin
    val fromYaml = MetadataBuilders.stage(yaml, resolve)
    val direct = StageLoader.build(customer, StageConfig(
      ldts = "!2024-01-01 00:00:00", rsrc = "!CRM/Customer",
      hashedColumns = Seq(
        HashColumnSpec("hk_customer_h", Seq("c_custkey")),
        HashColumnSpec("hd_customer_s", Seq("c_name", "c_acctbal"), isHashdiff = true)),
      derivedColumns = Seq(DerivedColumn("segment_uc", "upper(c_mktsegment)")),
      prejoins = Seq(Prejoin(nation, Seq(("n_name", "n_name")), Seq(("c_nationkey", "n_nationkey")))),
      enableGhostRecords = false))
    assert(fromYaml.columns.toSeq == direct.columns.toSeq)
    assert(fromYaml.exceptAll(direct).isEmpty && direct.exceptAll(fromYaml).isEmpty)
  }

  test("hub built from YAML metadata loads multi-source with rsrc_static") {
    val src = Seq(("k1", "2024-01-01 00:00:00"), ("k2", "2024-01-02 00:00:00"))
      .toDF("bk", "ldts_s")
      .withColumn("ldts", to_timestamp($"ldts_s")).drop("ldts_s")
      .withColumn("rsrc", lit("SRC/A"))
      .withColumn("hk", graft.expr.Hashing.hashkey(Seq($"bk")))
    val yaml =
      """hashkey: hk
        |business_keys:
        |  - bk
        |source_models:
        |  - name: staged_a
        |    hk_column: hk
        |    bk_columns:
        |      - bk
        |""".stripMargin
    val hub = MetadataBuilders.hub(yaml, Map("staged_a" -> src), target = None)
    assert(hub.count() == 2)
    assert(hub.columns.toSeq == Seq("hk", "bk", "ldts", "rsrc"))
  }
}
