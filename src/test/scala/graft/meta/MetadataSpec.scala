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

  /** shared staged fixture for the entity-builder equivalence tests */
  private def staged: org.apache.spark.sql.DataFrame = Seq(
    ("k1", "o1", "A", "2024-01-01 00:00:00"),
    ("k1", "o2", "B", "2024-01-01 00:00:00"),
    ("k2", "o3", "C", "2024-01-02 00:00:00"))
    .toDF("bk", "ok", "payload", "ldts_s")
    .withColumn("ldts", to_timestamp($"ldts_s")).drop("ldts_s")
    .withColumn("rsrc", lit("SRC/A"))
    .withColumn("hk_a", graft.expr.Hashing.hashkey(Seq($"bk")))
    .withColumn("hk_b", graft.expr.Hashing.hashkey(Seq($"ok")))
    .withColumn("hk_l", graft.expr.Hashing.hashkey(Seq($"bk", $"ok")))
    .withColumn("hd", graft.expr.Hashing.hashdiff(Seq($"payload")))

  private def sameFrame(a: org.apache.spark.sql.DataFrame,
                        b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.columns.toSeq == b.columns.toSeq,
      s"${a.columns.toSeq} vs ${b.columns.toSeq}")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("link/nh_link built from YAML equal the direct loaders") {
    val resolve: String => org.apache.spark.sql.DataFrame = Map("staged" -> staged)
    sameFrame(
      MetadataBuilders.link(
        """link_hashkey: hk_l
          |foreign_hashkeys: [hk_a, hk_b]
          |source_models: staged
          |""".stripMargin, resolve, None),
      LinkLoader.records(Seq(EntitySource(staged, Some("hk_l"), Seq("hk_a", "hk_b"))),
        "hk_l", Seq("hk_a", "hk_b"), None))
    sameFrame(
      MetadataBuilders.nhLink(
        """link_hashkey: hk_l
          |foreign_hashkeys: [hk_a, hk_b]
          |payload: [payload]
          |union_strategy: distinct
          |source_models:
          |  staged:
          |    fk_columns: [hk_a, hk_b]
          |""".stripMargin, resolve, None),
      NhLinkLoader.records(Seq(EntitySource(staged, Some("hk_l"), Seq("hk_a", "hk_b"))),
        "hk_l", Seq("hk_a", "hk_b"), Seq("payload"), None, unionDistinct = true))
  }

  test("sat_v0/sat_v1/ma_sat/nh_sat built from YAML equal the direct loaders") {
    val resolve0: String => org.apache.spark.sql.DataFrame = Map("staged" -> staged)
    val v0yaml =
      """source_model: staged
        |parent_hashkey: hk_a
        |src_hashdiff: hd
        |src_payload: [payload]
        |""".stripMargin
    val v0 = MetadataBuilders.satV0(v0yaml, resolve0, None)
    sameFrame(v0, SatV0Loader.records(staged, Seq("hk_a"), Some("hd"), Seq("payload"), None))
    val resolve: String => org.apache.spark.sql.DataFrame =
      Map("staged" -> staged, "v0" -> v0)
    sameFrame(
      MetadataBuilders.satV1(
        """sat_v0: v0
          |hashkey: hk_a
          |hashdiff: hd
          |add_is_current_flag: true
          |""".stripMargin, resolve),
      SatV1Loader.build(v0, "hk_a", Some("hd"), addIsCurrentFlag = true))
    val maGrouped = staged.groupBy($"hk_a", $"ldts")
      .agg(graft.expr.Hashing.maHashdiff(Seq($"payload"), Seq($"ok")).as("hd_ma"))
    val maStaged = staged.join(maGrouped, Seq("hk_a", "ldts"))
    val resolveMa: String => org.apache.spark.sql.DataFrame = Map("ma" -> maStaged)
    sameFrame(
      MetadataBuilders.maSatV0(
        """source_model: ma
          |parent_hashkey: hk_a
          |src_hashdiff: hd_ma
          |src_ma_key: [ok]
          |src_payload: [payload]
          |""".stripMargin, resolveMa, None),
      MaSatV0Loader.records(maStaged, "hk_a", "hd_ma", Seq("ok"), Seq("payload"), None))
    sameFrame(
      MetadataBuilders.nhSat(
        """source_model: staged
          |parent_hashkey: hk_a
          |src_payload: [payload]
          |""".stripMargin, resolve0, None),
      NhSatLoader.records(staged, "hk_a", Seq("payload"), None))
  }

  test("eff_sat/rec_track built from YAML equal the direct loaders") {
    val resolve: String => org.apache.spark.sql.DataFrame = Map("staged" -> staged)
    sameFrame(
      MetadataBuilders.effSatV0(
        """source_model: staged
          |tracked_hashkey: hk_a
          |additional_columns: [payload]
          |""".stripMargin, resolve, None),
      EffSatLoader.records(staged, "hk_a", None, additionalColumns = Seq("payload")))
    sameFrame(
      MetadataBuilders.recTrackSat(
        """tracked_hashkey: hk_t
          |source_models:
          |  staged:
          |    hk_column: hk_a
          |    rsrc_static: 'SRC/%'
          |""".stripMargin, resolve, None),
      RecTrackSatLoader.records(Seq((staged, "hk_a", "staged", Seq("SRC/%"))),
        "hk_t", None))
  }

  test("control_snap_v1 YAML: list log_logic yields one trigger column each") {
    val v0 = ControlSnapV0Loader.build(spark, "2024-01-01", "00:00:00", Some("2024-03-31"))
    val resolve: String => org.apache.spark.sql.DataFrame = Map("v0" -> v0)
    val v1 = MetadataBuilders.controlSnapV1(
      """control_snap_v0: v0
        |log_logic:
        |  - is_active_fine:
        |      daily:
        |        duration: 30
        |        unit: DAY
        |  - is_active_coarse:
        |      monthly:
        |        forever: TRUE
        |""".stripMargin, resolve, referenceTs = Some("2024-03-31 00:00:00"))
    assert(v1.columns.contains("is_active_fine") && v1.columns.contains("is_active_coarse"))
    // coarse = beginning-of-month forever → exactly Jan/Feb/Mar 1st
    assert(v1.filter($"is_active_coarse").count() == 3)
    // fine = 30 rolling days up to Mar 31
    assert(v1.filter($"is_active_fine").count() == 31)
    // exactly one is_latest row
    assert(v1.filter($"is_latest").select("sdts").as[java.sql.Timestamp].head().toString
      == "2024-03-31 00:00:00.0")
  }

  test("tests: dbt schema.yml generic tests run as a constraint report") {
    val hub = Seq(("h1", 1), ("h2", 2), ("h2", 3)).toDF("hk", "bk") // dup h2
    val sat = Seq(("h1", "a"), (null, "b"), ("orphan", "c"), ("h1", "a2"))
      .toDF("hk", "payload")
    val resolve: String => org.apache.spark.sql.DataFrame = {
      case "customer_hub" => hub
      case "customer_sat" => sat
    }
    val report = MetadataBuilders.tests(
      """models:
        |  - name: customer_hub
        |    columns:
        |      - name: hk
        |        tests:
        |          - not_null
        |          - unique
        |  - name: customer_sat
        |    columns:
        |      - name: hk
        |        tests:
        |          - not_null
        |          - relationships:
        |              to: ref('customer_hub')
        |              field: hk
        |    tests:
        |      - unique:
        |          columns: [hk, payload]
        |""".stripMargin, resolve)
      .as[(String, Long)].collect().toMap
    assert(report == Map(
      "customer_hub.hk_not_null" -> 0L,
      "customer_hub.hk_unique" -> 1L, // one duplicated VALUE (dbt semantics)
      "customer_sat.hk_not_null" -> 1L,
      "customer_sat.hk_relationships" -> 1L,
      "customer_sat.hk_payload_unique" -> 0L))
  }

  test("tests: unsupported shapes and empty schemas fail loudly") {
    val df = Seq(("a", 1)).toDF("hk", "v")
    val resolve: String => org.apache.spark.sql.DataFrame = _ => df
    // an unknown column test must not silently pass
    val e1 = intercept[IllegalArgumentException] {
      MetadataBuilders.tests(
        """models:
          |  - name: m
          |    columns:
          |      - name: hk
          |        tests:
          |          - accepted_values:
          |              values: [a, b]
          |""".stripMargin, resolve)
    }
    assert(e1.getMessage.contains("unsupported column test"))
    // a schema declaring no tests is a configuration error, not a no-op
    val e2 = intercept[IllegalArgumentException] {
      MetadataBuilders.tests("models:\n  - name: m\n", resolve)
    }
    assert(e2.getMessage.contains("no tests"))
  }
}
