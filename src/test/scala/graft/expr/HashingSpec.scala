package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden-vector tests for the hash standardization semantics
  * (reference `hash_standardization.sql:549-612`, see SURVEY §7.5-1).
  * The oracle below re-implements the standardization in plain Scala,
  * independently of the Column-expression implementation.
  */
class HashingSpec extends SparkSpec {
  implicit val hc: HashConfig = HashConfig()

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** plain-Scala re-implementation of databricks__attribute_standardise */
  private def stdOracle(v: Option[String]): String = v match {
    case None => "^^"
    case Some(s) =>
      val t = s.trim
        .replace("\\", "\\\\")
        .replace("\"", "dv4dbt-quote-replacement")
        .replace("^^", "dv4dbt-null-replacement")
        .replace("||", "dv4dbt-concat-replacement")
      "\"" + t + "\""
  }

  private def hashkeyOracle(vals: Seq[Option[String]]): String = {
    val joined = vals.map(stdOracle).mkString("||").toUpperCase
    val stripped = joined.replace("\n", "").replace("\t", "").replace("\u000B", "").replace("\r", "")
    val allNull = vals.map(_ => "^^").mkString("||")
    if (stripped == allNull) "!" + "0" * 32 else md5Hex(stripped)
  }

  private def hashdiffOracle(vals: Seq[Option[String]]): String = {
    val joined = vals.map(stdOracle).mkString("||") // case-sensitive
    val stripped = joined.replace("\n", "").replace("\t", "").replace("\u000B", "").replace("\r", "")
    val allNull = vals.map(_ => "^^").mkString("||")
    if (stripped == allNull) "!" + "0" * 32 else md5Hex(stripped)
  }

  private val vectors: Seq[(Option[String], Option[String])] = Seq(
    (Some("Alice"), Some("Wonderland")),
    (Some("  padded  "), Some("x")),          // trim
    (Some("has||concat"), Some("plain")),     // concat-string collision
    (Some("has\"quote"), Some("p")),          // quote collision
    (Some("null^^ph"), Some("p")),            // null-placeholder collision
    (Some("back\\slash"), Some("p")),         // backslash escaping
    (Some("multi\nline\ttab"), Some("p")),    // whitespace strip
    (Some("MiXeD"), Some("CaSe")),            // case fold
    (None, Some("x")),                        // single null
    (None, None),                             // all null → zero key
    (Some(""), Some("")),                     // empty strings (≠ null!)
    (Some("ü±é"), Some("日本語"))               // non-ascii
  )

  test("hashkey matches the independently computed oracle on all vectors") {
    import spark.implicits._
    val df = vectors.toDF("a", "b")
      .withColumn("hk", Hashing.hashkey(Seq(col("a"), col("b"))))
    val got = df.select("hk").as[String].collect().toSeq
    val want = vectors.map { case (a, b) => hashkeyOracle(Seq(a, b)) }
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"vector $i: ${vectors(i)}")
    }
  }

  test("hashdiff is case-sensitive, hashkey is not") {
    import spark.implicits._
    val df = Seq(("ABC", "abc")).toDF("u", "l")
    val row = df.select(
      Hashing.hashkey(Seq(col("u"))).as("hku"),
      Hashing.hashkey(Seq(col("l"))).as("hkl"),
      Hashing.hashdiff(Seq(col("u"))).as("hdu"),
      Hashing.hashdiff(Seq(col("l"))).as("hdl")).head()
    assert(row.getString(0) == row.getString(1))
    assert(row.getString(2) != row.getString(3))
    val got = df.select(Hashing.hashdiff(Seq(col("u"), col("l")))).head().getString(0)
    assert(got == hashdiffOracle(Seq(Some("ABC"), Some("abc"))))
  }

  test("all-null business keys hash to the zero key") {
    import spark.implicits._
    val df = Seq((Option.empty[String], Option.empty[String])).toDF("a", "b")
    val got = df.select(Hashing.hashkey(Seq(col("a"), col("b")))).head().getString(0)
    assert(got == "!00000000000000000000000000000000")
  }

  test("delimiter-literal values produce distinct hashes from their parts") {
    import spark.implicits._
    // ("a||b", "c") must differ from ("a", "b||c") and from ("a","b","c") etc.
    val h1 = Seq(("a||b", "c")).toDF("x", "y")
      .select(Hashing.hashkey(Seq(col("x"), col("y")))).head().getString(0)
    val h2 = Seq(("a", "b||c")).toDF("x", "y")
      .select(Hashing.hashkey(Seq(col("x"), col("y")))).head().getString(0)
    assert(h1 != h2)
  }

  test("numeric and timestamp columns standardize via string cast") {
    import spark.implicits._
    val df = Seq((42L, 3.5)).toDF("i", "d")
    val got = df.select(Hashing.hashkey(Seq(col("i"), col("d")))).head().getString(0)
    assert(got == hashkeyOracle(Seq(Some("42"), Some("3.5"))))
  }

  test("sha256 variant uses 64-char zero key and sha2") {
    implicit val sha: HashConfig = HashConfig(algorithm = "SHA256")
    import spark.implicits._
    val df = Seq((Option.empty[String], Option("x"))).toDF("a", "b")
    val zero = Seq((Option.empty[String], Option.empty[String])).toDF("a", "b")
      .select(Hashing.hashkey(Seq(col("a"), col("b")))(sha)).head().getString(0)
    assert(zero == "!" + "0" * 64)
  }

  test("H7: boolean hashes as 1/0, nested types as their JSON serialization") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val df = Seq((true, false, Seq("a", "b||c"))).toDF("t", "f", "arr")
    val got = df.select(
      Hashing.hashdiff(Seq(
        Hashing.normalizeInput(col("t"), BooleanType),
        Hashing.normalizeInput(col("f"), BooleanType),
        Hashing.normalizeInput(col("arr"), ArrayType(StringType))))).head().getString(0)
    // oracle: DECODE(bool,true,1,false,0) and JSON text, then standard hashdiff
    assert(got == hashdiffOracle(Seq(Some("1"), Some("0"), Some("""["a","b||c"]"""))))
    // NULL boolean still propagates to the null placeholder
    val gotNull = Seq((Option.empty[java.lang.Boolean], "x")).toDF("t", "p")
      .select(Hashing.hashdiff(Seq(
        Hashing.normalizeInput(col("t"), BooleanType), col("p")))).head().getString(0)
    assert(gotNull == hashdiffOracle(Seq(None, Some("x"))))
  }

  test("BINARY hash_datatype stores digest bytes; zero/error keys are byte constants") {
    implicit val bin: HashConfig = HashConfig(hashDatatype = "BINARY")
    import spark.implicits._
    // digest bytes == the raw MD5 of the same standardized pre-image
    val got = Seq(("Alice", "Wonderland")).toDF("a", "b")
      .select(Hashing.hashkey(Seq(col("a"), col("b")))(bin)).head().getAs[Array[Byte]](0)
    val hexStr = hashkeyOracle(Seq(Some("Alice"), Some("Wonderland")))
    assert(got.map("%02x".format(_)).mkString == hexStr, "bytes == unhex(string digest)")
    assert(got.length == 16)
    // all-null keys → 16 zero bytes, NOT a '!'-prefixed string
    // (hash_default_values.sql:49-52 TO_BINARY('00..'))
    val zero = Seq((Option.empty[String], Option.empty[String])).toDF("a", "b")
      .select(Hashing.hashkey(Seq(col("a"), col("b")))(bin)).head().getAs[Array[Byte]](0)
    assert(zero.toSeq == Array.fill(16)(0x00.toByte).toSeq)
    assert(bin.errorKeyBytes.toSeq == Array.fill(16)(0xff.toByte).toSeq)
    // SHA256 variant: 32 bytes
    val sha = HashConfig(algorithm = "SHA256", hashDatatype = "BINARY")
    val s = Seq(("x", "y")).toDF("a", "b")
      .select(Hashing.hashkey(Seq(col("a"), col("b")))(sha)).head().getAs[Array[Byte]](0)
    assert(s.length == 32)
    // hashdiff honors the datatype too
    val hd = Seq(("p", "q")).toDF("a", "b")
      .select(Hashing.hashdiff(Seq(col("a"), col("b")))(bin)).head().getAs[Array[Byte]](0)
    assert(hd.map("%02x".format(_)).mkString == hashdiffOracle(Seq(Some("p"), Some("q"))))
  }

  test("multi-active hashdiff is order-insensitive in input, ordered by ma key") {
    import spark.implicits._
    // same set {home, work} in different input order must give same hashdiff
    val b1 = Seq(("k1", "2024-01-01", "home", "111"), ("k1", "2024-01-01", "work", "222"))
      .toDF("hk", "ldts", "ma", "phone")
    val b2 = Seq(("k1", "2024-01-01", "work", "222"), ("k1", "2024-01-01", "home", "111"))
      .toDF("hk", "ldts", "ma", "phone")
    def hd(df: org.apache.spark.sql.DataFrame): String =
      df.groupBy("hk", "ldts")
        .agg(Hashing.maHashdiff(Seq(col("phone")), Seq(col("ma"))).as("hd"))
        .select("hd").head().getString(0)
    assert(hd(b1) == hd(b2))
    // oracle: LISTAGG of standardized rows ordered by ma key
    val rows = Seq(("home", "111"), ("work", "222")).sortBy(_._1)
    val listagg = rows.map { case (_, p) => stdOracle(Some(p)) }.mkString(",")
    assert(hd(b1) == md5Hex(listagg))
  }
}
