package graft.operators

import java.security.MessageDigest

import graft.SparkSuite

class AnonymizeSpec extends SparkSuite {
  import spark.implicits._

  private val df = Seq((1, "alice"), (2, "bob"), (3, "alice")).toDF("id", "name")

  test("anonymize replaces PII columns with sha256 hex") {
    val expected = MessageDigest.getInstance("SHA-256")
      .digest("alice".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = Anonymize.anonymize(df, Seq("name")).orderBy("id")
      .select("name").as[String].collect()
    assert(out(0) === expected)
    assert(out(0) === out(2))
    assert(out(0) !== out(1))
  }

  test("vault maps each distinct original to its hash") {
    val v = Anonymize.vault(df, "name").collect()
    assert(v.length === 2)
    assert(v.forall(r => r.getString(1).length === 64))
  }

  test("deanonymize round-trips through the vault without a forced broadcast") {
    val anon = Anonymize.anonymize(df, Seq("name"))
    val back = Anonymize.deanonymize(anon, Anonymize.vault(df, "name"), "name")
      .orderBy("id").select("name").as[String].collect()
    assert(back.toSeq === Seq("alice", "bob", "alice"))
  }

  test("AES-GCM encrypt/decrypt round-trip; wrong key fails") {
    val key = Array.tabulate[Byte](32)(_.toByte)
    val plain = "vault-contents-123".getBytes("UTF-8")
    val enc = Anonymize.encryptBytes(plain, key)
    assert(!enc.drop(12).sameElements(plain), "ciphertext must differ from plaintext")
    assert(Anonymize.decryptBytes(enc, key).sameElements(plain))
    val wrong = Array.tabulate[Byte](32)(i => (i + 1).toByte)
    intercept[Exception](Anonymize.decryptBytes(enc, wrong))
    intercept[IllegalArgumentException](Anonymize.encryptBytes(plain, new Array[Byte](5)))
  }

  test("kAnonymity flags quasi-identifier groups below k") {
    import spark.implicits._
    val df = Seq(
      ("US", "A"), ("US", "A"), ("US", "A"),   // group of 3: safe at k=3
      ("US", "B"), ("US", "B"),                // group of 2: at risk
      ("DE", "A"))                             // singleton: at risk
      .toDF("country", "segment")
    val out = Anonymize.kAnonymity(df, Seq("country", "segment"), k = 3).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(("US", "A")) === ((3L, false)))
    assert(out(("US", "B")) === ((2L, true)))
    assert(out(("DE", "A")) === ((1L, true)))
  }

  test("tCloseness: skewed groups flagged, matching groups score 0") {
    // global: x and y 50/50. group "skew" is all-x (TV 0.5); group
    // "match" mirrors the global distribution exactly (TV 0)
    val df = Seq(
      ("skew", "x"), ("skew", "x"),
      ("match", "x"), ("match", "y"), ("match", "x"), ("match", "y"),
      ("half", "y"), ("half", "y")).toDF("grp", "diag")
    val out = Anonymize.tCloseness(df, Seq("grp"), "diag").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("match") === ((4L, 0.0)))
    assert(out("skew") === ((2L, 0.5)))
    assert(out("half") === ((2L, 0.5)))
    // a group missing a sensitive value entirely still pays its mass
    val miss = Seq(("a", "x"), ("a", "y"), ("a", "z"), ("b", "x"))
      .toDF("grp", "diag")
    val tv = Anonymize.tCloseness(miss, Seq("grp"), "diag").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // global: x 1/2, y 1/4, z 1/4; group b = all-x:
    // TV = 0.5*(|1 - 0.5| + 0.25 + 0.25) = 0.5
    assert(tv("b") === 0.5)
    // NULL sensitive values are a CLASS, not droppable: a group
    // mirroring a half-NULL global must score exactly 0
    val withNull = Seq(("g1", Some("x")), ("g1", None),
      ("g2", Some("x")), ("g2", None)).toDF("grp", "diag")
    val nl = Anonymize.tCloseness(withNull, Seq("grp"), "diag").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(nl === Map("g1" -> 0.0, "g2" -> 0.0))
  }
}
