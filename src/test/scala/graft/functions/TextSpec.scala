package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TextSpec extends SparkSuite {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    Seq(text).toDF("t").select(c(col("t")).as("r")).head().get(0)

  test("tokens and tokenCount") {
    assert(one("  a  b\tc ", Text.tokenCount(_)) === 3)
    assert(one("single", Text.tokenCount(_)) === 1)
  }

  test("bpeTokenCount: word pieces plus standalone symbols") {
    assert(one("don't stop!", Text.bpeTokenCount(_)) === 5) // don ' t stop !
    assert(one("hello world", Text.bpeTokenCount(_)) === 2)
    assert(one("a,b,c", Text.bpeTokenCount(_)) === 5)
  }

  test("rollingHash: order-sensitive, deterministic polynomial hash") {
    val ab = one("ab", Text.rollingHash(_))
    val ba = one("ba", Text.rollingHash(_))
    assert(ab === ('a'.toLong * 31 + 'b'.toLong) % 2147483647L)
    assert(ab !== ba)
    assert(one("", Text.rollingHash(_)) === 0L)
  }

  test("normalized collapses case and whitespace") {
    assert(one("  Hello   WORLD ", Text.normalized(_)) === "hello world")
  }

  test("fingerprint equal iff normalized text equal") {
    val fp = Seq("Hello  World", "hello world", "other").toDF("t")
      .select(Text.fingerprint(col("t")).as("f")).as[String].collect()
    assert(fp(0) === fp(1))
    assert(fp(0) !== fp(2))
  }

  test("character class counts") {
    assert(one("ab 12!", Text.nonSpaceChars(_)) === 5)
    assert(one("ab 12!", Text.digitCount(_)) === 2)
    assert(one("ab 12!?.", Text.punctCount(_)) === 3)
  }

  test("ratios") {
    assert(one("abcd 1234", Text.digitRatio(_)) === 4.0 / 9)
    assert(one("ab cd", Text.avgTokenLen(_)) === 2.0)
  }

  test("langId picks the language with most stopword hits") {
    val cases = Seq(
      "the cat and the dog is in the house" -> "en",
      "der hund und die katze ist nicht hier" -> "de",
      "el perro y los gatos es una familia que come" -> "es",
      "le chien et les chats dans un jardin est grand" -> "fr",
      "中文文本内容" -> "zh")
    val out = cases.map(_._1).toDF("t").select(Text.langId(col("t")).as("l"))
      .as[String].collect()
    assert(out.toSeq === cases.map(_._2))
  }

  test("langId returns unknown when no stopword matches (was: confidently 'de')") {
    assert(one("12345 67890 !!!", Text.langId(_)) === "unknown")
    assert(one("zzz qqq xxx", Text.langId(_)) === "unknown")
  }

  test("isQuality gates on token count, token length, digit and punct ratios") {
    assert(one("a good clean sentence with enough words here", Text.isQuality(_)) === true)
    assert(one("too short", Text.isQuality(_)) === false)
    assert(one("1234 5678 9012 3456 7890 1111", Text.isQuality(_)) === false) // digits
    assert(one("!!! ??? ... ;;; ::: @@@", Text.isQuality(_)) === false) // punct
    assert(one("aaaaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbbbb cccccccccccccccccccc dddddddddddddddddddd eeeeeeeeeeeeeeeeeeee",
      Text.isQuality(_)) === false) // avg token length
  }

  test("stopwordRatio: fluent prose scores high, keyword soup scores zero") {
    val fluent = one("the cat sat on the mat and the dog is in a box",
      Text.stopwordRatio(_)).asInstanceOf[Double]
    assert(fluent > 0.3, s"fluent prose should be stopword-dense, got $fluent")
    assert(one("buy cheap widgets best widgets cheap buy",
      Text.stopwordRatio(_)).asInstanceOf[Double] === 0.0)
  }

  test("langId on null text is null (was: the fold's last branch, 'zh')") {
    val r = Seq(Option.empty[String]).toDF("t")
      .select(Text.langId(col("t")).as("l")).head()
    assert(r.isNullAt(0))
  }

  test("character classes partition the text; replacement chars flag mojibake") {
    val in = "ab 1,2�" // 2 alpha, 2 digits, 1 space, 2 punct (incl the U+FFFD)
    val r = Seq(in).toDF("t").select(
      Text.alphaCount(col("t")).as("a"), Text.digitCount(col("t")).as("d"),
      Text.whitespaceCount(col("t")).as("s"), Text.punctCount(col("t")).as("p"),
      Text.replacementCharCount(col("t")).as("m")).head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      === ((2, 2, 1, 2, 1)))
    assert(r.getInt(0) + r.getInt(1) + r.getInt(2) + r.getInt(3) === in.length,
      "alpha + digit + whitespace + punct must partition every character")
    val clean = "perfectly ordinary ascii text"
    assert(Seq(clean).toDF("t").select(Text.replacementCharCount(col("t")))
      .head().getInt(0) === 0)
  }

  test("fleschScore: hand value; short sentences read easier than run-ons") {
    def f(t: String): Double =
      Seq(t).toDF("t").select(Text.fleschScore(col("t"))).head().getDouble(0)
    // "the cat sat." -> words 3, sentences 1, vowel groups e/a/a = 3
    // flesch = 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert(f("the cat sat.") === BigDecimal(206.835 - 1.015 * 3 - 84.6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // same words as one run-on vs many sentences: run-on scores lower
    val words = Seq.fill(20)("testing word here").mkString(" ")
    assert(f(words + ".") < f(words.split(" ").grouped(4).map(_.mkString(" "))
      .mkString(". ") + "."))
    // sentence floor: no terminal punctuation still scores (floored at 1)
    assert(Seq("no punctuation at all").toDF("t")
      .select(Text.sentenceCount(col("t"))).head().getLong(0) === 1L)
  }
}
