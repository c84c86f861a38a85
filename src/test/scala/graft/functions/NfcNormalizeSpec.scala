package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** All non-ASCII content is spelled as \\u escapes built from explicit
  * codepoints: precomposed and decomposed forms of the same text render
  * identically, so literal accents in test source would be unreadable
  * as expectations (and editor/normalization-sensitive).
  */
class NfcNormalizeSpec extends AnyFunSuite with SparkSpec {
  import NfcNormalize.nfc_normalize

  private def run(inputs: String*): Seq[String] = {
    import spark.implicits._
    inputs.toDF("s").select(nfc_normalize(col("s"))).collect()
      .map(_.getString(0)).toSeq
  }

  test("composes decomposed sequences to precomposed codepoints") {
    // e+U+0301 -> U+00E9, a+U+0308 -> U+00E4, o+U+0302 -> U+00F4
    assert(run("\u0065\u0301", "\u0061\u0308", "\u006F\u0302") ===
      Seq("\u00E9", "\u00E4", "\u00F4"))
  }

  test("identity on ASCII and on already-NFC text; idempotent") {
    val ascii = "the quick brown fox 123"
    val nfcForm = "caf\u00E9 \u00E4rger"
    assert(run(ascii, nfcForm) === Seq(ascii, nfcForm))
    // the decomposed spelling of the same text normalizes to nfcForm,
    // and normalizing again is the identity
    val once = run("caf\u0065\u0301 \u0061\u0308rger")
    assert(once === Seq(nfcForm))
    assert(run(once.head) === once)
  }

  test("matches java.text.Normalizer on mixed text, null passes through") {
    import spark.implicits._
    // A+ring (precomposable), v+grave (NO precomposed form exists -> the
    // combining mark must survive), o+diaeresis mid-word, empty, ASCII
    val mixed = Seq("\u0041\u030Av\u0300 fl\u006F\u0308de", "", "plain")
    val got = run(mixed: _*)
    val want = mixed.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(got === want)
    val withNull = Seq[String](null).toDF("s")
      .select(nfc_normalize(col("s"))).collect()
    assert(withNull.head.isNullAt(0))
  }

  test("length shrinks by exactly the number of combining marks composed") {
    import spark.implicits._
    val df = Seq("x\u0065\u0301x \u0061\u0308 \u006F\u0302").toDF("s")
      .select(length(col("s")).as("raw"),
        length(nfc_normalize(col("s"))).as("nfc"))
    val r = df.collect().head
    assert(r.getInt(0) - r.getInt(1) === 3)
  }
}
