package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.analyze.Tokenizer

class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("scala twin matches column expression on real corpus") {
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select($"doc_id", coalesce($"text", lit("")).as("content"))
    val viaCol = docs.select($"doc_id", Tokenizer.terms($"content").as("terms"))
      .as[(Long, Seq[String])].collect().toMap
    val viaScala = docs.as[(Long, String)].collect()
      .map { case (id, c) => id -> Tokenizer.termsScala(c).toSeq }.toMap
    assert(viaCol.keySet == viaScala.keySet)
    viaCol.foreach { case (id, ts) => assert(ts == viaScala(id), s"doc $id") }
  }

  test("scala twin matches column expression on adversarial strings") {
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr, Gen.const("  "), Gen.const("\n\t"), Gen.const("héllo wörld"),
      Gen.const("a"), Gen.const("0x1F"), Gen.const("__x__"), Gen.const("日本語 text"),
      Gen.asciiPrintableStr)).map(_.mkString(" "))
    val samples = (1 to 200).flatMap(i => gen.sample).distinct
    val viaCol = samples.toDF("content")
      .select(Tokenizer.terms($"content").as("t")).as[Seq[String]].collect()
    samples.zip(viaCol).foreach { case (s, got) =>
      assert(got == Tokenizer.termsScala(s).toSeq, s"input=[$s]")
    }
  }

  test("shingles are 12-bit hex with s: prefix; words lowercase alnum") {
    val ts = Tokenizer.termsScala("Hash JOIN over sort-merge")
    assert(ts.count(_.startsWith("w:")) == 5)
    assert(ts.count(_.startsWith("s:")) == 4)
    assert(ts.filter(_.startsWith("s:")).forall(t => t.length == 5 && t.drop(2).forall("0123456789abcdef".contains(_))))
    assert(ts.contains("s:75f")) // md5("hash join") prefix — fixed golden value
  }

  test("empty / null / separator-only content yields no terms") {
    assert(Tokenizer.termsScala("").isEmpty)
    assert(Tokenizer.termsScala("  \n\t---").isEmpty)
    assert(Tokenizer.termsScala(null).isEmpty)
    val viaCol = Seq("", "  \n\t---").toDF("content")
      .select(Tokenizer.terms($"content").as("t")).as[Seq[String]].collect()
    assert(viaCol.forall(_.isEmpty))
  }
}
