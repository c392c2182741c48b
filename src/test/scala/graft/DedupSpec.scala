package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  def docs = graft.runtime.Tables.load(spark, sf, "documents")

  test("jaccard pairs are ordered, bounded, and deduplicated") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.3).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.3 && j <= 1.0)
    }
    val keys = pairs.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    assert(keys.distinct.length == keys.length)
  }

  test("minhash LSH recall equals brute force at J>=0.6") {
    val brute = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDupPairs(docs, "doc_id", "text", 3, 0.6)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute, s"LSH missed ${brute -- lsh}, extra ${lsh -- brute}")
  }

  test("simhash: identical bags collide, disjoint vocabularies do not") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact dup
      (3L, "zeta eta theta iota kappa")       // disjoint
    ).toDF("doc_id", "text")
    val sigs = Dedup.simhash64(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    val pairs = Dedup.simhashNearDupPairs(df, "doc_id", "text", 0).collect()
    assert(pairs.exists(r => r.getAs[Long]("a_id") == 1L && r.getAs[Long]("b_id") == 2L))
  }

  test("rolling hash is order-sensitive; content fingerprint is not") {
    import spark.implicits._
    val df = Seq(("a b c d"), ("d c b a")).toDF("text")
      .select(
        TextFunctions.rollingHash(F.col("text")).as("rh"),
        TextFunctions.contentFingerprint(F.col("text")).as("fp"))
    val rows = df.collect()
    assert(rows(0).getAs[Long]("rh") != rows(1).getAs[Long]("rh"))
    assert(rows(0).getAs[String]("fp") == rows(1).getAs[String]("fp"))
  }

  test("exact duplicate groups keep the min id deterministically") {
    import spark.implicits._
    val df = Seq((5L, "x y z"), (9L, "x y z"), (3L, "p q r")).toDF("doc_id", "text")
    val groups = Dedup.exactDuplicateGroups(df, "doc_id", F.md5(F.col("text"))).collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("keep_id") == 5L)
    assert(groups(0).getAs[Long]("n_members") == 2L)
  }

  test("language id picks marker-dense language and falls back to und") {
    import spark.implicits._
    val df = Seq(
      ("the cat is in the hat and a dog"),
      ("el perro y la casa es los gatos"),
      ("xyzzy plugh quux")
    ).toDF("text").select(TextFunctions.langId(F.col("text")).as("lang"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "es", "und"))
  }
}
