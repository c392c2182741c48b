package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  def emb = graft.runtime.Tables.load(spark, sf, "embeddings")

  test("cosine matches hand computation") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 0.0, 1.0), Seq(1.0, 1.0, 0.0))).toDF("a", "b")
    val c = df.select(VectorFunctions.cosine(F.col("a"), F.col("b"))).head().getDouble(0)
    assert(math.abs(c - 0.5) < 1e-12) // dot=1, norms=sqrt(2) each
  }

  test("cosineTopK excludes the query, returns k sorted results in [-1,1]") {
    val top = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10).collect()
    assert(top.length == 10)
    assert(!top.exists(_.getAs[Long]("neighbor_id") == 0L))
    val sims = top.map(_.getAs[Double]("cos_sim"))
    assert(sims.sameElements(sims.sorted.reverse))
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("RP-LSH finds near-dup pairs with high recall on clustered vectors") {
    import spark.implicits._
    // 40 clusters × 5 members: members are the base + small noise, so
    // intra-cluster cosines are > 0.95 and inter-cluster ~0
    val rnd = new scala.util.Random(7L)
    val dim = 32
    val rows = (0 until 40).flatMap { c =>
      val base = Array.fill(dim)(rnd.nextGaussian())
      (0 until 5).map { m =>
        val v = base.zipWithIndex.map { case (x, _) => x + rnd.nextGaussian() * 0.05 }
        (c * 5L + m, v)
      }
    }
    val df = rows.toDF("vec_id", "embedding")
    val brute = Similarity.cosinePairs(df, "vec_id", "embedding", 0.9)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.rpLshNearDupPairs(df, "vec_id", "embedding", 0.9, dim)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    assert(lsh.subsetOf(brute), "LSH must never emit a below-threshold pair (exact verify)")
    val recall = lsh.size.toDouble / brute.size
    info(s"RP-LSH recall = $recall over ${brute.size} true pairs")
    assert(recall >= 0.85, s"recall collapsed: $recall")
  }

  test("ivfTopK returns correct cosine values (a subset of the corpus scan)") {
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 500).collect()
      .map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Double]("cos_sim")).toMap
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10).collect()
    assert(ivf.length == 10)
    ivf.foreach { r =>
      val id = r.getAs[Long]("neighbor_id")
      assert(brute(id) == r.getAs[Double]("cos_sim"), s"wrong cosine for $id")
    }
    // probing 4/16 cells must find a meaningful share of the true top-10
    val trueTop = brute.toSeq.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    val recall = ivf.map(_.getAs[Long]("neighbor_id")).count(trueTop) / 10.0
    info(s"IVF recall@10 = $recall")
    assert(recall >= 0.2, s"recall collapsed: $recall")
  }
}
