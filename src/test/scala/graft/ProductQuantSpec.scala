package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ProductQuant, Similarity}

/** Product quantization: code validity, deterministic training, ADC +
  * re-rank recall, and the planted-duplicate contract (the dedup-gate
  * property the compression must never lose).
  */
class ProductQuantSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  private def clustered(nClusters: Int, perCluster: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until nClusters).flatMap { c =>
      val base = Array.fill(dim)(rnd.nextGaussian())
      (0 until perCluster).map { m =>
        (c * perCluster.toLong + m,
          base.map(x => x + rnd.nextGaussian() * 0.05).toSeq)
      }
    }
  }

  test("PQ codes are valid, 32x narrower than float32, and training is deterministic") {
    import spark.implicits._
    val df = clustered(30, 5, 64, 11L).toDF("vec_id", "embedding")
    val cb = ProductQuant.train(df, "vec_id", "embedding", m = 8, k = 16)
    assert(cb.subDim == 8)
    val codes = ProductQuant.encode(df, "vec_id", "embedding", cb)
    val rows = codes.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getSeq[Byte](1).toSeq)
    assert(rows.length == 150)
    rows.foreach { case (id, cs) =>
      assert(cs.length == 8, s"vec $id has ${cs.length} codes")
      assert(cs.forall(c => c >= 0 && c < 16), s"vec $id codes out of range: $cs")
    }
    // m bytes per vector vs 4·D float32 bytes: 8 vs 256 = 32×
    assert(4 * 64 / cb.m == 32)
    // same data, fresh train → identical codebooks (hash-ordered sample,
    // first-k-distinct init, no RNG anywhere)
    val cb2 = ProductQuant.train(df, "vec_id", "embedding", m = 8, k = 16)
    assert(cb.centroids.flatten.flatten.toSeq == cb2.centroids.flatten.flatten.toSeq)
  }

  test("ADC + exact re-rank reaches high recall vs brute force; planted duplicate always found") {
    import spark.implicits._
    val data = clustered(40, 5, 64, 23L)
    val df = data.toDF("vec_id", "embedding")
    val cb = ProductQuant.train(df, "vec_id", "embedding", m = 8, k = 16)
    val codes = ProductQuant.encode(df, "vec_id", "embedding", cb).cache()

    val rnd = new scala.util.Random(99L)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val corpus = data.map { case (id, v) => (id, v.toArray) }
    val queries = (0 until 10).map(_ =>
      corpus(rnd.nextInt(corpus.size))._2.map(x => x + rnd.nextGaussian() * 0.02))
    val recalls: Seq[Double] = queries.map { q =>
      val exact = corpus.map { case (id, v) => (id, cos(q, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      val pq = ProductQuant.topK(codes, df, "vec_id", "embedding", q, cb, 10)
        .collect().map(_.getAs[Long]("neighbor_id")).toSet
      exact.intersect(pq).size.toDouble / exact.size
    }
    val recall = recalls.sum / recalls.size
    info(s"PQ recall@10 over 10 queries = $recall")
    assert(recall >= 0.9, s"PQ+re-rank recall collapsed: $recall")

    // the dedup-gate contract: a vector nearly identical to a corpus
    // vector must surface at rank 1 with its EXACT cosine (the re-rank
    // restores exactness for anything the ADC scan admits, and a
    // near-duplicate's ADC score is near-maximal by construction)
    val target = data(137)._2.toArray
    val top = ProductQuant.topK(codes, df, "vec_id", "embedding",
      target.map(_ * 1.0001), cb, 5).collect()
    assert(top.head.getAs[Long]("neighbor_id") == data(137)._1,
      s"planted duplicate not at rank 1: ${top.toSeq}")
    assert(top.head.getAs[Double]("cos_sim") >= 0.9999)
    codes.unpersist()
  }

  test("guards: k beyond signed-byte range rejected; wrong-dim and wrong-arity rows fail loudly") {
    import spark.implicits._
    val df = clustered(10, 5, 64, 41L).toDF("vec_id", "embedding")
    // codes persist as signed bytes — k=200 would wrap negative
    val boom = intercept[IllegalArgumentException] {
      ProductQuant.train(df, "vec_id", "embedding", m = 8, k = 200)
    }
    assert(boom.getMessage.contains("128"))
    val cb = ProductQuant.train(df, "vec_id", "embedding", m = 8, k = 16)
    // a 32-dim row in a 64-dim codebook must not silently truncate
    val shortRow = Seq((999L, Seq.fill(32)(1.0))).toDF("vec_id", "embedding")
    val encBoom = intercept[Exception] {
      ProductQuant.encode(shortRow, "vec_id", "embedding", cb).collect()
    }
    assert(encBoom.getMessage.contains("dim"), encBoom.getMessage)
    // a codes row with the wrong arity must not silently drop out of ADC
    val badCodes = Seq((7L, Seq[Byte](1, 2, 3))).toDF("vec_id", "pq_codes")
    val adcBoom = intercept[Exception] {
      ProductQuant.topK(badCodes, df, "vec_id", "embedding",
        Array.fill(64)(0.1), cb, 5).collect()
    }
    assert(adcBoom.getMessage.contains("arity"), adcBoom.getMessage)
  }

  test("the ADC scan reads only the byte codes — the float vectors stay column-pruned out") {
    import spark.implicits._
    val work = TestFixtures.tmpDir("pq-prune")
    val df = clustered(20, 5, 64, 31L).toDF("vec_id", "embedding")
    val cb = ProductQuant.train(df, "vec_id", "embedding", m = 8, k = 16)
    // persist codes and vectors side by side, as an index layout would
    ProductQuant.encode(df, "vec_id", "embedding", cb)
      .write.parquet(work.resolve("codes").toString)
    df.write.parquet(work.resolve("vectors").toString)
    val codes = spark.read.parquet(work.resolve("codes").toString)
    val vectors = spark.read.parquet(work.resolve("vectors").toString)
    val q = clustered(1, 1, 64, 37L).head._2.toArray
    val plan = ProductQuant.topK(codes, vectors, "vec_id", "embedding", q, cb, 5)
      .queryExecution.executedPlan.toString
    // the codes-side scan must not read any embedding column
    val codeScan = plan.linesIterator.filter(_.contains("codes")).mkString("\n")
    assert(codeScan.contains("pq_codes"), s"codes scan missing:\n$plan")
    assert(!codeScan.contains("embedding"),
      s"ADC scan dragged the float vectors along:\n$codeScan")
  }
}
