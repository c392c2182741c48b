package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  lazy val corpus = Multimodal.syntheticCorpus(spark, 200).cache()

  test("media schema carries binary content + typed metadata") {
    val sch = corpus.schema
    assert(sch("content").dataType.typeName == "binary")
    assert(sch("duration_ms").dataType.typeName == "long")
    assert(corpus.count() == 200)
  }

  test("batch decode is deterministic and preserves ids 1:1") {
    val f1 = Multimodal.decodeAll(corpus).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeAll(corpus).collect().sortBy(_.media_id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1.length == 200)
    assert(f1.forall(_.feature.length == 16))
    assert(f1.forall(f => f.mean_byte >= 0 && f.mean_byte <= 255))
  }

  test("byte-budget repartitioning tracks blob volume, not row count") {
    val re = Multimodal.repartitionByBytes(corpus, targetBytesPerPartition = 64 * 1024)
    val parts = re.rdd.getNumPartitions
    assert(parts > 1, s"expected multiple partitions, got $parts")
    assert(re.count() == 200)
  }

  test("frame sampling explodes videos only, at the sample cadence") {
    val frames = Multimodal.sampleFrames(corpus.toDF(), sampleEveryMs = 1000)
    val videos = corpus.filter(F.col("kind") === "video").collect()
    val expected = videos.map(v => 1 + (v.duration_ms - 1) / 1000).sum
    assert(frames.count() == expected)
    assert(frames.select("media_id").distinct().count() == videos.length)
  }
}
