package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.CurationPipeline

class CurationPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("the composed corpus pipeline is monotone, deterministic, and shards cleanly") {
    val out = TestFixtures.tmpDir("curated").resolve("shards").toString
    val counts = CurationPipeline.run(spark, sf, out).stages.toMap

    // every filtering stage can only shrink the corpus
    val order = Seq("corpus", "exact_dedup", "near_dedup", "decontaminated",
      "quality_lang", "repetition", "balanced", "packed")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(counts(b) <= counts(a), s"$b (${counts(b)}) grew past $a (${counts(a)})")
    }
    assert(counts("packed") == counts("balanced"), "packing must not drop rows")
    assert(counts("packed") > 0)

    // shard layout: every row lands in a shard dir, packing metadata intact
    val shards = spark.read.parquet(out)
    assert(shards.columns.toSet.contains("seq_id") && shards.columns.toSet.contains("shard"))
    assert(shards.select("shard").distinct().count() > 1)
    assert(shards.filter(F.col("start_offset") < 0).isEmpty)

    // a second run reproduces identical stage counts (deterministic ops only)
    val out2 = TestFixtures.tmpDir("curated2").resolve("shards").toString
    assert(CurationPipeline.run(spark, sf, out2).stages.toMap == counts)
  }
}
