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

  test("the chunking stage bounds every packed row to the context budget, losslessly") {
    import graft.functions.TextFunctions
    val outPlain = TestFixtures.tmpDir("curated-plain").resolve("shards").toString
    val outChunk = TestFixtures.tmpDir("curated-chunk").resolve("shards").toString
    val plain = CurationPipeline.run(spark, sf, outPlain).stages.toMap
    val chunked = CurationPipeline.run(spark, sf, outChunk,
      chunkSize = 64, chunkOverlap = 8).stages.toMap

    // the filtering prefix is untouched by the later chunking stage
    Seq("corpus", "exact_dedup", "near_dedup", "decontaminated",
      "quality_lang", "repetition", "balanced").foreach { s =>
      assert(chunked(s) == plain(s), s"stage $s changed under chunking")
    }
    // chunking only splits: never fewer rows than documents, never drops
    assert(chunked("chunked") >= plain("balanced"))
    assert(chunked("packed") == chunked("chunked"), "packing must not drop chunk rows")

    // the budget holds row-wise: no packed row longer than chunkSize
    val rows = spark.read.parquet(outChunk)
    val over = rows.filter(TextFunctions.tokenCount(F.col("text")) > 64).count()
    assert(over == 0, s"$over rows exceed the 64-token chunk budget")
    // lossless per document: distinct original docs survive chunking
    // (chunk ids are doc_id·2^20 + idx)
    val origDocs = rows.select((F.col("doc_id") / (1L << 20)).cast("long").as("d"))
      .distinct().count()
    assert(origDocs == plain("balanced"),
      "chunking lost or invented documents")
  }
}
