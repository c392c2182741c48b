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

  test("scrub, token budget, and leakage-safe splits compose into the full corpus build") {
    import graft.operators.Dedup
    val out = TestFixtures.tmpDir("curated-full").resolve("shards").toString
    val counts = CurationPipeline.run(spark, sf, out,
      chunkSize = 64, chunkOverlap = 8,
      scrubSpanWidth = 8, scrubMinDf = 2,
      tokenBudget = 4000L,
      splits = Seq(("train", 80), ("val", 10), ("test", 10))).stages.toMap

    // the budget stage selects a strict subset at this budget, and
    // nothing downstream drops rows
    assert(counts("budgeted") <= counts("balanced"))
    assert(counts("budgeted") > 0)
    assert(counts("packed") == counts("chunked"), "packing must not drop chunk rows")

    val rows = spark.read.parquet(out)
    assert(rows.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val", "test")))

    // no packed sequence straddles splits: (split, seq_id) is the
    // sequence identity and every sequence holds rows of ONE split by
    // construction — verify the write preserved that
    val mixed = rows.groupBy("split", "seq_id")
      .agg(F.countDistinct("split").as("ns")).filter(F.col("ns") > 1).count()
    assert(mixed == 0)

    // leakage hygiene end to end: recompute the stage-2 pair list on the
    // surviving docs and check no near-dup pair straddles splits
    val docSplit = rows
      .select((F.col("doc_id") / (1L << 20)).cast("long").as("d"), F.col("split"))
      .distinct()
    assert(docSplit.groupBy("d").agg(F.countDistinct("split").as("ns"))
      .filter(F.col("ns") > 1).count() == 0,
      "a document's chunks landed in different splits")
    val all = graft.runtime.Tables.load(spark, sf, "documents")
    val pairs = Dedup.minhashNearDupPairs(all, "doc_id", "text", n = 3, minJ = 0.6)
    val straddle = pairs
      .join(docSplit.withColumnRenamed("d", "a_id").withColumnRenamed("split", "sa"), "a_id")
      .join(docSplit.withColumnRenamed("d", "b_id").withColumnRenamed("split", "sb"), "b_id")
      .filter(F.col("sa") =!= F.col("sb")).count()
    assert(straddle == 0, s"$straddle near-dup pairs straddle splits")

    // the scrub ran: corpus-repeated 8-gram spans are gone from the output
    val rebuilt = rows.select(
      (F.col("doc_id") / (1L << 20)).cast("long").as("d"), F.col("text"))
    val spans = rebuilt.select(F.col("d"), F.explode(
        F.when(F.size(F.split(F.col("text"), "\\s+")) >= 8,
          F.transform(
            F.sequence(F.lit(0), F.size(F.split(F.col("text"), "\\s+")) - 8),
            i => F.array_join(F.slice(F.split(F.col("text"), "\\s+"), i + F.lit(1), F.lit(8)), " ")))
          .otherwise(F.array().cast("array<string>"))).as("span"))
    // chunk overlap duplicates tokens WITHIN a doc, so only cross-doc
    // repeats (countDistinct doc >= 2) falsify the scrub
    val hot = spans.groupBy("span").agg(F.countDistinct("d").as("df"))
      .filter(F.col("df") >= 2).count()
    assert(hot == 0, s"$hot corpus-repeated spans survived the scrub")
  }

  test("span dedup and the deflate gate compose: one canonical copy survives, gate is monotone") {
    val out = TestFixtures.tmpDir("curated-spandedup").resolve("shards").toString
    val counts = CurationPipeline.run(spark, sf, out,
      spanDedupWidth = 8, spanDedupMinDf = 2, minDeflateRatio = 0.05).stages.toMap
    assert(counts("packed") > 0)

    def spans8(df: org.apache.spark.sql.DataFrame, idCol: String) = {
      val toks = F.split(F.col("text"), "\\s+")
      df.select(F.col(idCol).as("d"), F.explode(
        F.when(F.size(toks) >= 8,
          F.transform(F.sequence(F.lit(0), F.size(toks) - 8),
            i => F.array_join(F.slice(toks, i + F.lit(1), F.lit(8)), " ")))
          .otherwise(F.array().cast("array<string>"))).as("span"))
    }
    // DEDUP, not scrub: no 8-gram appears in two output docs...
    val outDocs = spark.read.parquet(out)
    assert(spans8(outDocs, "doc_id").groupBy("span")
      .agg(F.countDistinct("d").as("df")).filter(F.col("df") >= 2).count() == 0,
      "a cross-doc repeated span survived dedup in two carriers")
    // ...but canonical copies of input-corpus-repeated spans DO survive
    // (the scrub would have deleted every copy)
    val corpus = graft.runtime.Tables.load(spark, sf, "documents")
      .filter(F.col("doc_id") % 20 =!= 0)
    val inputHot = spans8(corpus, "doc_id").groupBy("span")
      .agg(F.countDistinct("d").as("df")).filter(F.col("df") >= 2).select("span")
    val keptCanonical = spans8(outDocs, "doc_id")
      .join(inputHot, "span").select("span").distinct().count()
    assert(keptCanonical > 0,
      "no canonical copy survived — span DEDUP behaved like the scrub")

    // the deflate gate is monotone in its threshold, and a stricter
    // threshold genuinely bites on this corpus (sub-median 0.45 vs the
    // pass-everything 0.05) without emptying it
    val outHarsh = TestFixtures.tmpDir("curated-deflate").resolve("shards").toString
    val harsh = CurationPipeline.run(spark, sf, outHarsh,
      spanDedupWidth = 8, spanDedupMinDf = 2, minDeflateRatio = 0.45).stages.toMap
    assert(harsh("quality_lang") < counts("quality_lang"),
      s"deflate gate at 0.45 did not bite: ${harsh("quality_lang")} vs ${counts("quality_lang")}")
    assert(harsh("packed") > 0, "0.45 should keep the above-median half")
  }

  test("semantic pairs pull paraphrase evidence into the split assignment") {
    import spark.implicits._
    val splits = Seq(("train", 80), ("val", 10), ("test", 10))
    val outA = TestFixtures.tmpDir("curated-sem-a").resolve("shards").toString
    val countsA = CurationPipeline.run(spark, sf, outA, splits = splits).stages.toMap
    def docSplits(out: String): Map[Long, String] = spark.read.parquet(out)
      .select("doc_id", "split").distinct()
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val before = docSplits(outA)

    // two surviving docs the token-space evidence left in DIFFERENT
    // splits — a stand-in for a paraphrase pair MinHash cannot see
    // (the semantic-pair CONTENT is the oracle-gated semanticDedup
    // tier's job; this test pins the pipeline wiring)
    val two = before.groupBy(_._2).values.map(_.keys.min).toSeq.sorted.take(2)
    val (a, b) = (two(0), two(1))
    assert(before(a) != before(b), "fixture needs docs in different splits")

    val outB = TestFixtures.tmpDir("curated-sem-b").resolve("shards").toString
    val countsB = CurationPipeline.run(spark, sf, outB, splits = splits,
      semanticPairs = Some(Seq((a, b)).toDF("a_id", "b_id"))).stages.toMap
    val after = docSplits(outB)

    // the planted pair is now co-assigned, and the evidence only ever
    // MERGES clusters — it never touches dedup/filtering stage counts
    assert(after(a) == after(b), "planted semantic pair still straddles splits")
    assert(countsB == countsA, "semantic pairs must not change filtering stages")
    assert(after.keySet == before.keySet, "split stage must not drop documents")
    // docs in neither merged cluster keep their assignment (hash of an
    // unchanged component rep is unchanged)
    val moved = before.keys.count(d => before(d) != after(d))
    assert(moved <= before.size / 2, s"merge moved $moved docs — far beyond the two clusters")
  }

  test("normalize=true unifies NFC/NFD and case twins before dedup keys are cut") {
    import spark.implicits._
    // fixture corpus: doc 1 and doc 21 are the SAME rendered text in NFC
    // and NFD spellings (plus a case difference); doc 41 is unrelated.
    // Byte-level keys see 1 and 21 as distinct; normalized keys collapse
    // them to the min-id representative.
    val nfc = "caf\u00e9 the corpus of the day is here and the text goes on and on"
    val nfd = "CAFE\u0301 the corpus of the day is here and the text goes on and on"
    val other = "a completely different document about the spark engine and the lake"
    // doc 20 is a BENCHMARK doc (doc_id % 20 == 0); doc 61 quotes its
    // passage in uppercase \u2014 byte-level shingles do not match, so only
    // the normalized run may catch the leak
    val benchDoc = "the secret eval answer is alpha beta gamma delta epsilon"
    val leaky = "intro words then THE SECRET EVAL ANSWER IS ALPHA BETA GAMMA DELTA EPSILON quoted"
    val work = TestFixtures.tmpDir("curated-nfc")
    val sfDir = work.resolve("data")
    java.nio.file.Files.createDirectories(sfDir)
    Seq(
      (1L, nfc, "en", "src0", nfc.length.toLong),
      (21L, nfd, "en", "src0", nfd.length.toLong),
      (41L, other, "en", "src0", other.length.toLong),
      (20L, benchDoc, "en", "src0", benchDoc.length.toLong),
      (61L, leaky, "en", "src0", leaky.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(sfDir.resolve("documents.parquet").toString)

    val outRaw = work.resolve("raw").toString
    val raw = CurationPipeline.run(spark, sfDir.toString, outRaw).stages.toMap
    val outNorm = work.resolve("norm").toString
    val norm = CurationPipeline.run(spark, sfDir.toString, outNorm,
      normalize = true).stages.toMap
    // byte-level EXACT dedup keeps both spellings (they differ in one
    // token, so the near-dup stage still catches the pair later);
    // normalized dedup collapses them at stage 1
    assert(raw("exact_dedup") == 4, raw.toString)
    assert(norm("exact_dedup") == 3, norm.toString)
    assert(raw("near_dedup") == 3 && norm("near_dedup") == 3,
      s"raw=$raw norm=$norm")
    // decontamination must fold the BENCHMARK side too: the uppercase
    // quote of the bench passage slips through the raw run (3 -> 3) but
    // is caught when both sides normalize (3 -> 2)
    assert(raw("decontaminated") == 3, raw.toString)
    assert(norm("decontaminated") == 2, norm.toString)
    // and the survivor is the min-id representative with normalized text
    val kept = spark.read.parquet(outNorm)
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(1L) && !ids.contains(21L) && !ids.contains(61L), ids.toString)
  }
}
