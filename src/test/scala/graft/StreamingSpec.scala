package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{BronzeStream, ScoringStream}

/** Structured-streaming legs: file-source CDC ingest with checkpointing
  * and the in-process scoring stream (S1/S7/S8/S9 + §3.4).
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  test("bronze stream ingests envelopes exactly once across restarts") {
    val work = TestFixtures.tmpDir("stream-bronze")
    val in = work.resolve("in")
    TestFixtures.writeEnvelopes(in, "b1.jsonl",
      TestFixtures.randomRows(50) :+ TestFixtures.tombstone)

    val bronzePath = work.resolve("bronze").toString
    val ckpt = work.resolve("ckpt").toString
    val q1 = BronzeStream.start(spark, in.toString, bronzePath, ckpt)
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(bronzePath).count() == 50)

    // restart with a new file: only the new one is processed
    TestFixtures.writeEnvelopes(in, "b2.jsonl", TestFixtures.randomRows(20, seed = 7L))
    val q2 = BronzeStream.start(spark, in.toString, bronzePath, ckpt)
    q2.processAllAvailable(); q2.stop()
    val after = spark.read.parquet(bronzePath)
    assert(after.count() == 70, "checkpoint failed to dedup the first file")
    assert(after.columns.contains("year"))
  }

  test("dedupWithinWatermark drops cross-batch re-deliveries with watermark-bounded state") {
    val work = TestFixtures.tmpDir("stream-dedup")
    val in = work.resolve("in")
    val rows = TestFixtures.randomRows(30)
    // file 1: originals; file 2: 10 exact re-deliveries + 5 new rows —
    // the at-least-once shape the Replay producer can emit after a crash
    TestFixtures.writeEnvelopes(in, "d1.jsonl", rows)
    TestFixtures.writeEnvelopes(in, "d2.jsonl",
      rows.take(10) ++ TestFixtures.randomRows(5, seed = 99L, startDay = 12))

    val sink = work.resolve("out").toString
    val parsed = graft.ingest.Debezium.withBronzeColumns(
      graft.ingest.Debezium.parse(BronzeStream.readEnvelopes(spark, in.toString, maxFilesPerTrigger = 1)))
    val q = BronzeStream.dedupWithinWatermark(parsed)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(sink)
      }
      .start()
    q.processAllAvailable(); q.stop()

    val out = spark.read.parquet(sink)
    assert(out.count() == 35, "re-delivered keys must be dropped exactly")
    assert(out.select("trans_num").distinct().count() == 35)
  }

  test("idempotent sink: a replayed batch id writes nothing twice") {
    val work = TestFixtures.tmpDir("idem")
    val base = work.resolve("layer").toString
    import spark.implicits._
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(graft.streaming.IdempotentSink.writeBatch(batch, base, batchId = 7L))
    // replay of the SAME epoch (post-crash rerun) is a no-op
    assert(!graft.streaming.IdempotentSink.writeBatch(batch, base, batchId = 7L))
    assert(graft.streaming.IdempotentSink.writeBatch(batch, base, batchId = 8L))
    val all = graft.streaming.IdempotentSink.read(spark, base)
    assert(all.count() == 4)
  }

  test("gold stream builds the star schema incrementally without rescans") {
    val work = TestFixtures.tmpDir("gold-stream")
    val spark2 = spark
    import graft.ingest.Debezium
    import graft.layers.Silver

    def silverOf(lines: Seq[String], mode: String): Unit = {
      val dir = TestFixtures.writeEnvelopes(
        work.resolve(s"cdc-$mode"), "b.jsonl", lines)
      val raw = spark2.read.text(dir.toString).withColumnRenamed("value", "json_string")
      val silver = Silver.transform(
        Debezium.withBronzeColumns(Debezium.parse(raw)), None)
      silver.write.mode("append").parquet(work.resolve("silver").toString)
    }
    silverOf(TestFixtures.randomRows(60), "1")
    val silverSchema = spark2.read.parquet(work.resolve("silver").toString).schema

    val goldDir = work.resolve("gold").toString
    val ckpt = work.resolve("ckpt").toString
    val q1 = graft.streaming.GoldStream.start(
      spark2, work.resolve("silver").toString, goldDir, ckpt, silverSchema)
    q1.processAllAvailable(); q1.stop()
    val fact1 = spark2.read.parquet(s"$goldDir/fact_transactions").count()
    assert(fact1 == 60)

    // second silver batch: stream restart picks up ONLY the new files;
    // dims stay duplicate-free across runs
    silverOf(TestFixtures.randomRows(30, seed = 123L, startDay = 15), "2")
    val q2 = graft.streaming.GoldStream.start(
      spark2, work.resolve("silver").toString, goldDir, ckpt, silverSchema)
    q2.processAllAvailable(); q2.stop()
    assert(spark2.read.parquet(s"$goldDir/fact_transactions").count() == 90)
    val custKeys = spark2.read.parquet(s"$goldDir/dim_customer")
      .select("customer_key").collect().map(_.getLong(0))
    assert(custKeys.distinct.length == custKeys.length, "dims accumulated duplicates")
  }

  test("scoring stream writes idempotent predictions and fraud-only alerts") {
    val work = TestFixtures.tmpDir("stream-score")
    val in = work.resolve("in")
    TestFixtures.writeEnvelopes(in, "s1.jsonl",
      TestFixtures.randomRows(40) ++ TestFixtures.smokeRows)

    val predsPath = work.resolve("preds").toString
    val alertsPath = work.resolve("alerts").toString
    val q = ScoringStream.start(spark, in.toString, predsPath, alertsPath,
      work.resolve("ckpt").toString)
    q.processAllAvailable(); q.stop()

    val preds = spark.read.parquet(predsPath)
    assert(preds.count() == 44)
    val alerts = spark.read.parquet(alertsPath)
    val predictedFraud = preds.filter(F.col("is_fraud_predicted") === 1).count()
    assert(alerts.count() == predictedFraud)
    assert(alerts.filter(F.col("trans_num") === "RT_HIGH_0001").count() == 1)

    // replay the same input through a FRESH checkpoint: anti-join keeps
    // the predictions table duplicate-free (reference's existence check),
    // and the alert leg dedups the same way — a crash between the two
    // writes must not re-emit the batch's alerts on replay
    val q2 = ScoringStream.start(spark, in.toString, predsPath, alertsPath,
      work.resolve("ckpt2").toString)
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(predsPath).count() == 44, "duplicate predictions written")
    assert(spark.read.parquet(alertsPath).count() == predictedFraud,
      "duplicate alerts written on replay")
  }

  test("checkpointed replay resumes mid-stream and feeds the bronze topology") {
    import graft.streaming.Replay
    val work = TestFixtures.tmpDir("replay")
    val srcDir = TestFixtures.writeEnvelopes(work.resolve("src"), "hist.jsonl",
      TestFixtures.randomRows(50))
    // historical envelopes with replay-ordering columns (the stream's
    // declared schema ignores the extra top-level fields)
    val source = spark.read.json(srcDir.toString)
      .select(F.col("after"),
        F.col("after.trans_date_trans_time").cast("long").as("__ts"),
        F.col("after.trans_num").as("__tn"))
    val out = work.resolve("landing").toString
    val ckpt = work.resolve("producer_ckpt").toString

    // first run stops after one batch of 20 — a mid-replay interruption
    assert(Replay.run(source, "__ts", "__tn", out, ckpt,
      batchRows = 20, maxBatches = 1) == 20L)
    assert(Replay.readCheckpoint(spark, ckpt) == 19L)
    // resume finishes the remaining 30 without re-emitting the first 20
    assert(Replay.run(source, "__ts", "__tn", out, ckpt, batchRows = 20) == 30L)
    val landed = spark.read.json(out)
    assert(landed.count() == 50)
    assert(landed.select("after.trans_num").distinct().count() == 50,
      "resume duplicated rows")
    // a third run is a no-op: the checkpoint says everything was replayed
    assert(Replay.run(source, "__ts", "__tn", out, ckpt) == 0L)

    // the landing dir is a valid bronze source (producer → CDC → stream)
    val q = BronzeStream.start(spark, out, work.resolve("bronze").toString,
      work.resolve("bronze-ckpt").toString)
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(work.resolve("bronze").toString).count() == 50)
  }

  test("e2e: train → auto-promote → scoring stream scores with the Production ML model") {
    import graft.ml.{FraudMl, ModelRegistry}
    val work = TestFixtures.tmpDir("ml-stream")

    // train on the planted signal and run the reference's auto-promotion flow
    val silver = TestFixtures.plantedSilver(spark)
    val (model, metrics, _) = FraudMl.train(silver, algorithm = "lr")
    val root = work.resolve("registry").toString
    val (v, promoted) = ModelRegistry.registerAndMaybePromote(
      spark, root, "fraud_detection_lr", model, metrics)
    assert(promoted, s"planted signal failed the promotion gate: $metrics")

    // stream scores with the registered Production model (not the rule model)
    val in = work.resolve("in")
    TestFixtures.writeEnvelopes(in, "s1.jsonl",
      TestFixtures.randomRows(30) ++ TestFixtures.smokeRows)
    val predsPath = work.resolve("preds").toString
    val alertsPath = work.resolve("alerts").toString
    val q = ScoringStream.startWithRegistry(spark, in.toString, predsPath, alertsPath,
      work.resolve("ckpt").toString, root, "fraud_detection_lr")
    q.processAllAvailable(); q.stop()

    val preds = spark.read.parquet(predsPath)
    assert(preds.count() == 34)
    val versions = preds.select("model_version").distinct().collect().map(_.getString(0))
    assert(versions.toSeq == Seq(s"fraud_detection_lr/v$v"),
      s"stream did not score with the registered model: ${versions.mkString(",")}")
    // the model learned the big-amount signal: the $1850 smoke row is flagged
    assert(spark.read.parquet(alertsPath)
      .filter(F.col("trans_num") === "RT_HIGH_0001").count() == 1)
    // probabilities, not rule scores: all within [0,1]
    assert(preds.filter(F.col("prediction_score") < 0 ||
      F.col("prediction_score") > 1).count() == 0)
  }

  test("corpus ingest stream dedups each micro-batch against the growing index") {
    import spark.implicits._
    import graft.streaming.CorpusIngestStream
    val work = TestFixtures.tmpDir("corpus-ingest")
    val name = s"ingest_${System.nanoTime()}"
    val rnd = new scala.util.Random(7L)
    def noise(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(5000)}").mkString(" ")
    val histBody = noise(60)
    graft.operators.NearDupIndex.build(
      Seq((1L, histBody), (2L, noise(60))).toDF("doc_id", "text"),
      "doc_id", "text", name)

    val in = work.resolve("in")
    java.nio.file.Files.createDirectories(in)
    def writeBatch(file: String, docs: Seq[(Long, String)]): Unit =
      java.nio.file.Files.writeString(in.resolve(file),
        docs.map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" }.mkString("\n"))

    val novel1 = noise(60)
    // batch 1: near-dup of history (drop), a novel doc (keep), an
    // intra-batch near-dup of that novel doc (drop — CC keeps min id),
    // and a phrase-loop doc the curate hook must reject before dedup
    val loop = Seq.fill(40)("spam ham").mkString(" ")
    writeBatch("b1.jsonl", Seq(
      (100L, s"$histBody tail tokens"),
      (101L, novel1),
      (102L, s"$novel1 extra token"),
      (103L, loop)))
    val accepted = work.resolve("accepted").toString
    val repetitionGate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      b => b.join(
        graft.operators.Curation.repetitionStats(b, "doc_id", "text")
          .filter(F.col("keep") === 1).select("doc_id"),
        Seq("doc_id"), "left_semi")
    val q = CorpusIngestStream.start(spark, in.toString, accepted,
      work.resolve("ckpt").toString, name, curate = repetitionGate)
    q.processAllAvailable()
    assert(spark.read.parquet(accepted).select("doc_id").as[Long].collect().toSet
      == Set(101L))

    // batch 2: near-dup of batch 1's survivor — history has GROWN, so it
    // must be dropped; plus one genuinely new doc
    val novel2 = noise(60)
    writeBatch("b2.jsonl", Seq(
      (200L, s"$novel1 small change"),
      (201L, novel2)))
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(accepted).select("doc_id").as[Long].collect().toSet
      == Set(101L, 201L))
    // the index folded in exactly the accepted docs
    assert(spark.table(s"${name}_counts").select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L, 101L, 201L))
  }

  test("embedding ingest stream dedups vectors against the growing IVF index; replay converges") {
    import spark.implicits._
    import graft.operators.IvfIndex
    import graft.streaming.EmbeddingIngestStream
    val work = TestFixtures.tmpDir("emb-ingest")
    val root = work.resolve("ivf").toString
    val emb = graft.runtime.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    IvfIndex.build(emb, "vec_id", "embedding", root, numCentroids = 8)
    val baseCount = spark.read.parquet(s"$root/vectors").count()

    val in = work.resolve("in")
    java.nio.file.Files.createDirectories(in)
    def writeBatch(file: String, vecs: Seq[(Long, Array[Double])]): Unit =
      java.nio.file.Files.writeString(in.resolve(file),
        vecs.map { case (id, v) =>
          s"""{"vec_id": $id, "embedding": [${v.mkString(",")}]}"""
        }.mkString("\n"))

    val v3 = emb.filter(F.col("vec_id") === 3L)
      .head().getSeq[Float](1).map(_.toDouble).toArray
    val rnd = new scala.util.Random(11L)
    def rand() = Array.fill(64)(rnd.nextGaussian())
    val novel = rand()
    // batch 1: exact copy of indexed vec 3 (drop vs history), a novel
    // vector (keep), and an intra-batch copy of the novel (drop, min id kept)
    writeBatch("b1.jsonl", Seq((9000L, v3), (9001L, novel), (9002L, novel)))
    val accepted = work.resolve("accepted").toString
    val q = EmbeddingIngestStream.start(spark, in.toString, accepted,
      work.resolve("ckpt").toString, root, maxCos = 0.999)
    q.processAllAvailable()
    assert(spark.read.parquet(accepted).select("vec_id").as[Long].collect().toSet
      == Set(9001L))

    // batch 2: near-dup of batch 1's survivor — history has GROWN — plus
    // one genuinely new vector
    writeBatch("b2.jsonl", Seq((9100L, novel), (9101L, rand())))
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(accepted).select("vec_id").as[Long].collect().toSet
      == Set(9001L, 9101L))
    assert(spark.read.parquet(s"$root/vectors").count() == baseCount + 2)

    // crash between land and fold, then replay: no duplicate accepted
    // ids, the fold lands exactly once, and the next batch still dedups
    // against the replayed survivor
    val b3 = Seq((9200L, rand().toSeq)).toDF("vec_id", "embedding")
    EmbeddingIngestStream.processBatch(spark, b3, 10L, accepted, root, 0.999,
      crashBeforeFold = true)
    EmbeddingIngestStream.processBatch(spark, b3, 10L, accepted, root, 0.999)
    val landed = spark.read.parquet(accepted).select("vec_id").as[Long].collect().toSeq
    assert(landed.sorted == Seq(9001L, 9101L, 9200L),
      s"replay duplicated or dropped: $landed")
    assert(spark.read.parquet(s"$root/vectors").count() == baseCount + 3)
    val b4 = Seq((9300L, b3.head().getSeq[Double](1).toSeq)).toDF("vec_id", "embedding")
    EmbeddingIngestStream.processBatch(spark, b4, 11L, accepted, root, 0.999)
    assert(spark.read.parquet(accepted).select("vec_id").as[Long].collect().toSet
      == Set(9001L, 9101L, 9200L), "copy of the replayed survivor must be dropped")
  }

  test("multi-probe embedding gate catches a face-straddling near-dup single-probe misses") {
    import spark.implicits._
    import graft.operators.IvfIndex
    import graft.streaming.EmbeddingIngestStream
    val work = TestFixtures.tmpDir("emb-multiprobe")
    val rnd = new scala.util.Random(7L)
    // two tight clusters along e1 and e2 → k=2 centroids sit on the axes
    // and the Voronoi face is the 45° bisector plane
    def axisVec(axis: Int) = {
      val v = Array.fill(4)(rnd.nextGaussian() * 0.05); v(axis) += 10.0; v.toSeq
    }
    val corpus = ((0 until 20).map(i => (i.toLong, axisVec(0))) ++
      (20 until 40).map(i => (i.toLong, axisVec(1)))).toDF("vec_id", "embedding")
    def angled(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(10 * math.cos(r), 10 * math.sin(r), 0.0, 0.0)
    }
    // h at 46° is on the e2 side of the face, x at 44° on the e1 side;
    // cos(h,x) = cos(2°) ≈ 0.99939 — a near-dup pair straddling the face
    val h = angled(46.0)
    val x = angled(44.0)

    // sanity: the planted pair really does land in different cells
    val sanityRoot = work.resolve("ivf-sanity").toString
    IvfIndex.build(corpus, "vec_id", "embedding", sanityRoot, numCentroids = 2)
    assert(IvfIndex.assignCells(Seq((1L, h), (2L, x)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", sanityRoot).select("cell").distinct().count() == 2,
      "fixture pair does not straddle the cell face")
    // and assignCellsMulti's nearest cell agrees with assignCells
    val multi = IvfIndex.assignCellsMulti(corpus, "vec_id", "embedding", sanityRoot, 2)
      .select(F.col("id"), F.col("cells").getItem(0).as("c0"))
    val single = IvfIndex.assignCells(corpus, "vec_id", "embedding", sanityRoot)
      .select(F.col("id"), F.col("cell"))
    assert(multi.join(single, "id").filter(F.col("c0") =!= F.col("cell")).count() == 0,
      "cells[0] must equal the single-probe assignment")

    def runScenario(nProbeGate: Int): Set[Long] = {
      val root = work.resolve(s"ivf$nProbeGate").toString
      val accepted = work.resolve(s"acc$nProbeGate").toString
      IvfIndex.build(corpus, "vec_id", "embedding", root, numCentroids = 2)
      EmbeddingIngestStream.processBatch(spark, Seq((100L, h)).toDF("vec_id", "embedding"),
        0L, accepted, root, maxCos = 0.999, nProbeGate = nProbeGate)
      EmbeddingIngestStream.processBatch(spark, Seq((200L, x)).toDF("vec_id", "embedding"),
        1L, accepted, root, maxCos = 0.999, nProbeGate = nProbeGate)
      spark.read.parquet(accepted).select("vec_id").as[Long].collect().toSet
    }
    // single-probe: x only sees its own (e1) cell's history — h invisible
    assert(runScenario(1) == Set(100L, 200L),
      "single-probe gate unexpectedly caught the straddling pair")
    // multi-probe: x's runner-up cell is e2's — h is seen and x dropped
    assert(runScenario(2) == Set(100L),
      "multi-probe gate missed the face-straddling near-dup")
  }

  test("embedding curation gate drops null/NaN/zero-norm vectors before assignment") {
    import spark.implicits._
    import graft.operators.IvfIndex
    import graft.streaming.EmbeddingIngestStream
    val work = TestFixtures.tmpDir("emb-gate")
    val root = work.resolve("ivf").toString
    val rnd = new scala.util.Random(13L)
    def rand() = Array.fill(8)(rnd.nextGaussian()).toSeq
    IvfIndex.build((0 until 20).map(i => (i.toLong, rand())).toDF("vec_id", "embedding"),
      "vec_id", "embedding", root, numCentroids = 2)
    // a zero-norm vector would make every cosine against it NaN — once
    // landed it can never be matched again, poisoning the dedup gate
    val batch = Seq(
      (100L, Some(rand())),
      (101L, Some(Seq.fill(8)(0.0))),
      (102L, Some(rand().updated(3, Double.NaN))),
      (103L, Option.empty[Seq[Double]])).toDF("vec_id", "embedding")
    val accepted = work.resolve("acc").toString
    EmbeddingIngestStream.processBatch(spark, batch, 0L, accepted, root, maxCos = 0.999)
    assert(spark.read.parquet(accepted).select("vec_id").as[Long].collect().toSet
      == Set(100L), "curation gate must reject degenerate vectors")
  }

  test("oversized embedding batch falls back to the salted shuffle gate — same results") {
    import spark.implicits._
    import graft.operators.IvfIndex
    import graft.streaming.EmbeddingIngestStream
    val work = TestFixtures.tmpDir("emb-salted")
    val rnd = new scala.util.Random(17L)
    def rand() = Array.fill(16)(rnd.nextGaussian()).toSeq
    val seed = (0 until 50).map(i => (i.toLong, rand()))
    // the batch plants one history dup (of seed vec 5) and one intra dup
    val novel = rand()
    val batch = Seq((900L, seed(5)._2), (901L, novel), (902L, novel), (903L, rand()))
      .toDF("vec_id", "embedding")
    def runWith(maxRows: Long, tag: String): Set[Long] = {
      val root = work.resolve(s"ivf-$tag").toString
      IvfIndex.build(seed.toDF("vec_id", "embedding"), "vec_id", "embedding", root,
        numCentroids = 4)
      val accepted = work.resolve(s"acc-$tag").toString
      EmbeddingIngestStream.processBatch(spark, batch, 0L, accepted, root,
        maxCos = 0.999, broadcastMaxRows = maxRows)
      spark.read.parquet(accepted).select("vec_id").as[Long].collect().toSet
    }
    val viaBroadcast = runWith(Long.MaxValue, "bcast")
    val viaSalted = runWith(0L, "salted") // every batch "oversized" → fallback path
    assert(viaBroadcast == Set(901L, 903L), s"broadcast gate wrong: $viaBroadcast")
    assert(viaSalted == viaBroadcast,
      s"salted fallback disagrees with broadcast gate: $viaSalted vs $viaBroadcast")
  }

  test("corpus ingest across many triggers: each batch dedups against all previous epochs") {
    import spark.implicits._
    import graft.streaming.CorpusIngestStream
    val work = TestFixtures.tmpDir("corpus-multi")
    val name = s"ingestm_${System.nanoTime()}"
    val rnd = new scala.util.Random(29L)
    def noise(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(5000)}").mkString(" ")
    val histBody = noise(60)
    graft.operators.NearDupIndex.build(
      Seq((1L, histBody), (2L, noise(60))).toDF("doc_id", "text"),
      "doc_id", "text", name)

    val in = work.resolve("in")
    java.nio.file.Files.createDirectories(in)
    val accepted = work.resolve("accepted").toString
    val q = CorpusIngestStream.start(spark, in.toString, accepted,
      work.resolve("ckpt").toString, name)

    // five consecutive micro-batches; batch i carries one novel doc and a
    // near-dup of the PREVIOUS batch's survivor — only the index that
    // grew through every earlier epoch can reject it
    var prev = histBody
    (1 to 5).foreach { i =>
      val novel = noise(60)
      java.nio.file.Files.writeString(in.resolve(s"m$i.jsonl"),
        s"""{"doc_id": ${100 + i}, "text": "$novel"}""" + "\n" +
          s"""{"doc_id": ${200 + i}, "text": "$prev tail tokens"}""")
      q.processAllAvailable()
      prev = novel
    }
    q.stop()

    assert(spark.read.parquet(accepted).select("doc_id").as[Long].collect().toSet
      == (1 to 5).map(100L + _).toSet,
      "exactly the five novel docs survive; every cross-epoch near-dup is dropped")
    // the index holds exactly the build corpus plus the five accepted docs
    assert(spark.table(s"${name}_counts").select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L) ++ (1 to 5).map(100L + _).toSet)
  }

  test("corpus ingest with compactEvery bounds epochs without changing the accepted set") {
    import spark.implicits._
    import graft.streaming.CorpusIngestStream
    val work = TestFixtures.tmpDir("corpus-autocompact")
    val name = s"ingestc_${System.nanoTime()}"
    val rnd = new scala.util.Random(47L)
    def noise(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(5000)}").mkString(" ")
    val histBody = noise(60)
    graft.operators.NearDupIndex.build(
      Seq((1L, histBody), (2L, noise(60))).toDF("doc_id", "text"),
      "doc_id", "text", name)
    val in = work.resolve("in")
    java.nio.file.Files.createDirectories(in)
    val accepted = work.resolve("accepted").toString
    val q = CorpusIngestStream.start(spark, in.toString, accepted,
      work.resolve("ckpt").toString, name, compactEvery = 2)

    // same topology as the multi-trigger test: batch i carries a novel
    // doc and a near-dup of the PREVIOUS survivor — after epochs 0..1
    // are folded away at batch 2, the dedup must still reject dups of
    // docs that now live only in the consolidated partition
    var prev = histBody
    (1 to 5).foreach { i =>
      val novel = noise(60)
      java.nio.file.Files.writeString(in.resolve(s"m$i.jsonl"),
        s"""{"doc_id": ${100 + i}, "text": "$novel"}""" + "\n" +
          s"""{"doc_id": ${200 + i}, "text": "$prev tail tokens"}""")
      q.processAllAvailable()
      prev = novel
    }
    q.stop()

    assert(spark.read.parquet(accepted).select("doc_id").as[Long].collect().toSet
      == (1 to 5).map(100L + _).toSet,
      "auto-compaction changed the accepted set")
    // batch 4's trigger folded epochs <= 3; only the consolidated
    // partition and the last epoch remain
    val parts = spark.sql(s"SHOW PARTITIONS ${name}_buckets").collect()
      .map(_.getString(0).stripPrefix("epoch=").toLong).toSet
    assert(parts == Set(-1L, 4L), s"epochs not bounded: $parts")
    assert(spark.table(s"${name}_counts").select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L) ++ (1 to 5).map(100L + _).toSet)
  }

  test("embedding ingest with compactEvery folds cold epochs and still dedups against them") {
    import spark.implicits._
    import graft.operators.IvfIndex
    import graft.streaming.EmbeddingIngestStream
    val work = TestFixtures.tmpDir("emb-autocompact")
    val root = work.resolve("ivf").toString
    val rnd = new scala.util.Random(61L)
    def rand() = Array.fill(16)(rnd.nextGaussian()).toSeq
    IvfIndex.build((0 until 50).map(i => (i.toLong, rand())).toDF("vec_id", "embedding"),
      "vec_id", "embedding", root, numCentroids = 4)
    val accepted = work.resolve("acc").toString
    val v100 = rand()
    def run(rows: Seq[(Long, Seq[Double])], batchId: Long,
        crashBeforeFold: Boolean = false): Unit =
      EmbeddingIngestStream.processBatch(spark,
        rows.toDF("vec_id", "embedding"), batchId, accepted, root,
        maxCos = 0.999, compactEvery = 2, crashBeforeFold = crashBeforeFold)
    run(Seq((100L, v100)), 0L)
    run(Seq((101L, rand())), 1L)
    // batch 2's trigger folds epochs <= 1 first, then processes normally:
    // its copy of vec 100 must still be rejected even though 100 now
    // lives only in the consolidated partition, while its novel vector
    // lands under epoch 2 as usual. First attempt "crashes" AFTER the
    // compaction and land but BEFORE the fold — the replay re-runs the
    // (now no-op) compaction to its fixpoint before the gate reads
    // anything, then converges
    val batch2 = Seq((102L, v100), (103L, rand()))
    run(batch2, 2L, crashBeforeFold = true)
    run(batch2, 2L)
    val epochs = new java.io.File(root, "vectors").listFiles().toSeq
      .map(_.getName).filter(_.startsWith("epoch="))
      .map(_.stripPrefix("epoch=").toLong).toSet
    assert(epochs == Set(-1L, 2L), s"epochs not bounded: $epochs")
    assert(spark.read.parquet(accepted).select("vec_id").as[Long].collect().toSet
      == Set(100L, 101L, 103L), "compacted history no longer gates")
  }

  test("corpus ingest replay after a mid-fold crash neither duplicates nor drops") {
    import spark.implicits._
    import graft.operators.NearDupIndex
    import graft.streaming.CorpusIngestStream
    val work = TestFixtures.tmpDir("corpus-replay")
    val name = s"ingestr_${System.nanoTime()}"
    val rnd = new scala.util.Random(19L)
    def noise(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(5000)}").mkString(" ")
    val histBody = noise(60)
    NearDupIndex.build(
      Seq((1L, histBody), (2L, noise(60))).toDF("doc_id", "text"),
      "doc_id", "text", name)
    val accepted = work.resolve("accepted").toString
    val cfg = NearDupIndex.Config()

    // batch 0: one near-dup of history (must drop), one novel doc (must keep).
    // Attempt 1 lands the survivors, then "crashes" between the counts and
    // buckets appends of the fold.
    val novel1 = noise(60)
    val b0 = Seq((100L, s"$histBody tail tokens"), (101L, novel1))
      .toDF("doc_id", "text")
    CorpusIngestStream.processBatch(spark, b0, 0L, accepted, name, 0.6, cfg,
      identity, crashAfterFoldRelations = Some(2))
    // the replay of the same micro-batch converges…
    CorpusIngestStream.processBatch(spark, b0, 0L, accepted, name, 0.6, cfg, identity)

    // …to an accepted corpus with NO duplicate ids and the same verdicts
    assert(spark.read.parquet(accepted).select("doc_id").as[Long].collect().toSeq
      == Seq(101L))
    // and an index with exactly one counts row for the survivor
    assert(spark.table(s"${name}_counts").filter($"doc_id" === 101L).count() == 1)

    // the next batch still dedups against the replayed survivor with a
    // correct (non-inflated) jaccard: its near-dup is dropped, novel kept
    val b1 = Seq((200L, s"$novel1 small change"), (201L, noise(60)))
      .toDF("doc_id", "text")
    CorpusIngestStream.processBatch(spark, b1, 1L, accepted, name, 0.6, cfg, identity)
    assert(spark.read.parquet(accepted).select("doc_id").as[Long].collect().toSet
      == Set(101L, 201L))
  }

  test("re-delivered identical rows in one trigger are absorbed; conflicting ids still throw") {
    import spark.implicits._
    import graft.operators.{IvfIndex, NearDupIndex}
    import graft.streaming.{CorpusIngestStream, EmbeddingIngestStream}
    val work = TestFixtures.tmpDir("redelivered")
    val rnd = new scala.util.Random(23L)
    def noise(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(5000)}").mkString(" ")

    // corpus leg: the same (id, text) row twice in one batch — as if one
    // file were delivered twice within a trigger — must NOT wedge the
    // stream on append's internal-uniqueness guard; the row lands once
    val name = s"redeliv_${System.nanoTime()}"
    NearDupIndex.build(Seq((1L, noise(60))).toDF("doc_id", "text"),
      "doc_id", "text", name)
    val accepted = work.resolve("acc").toString
    val cfg = NearDupIndex.Config()
    val doc = noise(60)
    CorpusIngestStream.processBatch(spark,
      Seq((100L, doc), (100L, doc)).toDF("doc_id", "text"),
      0L, accepted, name, 0.6, cfg, identity)
    assert(spark.read.parquet(accepted).select("doc_id").as[Long].collect().toSeq
      == Seq(100L))
    assert(spark.table(s"${name}_counts").filter($"doc_id" === 100L).count() == 1)
    // same id with DIFFERENT content is upstream corruption: fail loudly
    // (the docs differ in length so neither near-dups the other)
    val boom = intercept[IllegalArgumentException] {
      CorpusIngestStream.processBatch(spark,
        Seq((200L, noise(60)), (200L, noise(8))).toDF("doc_id", "text"),
        1L, accepted, name, 0.6, cfg, identity)
    }
    assert(boom.getMessage.contains("internally duplicated"))

    // embedding leg: same contract on the IVF ingest
    val root = work.resolve("ivf").toString
    def rand() = Array.fill(16)(rnd.nextGaussian())
    IvfIndex.build(
      (1L to 4L).map(i => (i, rand().toSeq)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", root, numCentroids = 2)
    val acc2 = work.resolve("acc2").toString
    val v = rand().toSeq
    EmbeddingIngestStream.processBatch(spark,
      Seq((100L, v), (100L, v)).toDF("vec_id", "embedding"),
      0L, acc2, root, maxCos = 0.999)
    assert(spark.read.parquet(acc2).select("vec_id").as[Long].collect().toSeq
      == Seq(100L))
    assert(spark.read.parquet(s"$root/vectors")
      .filter($"id" === 100L).count() == 1)
    val boom2 = intercept[IllegalArgumentException] {
      EmbeddingIngestStream.processBatch(spark,
        Seq((200L, rand().toSeq), (200L, rand().toSeq)).toDF("vec_id", "embedding"),
        1L, acc2, root, maxCos = 0.999)
    }
    assert(boom2.getMessage.contains("internally duplicated"))
  }

  test("sustained drift trips the occupancy monitor and the stream rebuilds unattended") {
    import spark.implicits._
    import graft.operators.IvfIndex
    import graft.streaming.EmbeddingIngestStream
    val work = TestFixtures.tmpDir("emb-autorebuild")
    val handle = work.resolve("ivf").toString
    val accepted = work.resolve("acc").toString
    val rnd = new scala.util.Random(61L)
    def near(offset: Double) =
      Array.tabulate(8)(d => rnd.nextGaussian() + (if (d == 0) offset else 0.0)).toSeq
    // build on the origin mode; every subsequent batch arrives from a
    // SHIFTED mode, so one build-time cell soaks up all new vectors
    IvfIndex.build((0 until 100).map(i => (i.toLong, near(0.0))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", handle, numCentroids = 4)
    // calibrate the base index: the drift rebuild below must CARRY this
    // contract to the new generation, not silently degrade to
    // DefaultProbes (round-11 finding)
    IvfIndex.calibrateAndStore(spark, handle,
      (0 until 100).map(i => (i.toLong, near(0.0))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 5, targetRecall = 0.9, sampleQueries = 16)
    val baseDial = IvfIndex.servingConfig(spark, handle)
    assert(baseDial.exists(_.k == 5))

    def drive(batchId: Long, batch: Seq[(Long, Seq[Double])], maxShare: Double): Unit =
      EmbeddingIngestStream.processBatch(spark, batch.toDF("vec_id", "embedding"),
        batchId, accepted, handle, maxCos = 0.999,
        rebuildEvery = 2, rebuildMaxShare = maxShare, rebuildMinTotal = 50L)

    val drifted = (1 to 5).map(b =>
      b.toLong -> (0 until 80).map(i => (1000L * b + i, near(15.0)))).toMap
    drive(1L, drifted(1L), maxShare = 1.1)
    // pick the bar just ABOVE the post-batch-1 share: batch 2's cadence
    // check must see "not yet drifted enough" deterministically, and the
    // share is monotone (every drifted vector lands in the same argmin
    // cell), so batch 4's check deterministically crosses it
    val (share1, _) = IvfIndex.cellStats(spark, handle)
    val bar = share1 + 0.03
    drive(2L, drifted(2L), bar)
    assert(IvfIndex.currentRoot(spark, handle) == handle,
      "monitor must not rebuild before the share crosses the threshold")
    drive(3L, drifted(3L), bar)
    val (shareBefore, _) = IvfIndex.cellStats(spark, handle)
    assert(shareBefore >= bar, s"fixture failed to drift: share $shareBefore < $bar")
    // cadence batch 4: the monitor trips, the stream rebuilds into a
    // fresh generation and commits the CURRENT pointer — no manual step
    drive(4L, drifted(4L), bar)
    val gen = IvfIndex.currentRoot(spark, handle)
    assert(gen == s"$handle/gen-4", s"expected an auto-committed generation, got $gen")
    val (shareAfter, total) = IvfIndex.cellStats(spark, gen)
    assert(shareAfter < shareBefore,
      s"rebuild did not rebalance: $shareBefore -> $shareAfter")
    // the unattended rebuild recalibrated BEFORE the flip: the new
    // generation serves at a stored dial for the same (k, target)
    // contract, never the uncalibrated DefaultProbes fallback
    val genDial = IvfIndex.servingConfig(spark, gen)
    assert(genDial.exists(c => c.k == 5 && c.targetRecall == 0.9),
      s"post-rebuild generation lost the serving contract: $genDial")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$gen/serving.parquet")),
      "the recalibrated dial must be PERSISTED next to the new generation")
    // nothing lost: the generation holds the seed corpus plus every
    // ACCEPTED vector (the gate may legitimately drop a random pair that
    // crosses maxCos — count the landed set, not the sent set; batch 4
    // folded into the new generation)
    val acceptedSoFar = spark.read.parquet(accepted).count()
    assert(total == 100L + acceptedSoFar, s"generation lost vectors: $total")
    assert(spark.read.parquet(s"$gen/vectors").count() == total)

    // the stream keeps ingesting against the new generation: an exact
    // copy of a pre-rebuild survivor is still gated, novelty still lands
    val replayCopy = drifted(3L).head._2
    drive(5L, Seq((9000L, replayCopy), (9001L, near(15.0))), bar)
    val ids = spark.read.parquet(accepted).select("vec_id").as[Long].collect().toSet
    assert(!ids.contains(9000L), "rebuilt generation no longer gates history dups")
    assert(ids.contains(9001L), "novel vector must survive the rebuilt gate")
    assert(spark.read.parquet(s"$gen/vectors").filter($"id" === 9001L).count() == 1,
      "post-rebuild folds must land in the live generation")

    // maintenance: retiring old generations removes the drained base
    // index but NEVER the live generation, and the stream keeps working
    val retired = IvfIndex.retireOldGenerations(spark, handle)
    assert(retired == Seq(handle), s"expected only the base index retired: $retired")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$handle/vectors")),
      "base generation data must be gone")
    assert(IvfIndex.currentRoot(spark, handle) == gen)
    assert(spark.read.parquet(s"$gen/vectors").filter($"id" === 9001L).count() == 1)
    drive(7L, Seq((9100L, near(15.0))), bar) // odd id: off the rebuild cadence
    assert(spark.read.parquet(s"$gen/vectors").filter($"id" === 9100L).count() == 1,
      "ingest must continue against the live generation after retirement")
  }

  test("gate assignment kernels: two-level gate ≡ flat gate at coarseProbes=G; large-C route exact end to end") {
    import spark.implicits._
    import graft.operators.IvfIndex
    import graft.streaming.EmbeddingIngestStream
    val rnd = new scala.util.Random(83L)
    def vec() = Array.fill(8)(rnd.nextGaussian()).toSeq
    val corpus = (0 until 240).map(i => (i.toLong, vec()))
    // one near-dup pair split across the batch (ids 9000/9001 identical)
    // plus novelty; identical vectors get IDENTICAL probe lists under
    // ANY kernel, so the intra-batch catch is kernel-independent
    val dupVec = vec()
    val batch = Seq((9000L, dupVec), (9001L, dupVec)) ++
      (9002L to 9011L).map(i => (i, vec()))

    // gate parity: two identical indexes (same corpus, same seed), one
    // driven flat (coarseProbesGate = 0), one through the two-level
    // kernel covering ALL groups (coarseProbes = G ⇒ bit-identical
    // candidates, SimilaritySpec's kernel contract) — the gates must
    // accept the SAME set
    val work = TestFixtures.tmpDir("gate-two-level")
    def runGate(tag: String, coarse: Int): Set[Long] = {
      val root = work.resolve(s"ivf-$tag").toString
      val acc = work.resolve(s"acc-$tag").toString
      IvfIndex.build(corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
        root, numCentroids = 9)
      EmbeddingIngestStream.processBatch(spark, batch.toDF("vec_id", "embedding"),
        1L, acc, root, maxCos = 0.92, nProbeGate = 2, coarseProbesGate = coarse)
      spark.read.parquet(acc).select("vec_id").as[Long].collect().toSet
    }
    val flat = runGate("flat", 0)
    val g = math.round(math.sqrt(9.0)).toInt
    val twoLevel = runGate("two", g)
    assert(twoLevel == flat,
      s"two-level gate at coarseProbes=G changed the accepted set: $twoLevel vs $flat")
    assert(flat.contains(9000L) && !flat.contains(9001L),
      "intra-batch duplicate: keep the smaller id, drop the larger")

    // the large-C route end to end: C=144 crosses LiteralKernelMaxCells,
    // so the DEFAULT gate assigns through the broadcast-join kernel —
    // still EXACT, so the intra dup (identical probe lists under any
    // exact kernel) is caught and novelty lands
    val bigCorpus = (0 until 600).map(i => (i.toLong, vec()))
    val rootBig = work.resolve("ivf-auto").toString
    val accBig = work.resolve("acc-auto").toString
    IvfIndex.build(bigCorpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
      rootBig, numCentroids = 144)
    assert(IvfIndex.numCells(spark, rootBig) == 144)
    assert(IvfIndex.LiteralKernelMaxCells < 144, "threshold moved — revisit this spec")
    EmbeddingIngestStream.processBatch(spark, batch.toDF("vec_id", "embedding"),
      1L, accBig, rootBig, maxCos = 0.92, nProbeGate = 2) // default: routed
    val acceptedBig = spark.read.parquet(accBig).select("vec_id").as[Long].collect().toSet
    assert(acceptedBig.contains(9000L) && !acceptedBig.contains(9001L),
      "join-kernel gate must still catch the intra-batch duplicate")
    assert((9002L to 9011L).count(acceptedBig.contains) >= 8,
      s"join-kernel gate dropped too much novelty: $acceptedBig")
    assert(spark.read.parquet(s"$rootBig/vectors")
      .filter($"id" === 9000L).count() == 1, "survivors must fold into the index")
  }

  test("concurrent corpus + embedding streams on one session: no partition truncation") {
    import spark.implicits._
    import graft.operators.{IvfIndex, NearDupIndex}
    import graft.streaming.{CorpusIngestStream, EmbeddingIngestStream}
    val work = TestFixtures.tmpDir("two-streams")
    val rnd = new scala.util.Random(67L)
    def noise(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(5000)}").mkString(" ")

    // corpus leg: catalog-table index (session-conf dynamic-overwrite
    // window under NearDupIndex.overwriteConfLock) — the topology the
    // lock exists for is BOTH legs' writers interleaving on one session
    val name = s"race_${System.nanoTime()}"
    NearDupIndex.build(Seq((1L, noise(60))).toDF("doc_id", "text"),
      "doc_id", "text", name)
    val corpusIn = work.resolve("corpus-in")
    java.nio.file.Files.createDirectories(corpusIn)
    val docIds = (0 until 6).map { f =>
      val id = 100L + f
      java.nio.file.Files.write(corpusIn.resolve(f"c$f%02d.jsonl"),
        s"""{"doc_id": $id, "text": "${noise(60)}"}""".getBytes("UTF-8"))
      id
    }

    // embedding leg: path-based IVF index (per-write dynamic option)
    val root = work.resolve("ivf").toString
    def rand() = Array.fill(16)(rnd.nextGaussian())
    IvfIndex.build((0 until 20).map(i => (i.toLong, rand().toSeq))
      .toDF("vec_id", "embedding"), "vec_id", "embedding", root, numCentroids = 2)
    val embIn = work.resolve("emb-in")
    java.nio.file.Files.createDirectories(embIn)
    val vecIds = (0 until 6).map { f =>
      val id = 500L + f
      java.nio.file.Files.write(embIn.resolve(f"v$f%02d.jsonl"),
        s"""{"vec_id": $id, "embedding": [${rand().mkString(",")}]}""".getBytes("UTF-8"))
      id
    }

    // one file per trigger on both legs → 6 interleaving triggers each,
    // every one a dynamic-overwrite fold racing the other stream's
    val accC = work.resolve("accC").toString
    val accE = work.resolve("accE").toString
    val qc = CorpusIngestStream.start(spark, corpusIn.toString, accC,
      work.resolve("ckptC").toString, name,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"),
      maxFilesPerTrigger = 1)
    val qe = EmbeddingIngestStream.start(spark, embIn.toString, accE,
      work.resolve("ckptE").toString, root, maxCos = 0.999,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"),
      maxFilesPerTrigger = 1)
    try {
      qc.processAllAvailable(); qe.processAllAvailable()
      // drain again: both were definitely live simultaneously above; a
      // second pass catches files that raced the first drain's cutoff
      qc.processAllAvailable(); qe.processAllAvailable()
    } finally { qc.stop(); qe.stop() }

    // both accepted sets complete — nothing dropped by a raced overwrite
    assert(spark.read.parquet(accC).select("doc_id").as[Long].collect().toSet
      == docIds.toSet)
    assert(spark.read.parquet(accE).select("vec_id").as[Long].collect().toSet
      == vecIds.toSet)
    // no partition truncation: every corpus doc (seed + all 6 epochs)
    // still has exactly one counts row, and every epoch survived
    val counts = spark.table(s"${name}_counts")
    assert(counts.groupBy("doc_id").count().filter($"count" =!= 1).count() == 0)
    assert(counts.select("doc_id").as[Long].collect().toSet == (docIds.toSet + 1L))
    // same on the IVF side: seed + every folded vector, one row each
    val vecs = spark.read.parquet(s"$root/vectors")
    assert(vecs.count() == 20L + vecIds.size)
    assert(vecs.groupBy("id").count().filter($"count" =!= 1).count() == 0)
  }
}
