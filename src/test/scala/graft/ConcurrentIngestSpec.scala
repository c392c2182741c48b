package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, NearDupIndex}
import graft.streaming.{CorpusIngestStream, EmbeddingIngestStream}

/** The two-streams-one-session topology RACED for real: a corpus ingest
  * stream and an embedding ingest stream run concurrently on one
  * SparkSession, each with in-trigger compaction enabled, so their
  * dynamic-partition-overwrite windows ([[NearDupIndex.withDynamicOverwrite]])
  * and micro-batch conf windows ([[graft.streaming.MicroBatchConf]])
  * genuinely contend. Prior rounds only reasoned about this topology (and
  * StreamBench runs the legs sequentially); this spec asserts the two
  * invariants concurrency could break:
  *
  *   - NO PARTITION TRUNCATION: if any fold or compaction inside the race
  *     window ran as a STATIC overwrite (the failure mode the
  *     `withDynamicOverwrite` lock exists to prevent), earlier epochs of
  *     that index would be silently deleted — detected here because every
  *     previously accepted doc/vector must still be indexed AND still
  *     discoverable by a post-race probe;
  *   - BOTH ACCEPTED SETS CORRECT: each stream's cross-batch dedup still
  *     sees exactly its own growing history.
  *
  * Plus the session-conf restore: overlapped triggers must leave
  * `spark.sql.shuffle.partitions` exactly where the session had it
  * (depth-counted restore in MicroBatchConf — interleaved save/restore
  * would otherwise pin the session at the micro-batch value forever).
  */
class ConcurrentIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  test("corpus + embedding streams race on one session without truncation or conf drift") {
    import spark.implicits._
    val work = TestFixtures.tmpDir("concurrent-ingest")
    val confKey = "spark.sql.shuffle.partitions"
    val origConf = spark.conf.get(confKey)
    // a distinctive session value: if any trigger's restore interleaves
    // wrongly, the final value will be the micro-batch 8, not this
    spark.conf.set(confKey, "17")
    try {
      // ---- corpus side: history + 4 single-file micro-batches ----
      val name = s"race_${System.nanoTime()}"
      val rnd = new scala.util.Random(41L)
      def noise(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(5000)}").mkString(" ")
      val histBody = noise(60)
      NearDupIndex.build(
        Seq((1L, histBody), (2L, noise(60))).toDF("doc_id", "text"),
        "doc_id", "text", name)

      // the file source orders micro-batches by MODIFICATION TIME, and
      // files written back-to-back tie on it (observed: f4 before f2) —
      // pin strictly increasing mtimes so batch order is the write order
      val mtimeBase = System.currentTimeMillis() - 3600000L
      def pinMtime(p: java.nio.file.Path, seq: Int): Unit =
        java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(mtimeBase + seq * 10000L))

      val corpusIn = work.resolve("corpus-in")
      java.nio.file.Files.createDirectories(corpusIn)
      var corpusSeq = 0
      def writeDocs(file: String, docs: Seq[(Long, String)]): Unit = {
        val p = java.nio.file.Files.writeString(corpusIn.resolve(file),
          docs.map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" }.mkString("\n"))
        corpusSeq += 1; pinMtime(p, corpusSeq)
      }
      val novelA = noise(60); val novelB = noise(60)
      val novelC = noise(60); val novelD = noise(60)
      writeDocs("f1.jsonl", Seq((100L, novelA), (101L, s"$novelA extra token")))
      writeDocs("f2.jsonl", Seq((200L, s"$novelA small change"), (201L, novelB)))
      writeDocs("f3.jsonl", Seq((300L, s"$histBody tail tokens"), (301L, novelC)))
      writeDocs("f4.jsonl", Seq((400L, s"$novelB another change"), (401L, novelD)))

      // ---- embedding side: IVF over testdata + 4 single-file batches ----
      val root = work.resolve("ivf").toString
      val emb = graft.runtime.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      IvfIndex.build(emb, "vec_id", "embedding", root, numCentroids = 8)
      val baseCount = spark.read.parquet(
        s"${IvfIndex.currentRoot(spark, root)}/vectors").count()

      val embIn = work.resolve("emb-in")
      java.nio.file.Files.createDirectories(embIn)
      var embSeq = 0
      def writeVecs(file: String, vecs: Seq[(Long, Array[Double])]): Unit = {
        val p = java.nio.file.Files.writeString(embIn.resolve(file),
          vecs.map { case (id, v) =>
            s"""{"vec_id": $id, "embedding": [${v.mkString(",")}]}"""
          }.mkString("\n"))
        embSeq += 1; pinMtime(p, embSeq)
      }
      val v3 = emb.filter(F.col("vec_id") === 3L)
        .head().getSeq[Float](1).map(_.toDouble).toArray
      val grnd = new scala.util.Random(43L)
      def rand() = Array.fill(64)(grnd.nextGaussian())
      val n1 = rand(); val n2 = rand(); val n3 = rand(); val n4 = rand()
      writeVecs("e1.jsonl", Seq((9000L, v3), (9001L, n1)))
      writeVecs("e2.jsonl", Seq((9100L, n1), (9101L, n2)))
      writeVecs("e3.jsonl", Seq((9200L, n2), (9201L, n3)))
      // 9300 duplicates the FIRST accepted epoch's vector — catches a
      // truncated early epoch, not just a lost latest one
      writeVecs("e4.jsonl", Seq((9300L, n1), (9301L, n4)))

      val corpusAccepted = work.resolve("corpus-accepted").toString
      val embAccepted = work.resolve("emb-accepted").toString
      // maxFilesPerTrigger=1 → 4 triggers per stream; compactEvery=2 puts
      // a compaction INSIDE the race window on both sides
      val qc = CorpusIngestStream.start(spark, corpusIn.toString, corpusAccepted,
        work.resolve("corpus-ckpt").toString, name,
        trigger = Trigger.ProcessingTime(0L), compactEvery = 2, maxFilesPerTrigger = 1)
      val qe = EmbeddingIngestStream.start(spark, embIn.toString, embAccepted,
        work.resolve("emb-ckpt").toString, root, maxCos = 0.999,
        trigger = Trigger.ProcessingTime(0L), compactEvery = 2, maxFilesPerTrigger = 1)
      try {
        val done = Future.sequence(Seq(
          Future(qc.processAllAvailable()), Future(qe.processAllAvailable())))
        Await.result(done, 10.minutes)
      } finally { qc.stop(); qe.stop() }

      // both accepted sets exactly right (cross-batch dedup held under race)
      assert(spark.read.parquet(corpusAccepted).select("doc_id").as[Long].collect().toSet
        == Set(100L, 201L, 301L, 401L))
      assert(spark.read.parquet(embAccepted).select("vec_id").as[Long].collect().toSet
        == Set(9001L, 9101L, 9201L, 9301L))

      // no truncation: every accepted doc is still indexed...
      assert(spark.table(s"${name}_counts").select("doc_id").as[Long].collect().toSet
        == Set(1L, 2L, 100L, 201L, 301L, 401L),
        "corpus index lost epochs — a fold or compaction ran as a static overwrite")
      val liveRoot = IvfIndex.currentRoot(spark, root)
      val vecIds = spark.read.parquet(s"$liveRoot/vectors")
        .filter(F.col("id") >= 9000L).select("id").as[Long].collect().toSet
      assert(vecIds == Set(9001L, 9101L, 9201L, 9301L),
        s"IVF index lost epochs under the race: $vecIds")
      assert(spark.read.parquet(s"$liveRoot/vectors").count() == baseCount + 4)

      // ...and still DISCOVERABLE: a post-race batch near-duplicating the
      // earliest surviving epoch must be dropped by the history probe
      CorpusIngestStream.processBatch(spark,
        Seq((500L, s"$novelA yet another change"), (501L, noise(60)))
          .toDF("doc_id", "text"),
        99L, corpusAccepted, name, 0.6, NearDupIndex.Config(), identity)
      assert(spark.read.parquet(corpusAccepted).select("doc_id").as[Long].collect().toSet
        == Set(100L, 201L, 301L, 401L, 501L),
        "post-race probe missed the earliest epoch — index damaged by the race")

      // overlapped triggers restored the session conf exactly
      assert(spark.conf.get(confKey) == "17",
        "interleaved trigger restores drifted the session shuffle partitions")
    } finally spark.conf.set(confKey, origConf)
  }
}
