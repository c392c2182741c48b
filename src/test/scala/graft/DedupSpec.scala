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

  test("hot-shingle drop bounds boilerplate buckets without changing verified values") {
    import spark.implicits._
    val boiler = "all rights reserved contact us for terms of service and licensing details"
    val rnd = new scala.util.Random(17L)
    def noise(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(5000)}").mkString(" ")
    val twinBody = noise(60)
    val corpus = Seq(
      (0L, s"$twinBody $boiler"),
      (1L, s"$twinBody extra token $boiler"), // near-dup of 0
    ) ++ (2L to 7L).map(i => (i, s"${noise(40)} $boiler")) // boilerplate-only overlap
    val df = corpus.toDF("doc_id", "text")

    val exact = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard")))
    val cooled = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5, maxDocFreq = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard")))
    // the true near-dup pair survives with an IDENTICAL exact jaccard
    assert(exact.toSet == cooled.toSet && exact.exists(p => p._1 == 0L && p._2 == 1L))

    // at a permissive threshold, boilerplate-only pairs appear in the
    // exact answer but are the (documented) recall cost of the flag
    val exactLow = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cooledLow = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.01, maxDocFreq = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactLow.contains((2L, 3L)), "boilerplate should link docs at J>=0.01")
    assert(!cooledLow.contains((2L, 3L)), "hot shingles must not generate candidates")
    assert(cooledLow.contains((0L, 1L)))

    // same flag on the LSH pipeline: verified values still exact
    val lsh = Dedup.minhashNearDupPairs(df, "doc_id", "text", 3, 0.5, maxDocFreq = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard")))
    assert(lsh.toSet == exact.toSet)
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

  test("dedupAgainst classifies a batch as exact_dup / near_dup / kept with evidence") {
    import spark.implicits._
    val rnd = new scala.util.Random(23L)
    def noise(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(5000)}").mkString(" ")
    val histBody = noise(50)
    val hist = Seq(
      (1L, histBody),
      (2L, noise(50)),
      (3L, noise(50))).toDF("doc_id", "text")
    val batch = Seq(
      (100L, histBody),                       // exact dup of 1 (same prefix too)
      (101L, s"$histBody tail extra tokens"), // near dup of 1 (and prefix-exact!)
      (102L, noise(50)))                      // novel
      .toDF("doc_id", "text")
    val out = Dedup.dedupAgainst(batch, hist, "doc_id", "text", 3, 0.6,
        TextFunctions.contentFingerprint(F.col("text")))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("verdict"), Option(r.getAs[java.lang.Long]("match_id")))).toMap
    assert(out(100L) == ("exact_dup", Some(1L)))
    assert(out(101L) == ("near_dup", Some(1L)))
    assert(out(102L) == ("kept", None))
  }

  test("NearDupIndex probe equals the direct bipartite LSH result") {
    val name = s"ndx_${System.nanoTime()}"
    val hist = docs.filter(F.col("doc_id") % 5 =!= 4)
    val batch = docs.filter(F.col("doc_id") % 5 === 4)
    graft.operators.NearDupIndex.build(hist, "doc_id", "text", name)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("shared"), r.getAs[Double]("jaccard"))).toSet
    val probed = key(graft.operators.NearDupIndex.probe(
      spark, batch, "doc_id", "text", name, 0.3))
    val direct = key(Dedup.minhashNearDupAgainst(batch, hist, "doc_id", "text", 3, 0.3))
    assert(probed == direct)
    assert(probed.nonEmpty, "fixture split produced no cross near-dups")
    // probing with a different band family than the build must throw,
    // not silently miss candidates
    val boom = intercept[IllegalArgumentException] {
      graft.operators.NearDupIndex.probe(spark, batch, "doc_id", "text", name, 0.3,
        graft.operators.NearDupIndex.Config(n = 4))
    }
    assert(boom.getMessage.contains("built with"))
  }

  test("NearDupIndex.append replay after a mid-fold crash converges — no doubled rows, no inflated jaccard") {
    import spark.implicits._
    import graft.operators.NearDupIndex
    val name = s"ndxr_${System.nanoTime()}"
    val rnd = new scala.util.Random(31L)
    def noise(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(5000)}").mkString(" ")
    val hist = Seq((1L, noise(60)), (2L, noise(60))).toDF("doc_id", "text")
    NearDupIndex.build(hist, "doc_id", "text", name)

    val newBody = noise(60)
    val batch = Seq((10L, newBody), (11L, noise(60))).toDF("doc_id", "text")
    // attempt 1 "crashes" between the counts and buckets appends…
    NearDupIndex.appendPartial(batch, "doc_id", "text", name, 0L,
      NearDupIndex.Config(), firstRelations = 2)
    // …then the batch replays with the same epoch
    NearDupIndex.append(batch, "doc_id", "text", name, 0L)

    // exactly one counts row per doc, and shingle rows are NOT doubled
    assert(spark.table(s"${name}_counts").filter($"doc_id" >= 10L).count() == 2)
    val expectedSh = Dedup.shingleTable(
      Seq((10L, newBody)).toDF("doc_id", "text"), "doc_id", "text", 3).count()
    assert(spark.table(s"${name}_shingles").filter($"doc_id" === 10L).count() == expectedSh)

    // probe of a near-dup of the replayed doc reports the exact jaccard —
    // identical to a from-scratch bipartite run over hist ∪ batch
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("shared"), r.getAs[Double]("jaccard"))).toSet
    val probeBatch = Seq((100L, s"$newBody tail tokens")).toDF("doc_id", "text")
    val probed = key(NearDupIndex.probe(spark, probeBatch, "doc_id", "text", name, 0.3))
    val direct = key(Dedup.minhashNearDupAgainst(
      probeBatch, hist.union(batch), "doc_id", "text", 3, 0.3))
    assert(probed == direct)
    assert(probed.exists(_._2 == 10L), "fixture produced no near-dup of the replayed doc")

    // a further full replay is a no-op, not an accumulation
    NearDupIndex.append(batch, "doc_id", "text", name, 0L)
    assert(spark.table(s"${name}_shingles").filter($"doc_id" === 10L).count() == expectedSh)
  }

  test("NearDupIndex.compact folds cold epochs: probe unchanged, partitions bounded, replay-idempotent") {
    import spark.implicits._
    import graft.operators.NearDupIndex
    val name = s"ndxf_${System.nanoTime()}"
    val rnd = new scala.util.Random(41L)
    def noise(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(5000)}").mkString(" ")
    val hist = Seq((1L, noise(60)), (2L, noise(60))).toDF("doc_id", "text")
    NearDupIndex.build(hist, "doc_id", "text", name)
    val bodies = (0 until 4).map(_ => noise(60))
    (0 until 4).foreach { e =>
      NearDupIndex.append(
        Seq((100L + e, bodies(e)), (200L + e, noise(60))).toDF("doc_id", "text"),
        "doc_id", "text", name, epoch = e.toLong)
    }
    def partitions(suffix: String) =
      spark.sql(s"SHOW PARTITIONS $name$suffix").collect()
        .map(_.getString(0).stripPrefix("epoch=").toLong).toSet
    assert(partitions("_buckets") == Set(-1L, 0L, 1L, 2L, 3L))

    // the probe batch near-dups a doc from a COLD epoch (1) — its
    // discoverability must survive the fold
    val probeBatch = Seq((900L, s"${bodies(1)} extra tail")).toDF("doc_id", "text")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("shared"), r.getAs[Double]("jaccard"))).toSet
    def probed() = key(NearDupIndex.probe(spark, probeBatch, "doc_id", "text", name, 0.3))
    val before = probed()
    assert(before.exists(_._2 == 101L), "fixture produced no near-dup of a cold-epoch doc")
    val shinglesBefore = spark.table(s"${name}_shingles").count()

    // epochs <= 2 fold into the build partition; epoch 3 stays hot
    NearDupIndex.compact(spark, name, upToEpoch = 2L)
    Seq("_shingles", "_counts", "_buckets").foreach { s =>
      assert(partitions(s) == Set(-1L, 3L), s"$s partitions: ${partitions(s)}")
    }
    assert(probed() == before, "compaction changed a probe answer")
    assert(spark.table(s"${name}_shingles").count() == shinglesBefore)

    // a replayed compaction converges (crash-after-full-delete regime)
    NearDupIndex.compact(spark, name, upToEpoch = 2L)
    assert(probed() == before)
    assert(spark.table(s"${name}_shingles").count() == shinglesBefore)

    // crash-MID-delete regime: the fold committed but one source epoch's
    // partitions survived — its rows now exist in BOTH the consolidated
    // partition and epoch 1, which would OVERCOUNT jaccard (doubled
    // shingle rows) if the re-run didn't fold the stragglers away
    Seq("_shingles", "_counts", "_buckets").foreach { s =>
      val t = spark.table(s"$name$s")
      val dataCols = t.columns.filter(_ != "epoch").toSeq
      // localCheckpoint severs the lineage so the insert below does not
      // read from its own target table
      val stale = t.filter(F.col("epoch") === -1L)
        .join(Seq(101L, 201L).toDF("doc_id"), "doc_id", "left_semi")
        .select(dataCols.map(F.col) :+ F.lit(1L).as("epoch"): _*)
        .localCheckpoint(true)
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try stale.write.mode("overwrite").insertInto(s"$name$s")
      finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    assert(partitions("_shingles").contains(1L), "fixture failed to plant the stale epoch")
    NearDupIndex.compact(spark, name, upToEpoch = 2L)
    assert(partitions("_shingles") == Set(-1L, 3L))
    assert(probed() == before, "mid-delete replay changed a probe answer")
    assert(spark.table(s"${name}_shingles").count() == shinglesBefore,
      "stale source rows must fold away, not double shingle counts")

    // consolidated digest still guards a compacted id; fresh ids append fine
    val boom = intercept[IllegalArgumentException] {
      NearDupIndex.append(Seq((101L, noise(60))).toDF("doc_id", "text"),
        "doc_id", "text", name, epoch = 9L)
    }
    assert(boom.getMessage.contains("unique"))
    NearDupIndex.append(Seq((500L, noise(60))).toDF("doc_id", "text"),
      "doc_id", "text", name, epoch = 9L)
    assert(partitions("_buckets") == Set(-1L, 3L, 9L))
  }

  test("NearDupIndex.append rejects a batch re-using an already-indexed doc id") {
    import spark.implicits._
    import graft.operators.NearDupIndex
    val name = s"ndxc_${System.nanoTime()}"
    val rnd = new scala.util.Random(37L)
    def noise(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(5000)}").mkString(" ")
    NearDupIndex.build(
      Seq((1L, noise(60)), (2L, noise(60))).toDF("doc_id", "text"), "doc_id", "text", name)
    // id 2 is already indexed (as a DIFFERENT doc) — appending it under a
    // new epoch would silently corrupt its jaccard; the guard throws instead
    val collide = Seq((2L, noise(60)), (30L, noise(60))).toDF("doc_id", "text")
    val boom = intercept[IllegalArgumentException] {
      NearDupIndex.append(collide, "doc_id", "text", name, 5L)
    }
    assert(boom.getMessage.contains("unique"))
    // a duplicate WITHIN one batch never reaches the cross-epoch join
    // (which excludes this epoch and so cannot see it) — the batch-
    // internal guard throws first, instead of doubling the id's shingle
    // rows inside its own epoch partition
    val intraDup = Seq((40L, noise(60)), (40L, noise(60)), (41L, noise(60)))
      .toDF("doc_id", "text")
    val intraBoom = intercept[IllegalArgumentException] {
      NearDupIndex.append(intraDup, "doc_id", "text", name, 7L)
    }
    assert(intraBoom.getMessage.contains("internally duplicated"))
    // the guard can be waived explicitly, and never blocks a same-epoch replay
    val fresh = Seq((31L, noise(60))).toDF("doc_id", "text")
    NearDupIndex.append(fresh, "doc_id", "text", name, 6L)
    NearDupIndex.append(fresh, "doc_id", "text", name, 6L) // replay: guard excludes own epoch
    assert(spark.table(s"${name}_counts").filter($"doc_id" === 31L).count() == 1)
  }

  test("tracked dedup kernels release their internal shingle caches on cleanup") {
    import spark.implicits._
    import graft.operators.NearDupIndex
    val name = s"ndxt_${System.nanoTime()}"
    val rnd = new scala.util.Random(41L)
    def noise(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(5000)}").mkString(" ")
    val hist = Seq((1L, noise(60)), (2L, noise(60))).toDF("doc_id", "text")
    NearDupIndex.build(hist, "doc_id", "text", name)
    val batch = Seq((10L, noise(60)), (11L, noise(60))).toDF("doc_id", "text")

    // a streaming caller runs these once per trigger, forever — the
    // cleanup handle must actually drop the per-call cache entries.
    // Distinct input plans, as in the real stream (pairs on the curated
    // batch, probe on its intra-deduped survivor set): identical plans
    // would be deduplicated by the CacheManager into one entry
    val (pairs, pairsCleanup) = Dedup.minhashNearDupPairsTracked(
      batch, "doc_id", "text", 3, 0.5)
    pairs.count()
    val (probed, probeCleanup) = NearDupIndex.probeTracked(
      spark, batch.filter(F.col("doc_id") >= 10L), "doc_id", "text", name, 0.5)
    probed.count()
    val before = spark.sparkContext.getPersistentRDDs.size
    pairsCleanup()
    probeCleanup()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before - 2,
      s"cleanups must unpersist the two shingle caches: $before -> $after")
  }

  test("connectedComponents labels every node with its component's min id (both tiers)") {
    import spark.implicits._
    // a chain, a pair, and a triangle; edge direction is arbitrary
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L)
    ).toDF("src", "dst")
    // smallGraphEdges = 0 forces the distributed pointer-doubling tier;
    // the default takes the driver union-find tier — labels must agree
    for (threshold <- Seq(1 << 20, 0)) {
      val cc = Dedup.connectedComponents(edges, "src", "dst", smallGraphEdges = threshold)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
      assert(cc == Map(
        1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L,
        20L -> 20L, 21L -> 20L, 22L -> 20L), s"threshold=$threshold")
    }
  }

  test("connectedComponents converges on a long path within maxIter (pointer doubling)") {
    import spark.implicits._
    // 64-node path: plain min-propagation needs 63 rounds; with pointer
    // doubling the label front collapses inside the default maxIter=25.
    // Forcing the distributed tier is the point of this test.
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val cc = Dedup.connectedComponents(edges, "src", "dst", smallGraphEdges = 0).collect()
    assert(cc.length == 64)
    assert(cc.forall(_.getAs[Long]("comp") == 0L))
  }

  test("connectedComponents falls over to the distributed tier mid-probe") {
    import spark.implicits._
    // threshold smaller than the edge list: the bounded probe overflows
    // and the distributed rounds must produce the same labels anyway
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val cc = Dedup.connectedComponents(edges, "src", "dst", smallGraphEdges = 10).collect()
    assert(cc.length == 64)
    assert(cc.forall(_.getAs[Long]("comp") == 0L))
  }

  test("connectedComponents matches local union-find on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(41L)
    val edges = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    // reference union-find with union-by-min, so roots are component minima
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    val expected = nodes.map(n => n -> find(n)).toMap
    for (threshold <- Seq(1 << 20, 0)) {
      val cc = Dedup.connectedComponents(edges.toDF("src", "dst"), "src", "dst",
          smallGraphEdges = threshold)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
      assert(cc == expected, s"threshold=$threshold")
    }
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
