package graft.tools

import graft.operators.Dedup
import graft.runtime.{GraftSession, Tables}

/** Dev profiler for the MinHash/LSH pipeline stages (not part of the
  * driver contract). Usage: runMain graft.tools.ProfileDedup [sfDir]
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 3).cache()
    time("shingles")(println("n_shingles=" + sh.count()))
    val sigs = time("sigs build")(Dedup.minhashSignatures(sh, "doc_id", 64).cache())
    time("sigs count")(println("n_sigs=" + sigs.count()))
    val buckets = Dedup.lshBuckets(sigs, "doc_id", 32, 2)
    val cands = Dedup.lshCandidates(buckets, "doc_id").cache()
    time("candidates")(println("n_cands=" + cands.count()))
    val full = Dedup.minhashNearDupPairs(docs, "doc_id", "text", 3, 0.6)
    time("full pipeline")(println("n_pairs=" + full.count()))
    val sim = Dedup.simhashNearDupPairs(docs, "doc_id", "text", 3)
    time("simhash pipeline")(println("n_sim_pairs=" + sim.count()))
    spark.stop()
  }
}
