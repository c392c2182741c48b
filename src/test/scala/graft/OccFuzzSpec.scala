package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.layers.{AtomicAppend, OccTable, ProtocolAudit}

/** Seeded random-walk battery over the optimistic-commit protocol: a
  * shuffled command sequence (append / compact / deleteWhere /
  * updateWhere) drives one [[OccTable]] while an in-memory MODEL tracks
  * the rows every commit should have left; after every step the adopted
  * tip must digest-equal the model, and at the end every logged version
  * must time-travel to the state recorded when it committed. The same
  * determinism bar FoldFuzzSpec holds for the single-maintainer folds,
  * here for the OCC surface — any allocation, rebase, or visibility bug
  * that survives a random interleave fails with the command trace.
  */
class OccFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()
  import spark.implicits._

  private def digest(df: DataFrame) = ProtocolAudit.digest(df)

  test("random op walks: tip ≡ model at every step, every version time-travels") {
    for (seed <- Seq(11L, 47L, 93L)) {
      val rnd = new scala.util.Random(seed)
      val path = TestFixtures.tmpDir(s"occ-fuzz-$seed").toString
      OccTable.create(spark, path)
      // model: the table's rows as (id, v) pairs
      var model = Vector.empty[(Long, Long)]
      val states = scala.collection.mutable.ArrayBuffer.empty[(Long, Vector[(Long, Long)])]
      var nextKey = 0L
      def df(rows: Seq[(Long, Long)]) = rows.toDF("id", "v")
      def record(version: Long): Unit = states += ((version, model))
      val trace = scala.collection.mutable.ArrayBuffer.empty[String]

      // seed commit: the walk's read-after-step contract needs a table
      val seedRows = (0 until 30).map(i => (nextKey + i, rnd.nextInt(1000).toLong))
      nextKey += 30
      val (_, v0) = OccTable.append(df(seedRows), path, statsCols = Seq("id"))
      model = model ++ seedRows
      trace += s"seed->v$v0"; record(v0)

      (0 until 14).foreach { step =>
        rnd.nextInt(5) match {
          case 0 | 1 => // append 20-60 fresh rows
            val n = 20 + rnd.nextInt(41)
            val rows = (0 until n).map(i => (nextKey + i, rnd.nextInt(1000).toLong))
            nextKey += n
            val (_, v) = OccTable.append(df(rows), path, statsCols = Seq("id"))
            model = model ++ rows
            trace += s"append($n)->v$v"; record(v)
          case 2 => // compact
            OccTable.compact(spark, path).foreach { case (_, v) =>
              trace += s"compact->v$v"; record(v)
            }
          case 3 => // delete an id range
            if (model.nonEmpty) {
              val lo = model(rnd.nextInt(model.size))._1
              val hi = lo + 1 + rnd.nextInt(30)
              val (_, _, v) = OccTable.deleteWhere(spark, path,
                F.col("id") >= lo && F.col("id") < hi)
              if (v >= 0) {
                model = model.filterNot { case (id, _) => id >= lo && id < hi }
                trace += s"delete[$lo,$hi)->v$v"; record(v)
              }
            }
          case 4 => // update a value band
            if (model.nonEmpty) {
              val cut = rnd.nextInt(1000).toLong
              val (_, _, v) = OccTable.updateWhere(spark, path,
                F.col("v") >= cut, Map("v" -> F.lit(-1L)))
              if (v >= 0) {
                model = model.map { case (id, vv) => (id, if (vv >= cut) -1L else vv) }
                trace += s"update[v>=$cut]->v$v"; record(v)
              }
            }
        }
        val want = digest(df(model))
        val got = digest(OccTable.read(spark, path))
        assert(got == want,
          s"seed $seed step $step diverged after: ${trace.mkString(" ")}")
      }

      // every committed version reconstructs its recorded state
      states.foreach { case (v, m) =>
        assert(digest(OccTable.readAsOf(spark, path, v)) == digest(df(m)),
          s"seed $seed: version $v drifted (trace: ${trace.mkString(" ")})")
      }
      // ids never reused across the whole history
      val allIds = OccTable.history(spark, path).flatMap(_._2)
      val f = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      allIds.distinct.foreach { id =>
        assert(f.exists(new org.apache.hadoop.fs.Path(s"$path/_batch=$id")),
          s"seed $seed: logged batch $id missing on disk")
      }
    }
  }
}
