package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CoreQueries
import graft.streaming.WindowedAggs

class WindowedAggsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  def events = CoreQueries.events(spark, sf)

  test("tumbling windows partition time without gaps or overlaps") {
    val w = WindowedAggs.slidingCounts(events, "1 hour", "1 hour", "2 hours")
    val rows = w.collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == events.count(), "tumbling windows must cover every event exactly once")
    rows.foreach { r =>
      val span = r.getAs[java.sql.Timestamp]("window_end").getTime -
        r.getAs[java.sql.Timestamp]("window_start").getTime
      assert(span == 3600 * 1000L)
    }
  }

  test("sliding windows double-count by overlap factor") {
    val slid = WindowedAggs.slidingCounts(events, "2 hours", "1 hour", "4 hours")
    val total = slid.agg(F.sum("n")).head().getLong(0)
    assert(total == 2 * events.count(), "each event must land in exactly 2 sliding windows")
  }

  test("session_window groups by gap") {
    val s = WindowedAggs.sessionValue(events, "30 minutes", "1 hour")
    val rows = s.collect()
    assert(rows.nonEmpty)
    val perUser = events.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("user_id")).distinct.length == perUser)
    assert(rows.map(_.getAs[Long]("n_events")).sum == events.count())
  }

  test("flatMapGroupsWithState sessionization matches the lag-based batch count") {
    import spark.implicits._
    val ds = events.select(F.col("user_id"), F.col("ts"), F.col("value"))
      .as[WindowedAggs.Event]
    val sessions = WindowedAggs.sessionize(ds, gapMs = 30 * 60 * 1000L)
    // closed sessions only (state flush adds the live tail per user)
    val closed = sessions.groupBy("user_id").count()
    val batchTruth = graft.SparkEntry.queries("q19_sessionize")(spark, sf)
      .select("user_id", "n_sessions")
    val joined = closed.join(batchTruth, "user_id")
      .select(F.col("count"), F.col("n_sessions"))
      .collect()
    // the stateful op emits sessions as they CLOSE; the still-open last
    // session per user is retained in state, so closed == total - 1
    joined.foreach { r =>
      assert(r.getLong(0) == r.getLong(1) - 1,
        s"closed=${r.getLong(0)} total=${r.getLong(1)}")
    }
  }

  test("windowed agg runs as a real stream with watermark (memory sink)") {
    val work = TestFixtures.tmpDir("winstream")
    // stream the events table as parquet files
    events.limit(500).coalesce(1).write.mode("overwrite")
      .parquet(work.resolve("in").toString)
    val stream = spark.readStream
      .schema(events.schema)
      .parquet(work.resolve("in").toString)
    val agg = WindowedAggs.slidingCounts(stream, "1 hour", "1 hour", "2 hours")
    val q = agg.writeStream
      .outputMode("append")
      .format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // append mode emits only watermark-closed windows; with a finite batch
    // the final windows stay open, so we assert the query ran and the
    // closed set is consistent (every emitted window is a full hour)
    val out = spark.table("win_out").collect()
    out.foreach { r =>
      val span = r.getAs[java.sql.Timestamp]("window_end").getTime -
        r.getAs[java.sql.Timestamp]("window_start").getTime
      assert(span == 3600 * 1000L)
    }
  }
}
