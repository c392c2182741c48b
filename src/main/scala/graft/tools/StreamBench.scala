package graft.tools

import java.nio.file.{Files, Paths}
import java.time.{LocalDate, LocalDateTime, ZoneOffset}

import scala.util.Random

import graft.runtime.GraftSession
import graft.streaming.{BronzeStream, ScoringStream}

/** Streaming throughput benchmark against the reference's headline
  * numbers (BASELINE.md: 200-500 tx per 10 s micro-batch ≈ 20-50 tx/s
  * sustained on the CDC→bronze path; <1 s insert→alert on scoring).
  * Generates N Debezium envelopes, drives both streaming jobs with
  * processAllAvailable, prints one JSON line with tx/s per leg.
  *
  * Usage: runMain graft.tools.StreamBench [nRows]
  */
object StreamBench {

  private def envelope(rnd: Random, i: Int): String = {
    val ts = LocalDateTime.of(2024, 3, 1 + rnd.nextInt(20), rnd.nextInt(24), rnd.nextInt(60), 0)
    val us = ts.toInstant(ZoneOffset.UTC).toEpochMilli * 1000L
    val lat = 30 + rnd.nextDouble() * 15
    val lon = -120 + rnd.nextDouble() * 40
    val amt = math.round(rnd.nextDouble() * 900 * 100) / 100.0
    s"""{"after": {"trans_date_trans_time": "$us", "cc_num": "${100000L + rnd.nextInt(5000)}",
       | "merchant": "fraud_M${rnd.nextInt(50)}", "category": "misc_net", "amt": $amt,
       | "first": "B", "last": "U", "gender": "F", "street": "1 St", "city": "Austin",
       | "state": "TX", "zip": "73301", "lat": $lat, "long": $lon, "city_pop": "500000",
       | "job": "E", "dob": "${LocalDate.of(1980, 1, 1).toEpochDay}",
       | "trans_num": "SB_$i", "unix_time": "${us / 1000000L}",
       | "merch_lat": ${lat + 0.5}, "merch_long": ${lon + 0.5}, "is_fraud": "0"}}"""
      .stripMargin.replaceAll("\n", "")
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(60000)
    val spark = GraftSession.get("stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    val work = Paths.get("/tmp", s"graft-streambench-${System.nanoTime()}")
    val in = work.resolve("in")
    Files.createDirectories(in)
    val rnd = new Random(42L)
    // several files so maxFilesPerTrigger paces like Kafka partitions
    (0 until 10).foreach { f =>
      val lines = (0 until n / 10).map(i => envelope(rnd, f * (n / 10) + i))
      Files.write(in.resolve(f"part$f%02d.jsonl"), String.join("\n", lines: _*).getBytes("UTF-8"))
    }

    def timed(label: String)(run: => Unit): Double = {
      val t0 = System.nanoTime()
      run
      val sec = (System.nanoTime() - t0) / 1e9
      sec
    }

    val bronzeSec = timed("bronze") {
      val q = BronzeStream.start(spark, in.toString,
        work.resolve("bronze").toString, work.resolve("ckpt-b").toString)
      q.processAllAvailable(); q.stop()
    }
    val bronzeRows = spark.read.parquet(work.resolve("bronze").toString).count()

    val scoreSec = timed("score") {
      val q = ScoringStream.start(spark, in.toString,
        work.resolve("preds").toString, work.resolve("alerts").toString,
        work.resolve("ckpt-s").toString)
      q.processAllAvailable(); q.stop()
    }
    val predRows = spark.read.parquet(work.resolve("preds").toString).count()

    println(
      s"""{"metric":"stream_throughput","unit":"tx_per_sec",""" +
        s""""bronze_rows":$bronzeRows,"bronze_sec":$bronzeSec,""" +
        s""""bronze_tx_per_sec":${(bronzeRows / bronzeSec).toLong},""" +
        s""""score_rows":$predRows,"score_sec":$scoreSec,""" +
        s""""score_tx_per_sec":${(predRows / scoreSec).toLong},""" +
        s""""baseline_tx_per_sec":"20-50 (BASELINE.md streaming throughput)"}""")
    spark.stop()
  }
}
