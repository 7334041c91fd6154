package graft

import graft.streaming.Streams
import graft.streaming.Streams.FetchOutcome
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("file-source streaming windowed agg matches the batch q32 result") {
    val spark = TestSpark.spark
    import spark.implicits._
    // streaming file sources need a directory; the testdata table is a file
    val streamDir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = Streams.windowedEventCounts(Streams.ingest(spark, streamDir.toString))
    val q = stream.writeStream
      .format("memory").queryName("winagg").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("winagg")
        .select("hour_start", "event_type", "n", "total")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      val batch = SparkEntry.queries("q32_stream_window")(spark, sfDir)
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stateful per-host adaptive delay follows the reference controller rules") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FetchOutcome]
    val q = Streams.adaptiveDelays(input.toDS()).writeStream
      .format("memory").queryName("delays").outputMode("update").start()
    try {
      // batch 1: all ok on fast.test -> aggressive (500 * 0.8)
      input.addData((1 to 20).map(_ => FetchOutcome("fast.test", ok = true, blocked = false)): _*)
      q.processAllAvailable()
      val d1 = spark.table("delays").as[Streams.HostDelay].collect()
        .filter(_.host == "fast.test").last
      assert(math.abs(d1.delayMs - 400.0) < 1e-9, s"expected 400, got ${d1.delayMs}")

      // batch 2: heavy failures on slow.test -> conservative (500 * 1.5)
      input.addData((1 to 20).map(i => FetchOutcome("slow.test", ok = i % 2 == 0, blocked = i % 3 == 0)): _*)
      q.processAllAvailable()
      val d2 = spark.table("delays").as[Streams.HostDelay].collect()
        .filter(_.host == "slow.test").last
      assert(math.abs(d2.delayMs - 750.0) < 1e-9, s"expected 750, got ${d2.delayMs}")

      // more good batches keep shrinking fast.test toward the floor
      (1 to 12).foreach { _ =>
        input.addData((1 to 10).map(_ => FetchOutcome("fast.test", ok = true, blocked = false)): _*)
      }
      q.processAllAvailable()
      val d3 = spark.table("delays").as[Streams.HostDelay].collect()
        .filter(_.host == "fast.test").last
      assert(d3.delayMs >= Streams.MinDelayMs && d3.delayMs < 400.0)
    } finally q.stop()
  }
}
