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

  test("streaming frontier dedup: a URL admitted once is never re-admitted across batches") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, java.sql.Timestamp)]
    val cands = input.toDF().toDF("url_hash", "url", "host", "ts")
    val q = Streams.frontierDedup(cands).writeStream
      .format("memory").queryName("frontier_stream").outputMode("append").start()
    try {
      def row(h: Long, sec: Int) =
        (h, s"http://a.test/$h", "a.test", java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$sec%02d"))
      input.addData(row(1, 1), row(2, 1), row(1, 2)) // dup within batch
      q.processAllAvailable()
      input.addData(row(2, 3), row(3, 3)) // dup ACROSS batches + one new
      q.processAllAvailable()
      val got = spark.table("frontier_stream").select("url_hash")
        .as[Long].collect().sorted
      assert(got.toSeq == Seq(1L, 2L, 3L),
        s"stateful dedup failed: ${got.toSeq} (dups re-admitted or rows lost)")
    } finally q.stop()
  }

  test("streaming frontier dedup evicts state past the watermark: rediscovery re-admits (recrawl-after-TTL)") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, java.sql.Timestamp)]
    val cands = input.toDF().toDF("url_hash", "url", "host", "ts")
    val q = Streams.frontierDedup(cands, watermark = "10 minutes").writeStream
      .format("memory").queryName("frontier_ttl").outputMode("append").start()
    try {
      def row(h: Long, t: String) =
        (h, s"http://a.test/$h", "a.test", java.sql.Timestamp.valueOf(t))
      input.addData(row(1, "2026-01-01 00:00:00"))
      q.processAllAvailable()
      // push the watermark far past key 1's horizon, then rediscover it
      input.addData(row(2, "2026-01-01 01:00:00"))
      q.processAllAvailable()
      input.addData(row(1, "2026-01-01 01:00:01"))
      q.processAllAvailable()
      val ones = spark.table("frontier_ttl")
        .filter(org.apache.spark.sql.functions.col("url_hash") === 1).count()
      assert(ones == 2, s"expected TTL re-admission of key 1 (got $ones occurrence(s))")
    } finally q.stop()
  }

  test("streaming per-host admissions: tumbling-window counts over the deduped stream") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, java.sql.Timestamp)]
    val cands = input.toDF().toDF("url_hash", "url", "host", "ts")
    val q = Streams.hostAdmissions(Streams.frontierDedup(cands))
      .writeStream.format("memory").queryName("admissions")
      .outputMode("complete").start()
    try {
      def row(h: Long, host: String, min: Int) =
        (h, s"http://$host/$h", host, java.sql.Timestamp.valueOf(f"2026-01-01 00:$min%02d:00"))
      input.addData(row(1, "a.test", 0), row(2, "a.test", 0), row(2, "a.test", 0),
        row(3, "b.test", 0), row(4, "a.test", 1))
      q.processAllAvailable()
      val got = spark.table("admissions")
        .select("host", "n_admitted").as[(String, Long)].collect().sorted
      assert(got.toSeq == Seq(("a.test", 1L), ("a.test", 2L), ("b.test", 1L)),
        s"unexpected admissions: ${got.toSeq}")
    } finally q.stop()
  }
}
