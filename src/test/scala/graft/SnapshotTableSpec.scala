package graft

import graft.table.SnapshotTable
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SnapshotTableSpec extends AnyFunSuite {
  private def tmpDir(): String =
    Files.createTempDirectory("snaptest").toString

  test("commit/read round-trip, append semantics, time travel") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = new SnapshotTable(spark, tmpDir())
    assert(t.read().isEmpty && t.latestSnapshot.isEmpty)

    val s1 = t.commit(Seq((1L, "a"), (2L, "b")).toDF("seq", "v"), Map("n" -> 2.0), Some("seq"))
    val s2 = t.commit(Seq((3L, "c")).toDF("seq", "v"), Map("n" -> 1.0), Some("seq"))
    assert(s1 == 1 && s2 == 2)
    assert(t.read().get.count() == 3)
    assert(t.readAt(1).get.count() == 2) // time travel
    assert(t.snapshots == Seq(1L, 2L))
  }

  test("orphan data files (crash before manifest) are invisible; next commit resumes cleanly") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = new SnapshotTable(spark, tmpDir())
    t.commit(Seq((1L, "a")).toDF("seq", "v"), Map.empty, Some("seq"))
    t.writeOrphan(Seq((99L, "ghost")).toDF("seq", "v")) // crash simulation
    assert(t.read().get.count() == 1, "orphan leaked into a read")
    assert(t.latestSnapshot.contains(1L))
  }

  test("delta commits: equality-deletes remove earlier rows; same-commit appends survive") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = new SnapshotTable(spark, tmpDir())
    t.commit(Seq((10L, 1, "a"), (20L, 1, "b"), (30L, 1, "c")).toDF("url_hash", "attempt", "v"),
      Map.empty)
    // delete (10,1) and (20,1); append (20,2) under the same manifest —
    // the (hash, attempt) keying means the appended row is NOT deleted
    val r = t.commitDelta(
      append = Seq((20L, 2, "b2")).toDF("url_hash", "attempt", "v"),
      deleteKeys = Seq((10L, 1), (20L, 1)).toDF("url_hash", "attempt"),
      metrics = Map.empty, covers = Some(7L))
    assert(r.id == 2 && r.rows == 1)
    val got = t.read().get.select("url_hash", "attempt").as[(Long, Int)].collect().toSet
    assert(got == Set((30L, 1), (20L, 2)))
    assert(t.coversOf(2).contains(7L) && t.latestCovers.contains(7L))
    // time travel to before the delta still sees all three originals
    assert(t.readAt(1).get.count() == 3)
  }

  test("base commit (compaction) anchors reads; later deltas still apply; time travel preserved") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = new SnapshotTable(spark, tmpDir())
    t.commit(Seq((1L, 1, "a"), (2L, 1, "b")).toDF("url_hash", "attempt", "v"), Map.empty)
    t.commitDelta(Seq((3L, 1, "c")).toDF("url_hash", "attempt", "v"),
      Seq((1L, 1)).toDF("url_hash", "attempt"), Map.empty)
    // compact: state should now be {(2,1),(3,1)} in a single base
    val state = t.read().get
    val base = t.commitBase(state, Map.empty, covers = Some(2L))
    assert(base.rows == 2 && t.kindOf(base.id) == "base")
    assert(t.read().get.count() == 2)
    // pre-compaction deletes must NOT re-apply to the base rewrite
    val got = t.read().get.select("url_hash").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
    // a delta after the base applies on top of it
    t.commitDelta(Seq((4L, 1, "d")).toDF("url_hash", "attempt", "v"),
      Seq((2L, 1)).toDF("url_hash", "attempt"), Map.empty)
    assert(t.read().get.select("url_hash").as[Long].collect().toSet == Set(3L, 4L))
    // time travel to snapshot 2 (pre-base) replays the original fold
    assert(t.readAt(2).get.select("url_hash").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("footer-based lineage matches data for multi-file commits") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = new SnapshotTable(spark, tmpDir())
    t.commit((1L to 1000L).map(i => (i, s"v$i")).toDF("seq", "v").repartition(4),
      Map.empty, Some("seq"))
    val m = t.manifests().get
    val l = m.selectExpr("explode(lineage) as l")
      .selectExpr("sum(l.n_rows) as n", "min(l.min_seq) as mn", "max(l.max_seq) as mx")
      .collect().head
    assert(l.getLong(0) == 1000L)
    assert(l.getLong(1) == 1L && l.getLong(2) == 1000L)
  }

  test("manifests expose metrics and per-partition lineage") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = new SnapshotTable(spark, tmpDir())
    t.commit((1L to 100L).map(i => (i, s"v$i")).toDF("seq", "v"),
      Map("fetched_ok" -> 100.0, "failed" -> 0.0), Some("seq"))
    val m = t.manifests().get
    val row = m.selectExpr("snapshot_id", "metrics.fetched_ok",
      "size(lineage) as nparts").collect().head
    assert(row.getLong(0) == 1L)
    assert(row.getDouble(1) == 100.0)
    assert(row.getInt(2) >= 1)
    // lineage row counts sum to the committed row count
    val total = m.selectExpr("explode(lineage) as l").selectExpr("sum(l.n_rows)")
      .collect().head.getLong(0)
    assert(total == 100L)
  }
}
