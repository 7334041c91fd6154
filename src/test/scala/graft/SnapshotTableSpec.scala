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
