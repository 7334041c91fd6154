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

  test("model check: random append/delta/base sequences always read back the model state") {
    // seeded-random op sequence against an in-memory set model — pins the
    // merge-on-read fold (appends ∪, equality-deletes ∖, base anchors)
    // beyond the handwritten cases. Keys are (url_hash, attempt) like the
    // engine's pending rows: appended once, deleted at most once, after.
    val spark = TestSpark.spark
    import spark.implicits._
    val t = new SnapshotTable(spark, tmpDir())
    val rnd = new scala.util.Random(20260816L)
    val model = scala.collection.mutable.LinkedHashMap.empty[(Long, Int), String]
    var nextKey = 0L
    def freshRows(n: Int): Seq[(Long, Int, String)] =
      (1 to n).map { _ => nextKey += 1; (nextKey, 1 + rnd.nextInt(3), s"v$nextKey") }
        .map { case (h, a, v) => model((h, a)) = v; (h, a, v) }
    def liveSample(n: Int): Seq[(Long, Int)] =
      rnd.shuffle(model.keys.toSeq).take(n)

    freshRows(5) // initial append
    t.commit(model.toSeq.map { case ((h, a), v) => (h, a, v) }.toDF("url_hash", "attempt", "v"),
      Map.empty)
    for (step <- 1 to 12) {
      rnd.nextInt(4) match {
        case 0 => // plain append
          val rows = freshRows(1 + rnd.nextInt(4))
          t.commit(rows.toDF("url_hash", "attempt", "v"), Map.empty)
        case 1 => // delta: append fresh + delete a sample of live keys
          val dels = liveSample(rnd.nextInt(3))
          val rows = freshRows(1 + rnd.nextInt(3))
          dels.foreach(model.remove)
          t.commitDelta(rows.toDF("url_hash", "attempt", "v"),
            if (dels.nonEmpty) dels.toDF("url_hash", "attempt")
            else Seq.empty[(Long, Int)].toDF("url_hash", "attempt"),
            Map.empty)
        case 2 => // compaction
          t.commitBase(t.read().get, Map.empty)
        case 3 => // bin-pack merges (all levels): must NEVER change content
          t.mergeAppends(2 + rnd.nextInt(3))
          t.mergeMerges(2) // fires only on a full level-1 batch
          t.mergeMerges(2, level = 3) // …and only on a full level-2 batch
      }
      val got = t.read().get.select("url_hash", "attempt", "v")
        .as[(Long, Int, String)].collect().toSet
      val exp = model.toSet.map { kv: ((Long, Int), String) => (kv._1._1, kv._1._2, kv._2) }
      assert(got == exp, s"divergence at step $step: got ${got.size}, exp ${exp.size}")
    }
  }

  test("bin-pack merge commits: state preserved, sources superseded, time travel + incremental reads intact") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = new SnapshotTable(spark, tmpDir())
    for (i <- 1 to 5)
      t.commit(Seq((i.toLong, s"v$i")).toDF("url_hash", "v"), Map.empty)
    val before = t.read().get.as[(Long, String)].collect().toSet
    val dataHead = t.latestSnapshot.get
    val m1 = t.mergeAppends(3, _.coalesce(1), Map("binpack" -> 1.0))
    assert(m1.nonEmpty && t.kindOf(m1.get) == "merge")
    assert(t.read().get.as[(Long, String)].collect().toSet == before,
      "merge changed table content")
    assert(t.latestDataSnapshot.contains(dataHead),
      "merge must not advance the DATA head (covers markers depend on it)")
    assert(t.readAt(3).get.count() == 3, "time travel to pre-merge broken")
    assert(t.readBetween(0, t.latestSnapshot.get).get.count() == 5,
      "readBetween double-counted merged rows")
    assert(t.totalRows == 5, "totalRows double-counted the merge rewrite")
    // second pass packs the remainder; merge dirs are never re-merged
    val m2 = t.mergeAppends(10, _.coalesce(1))
    assert(m2.nonEmpty)
    assert(t.read().get.as[(Long, String)].collect().toSet == before)
    assert(t.mergeAppends(10).isEmpty, "re-merged already-packed dirs")
    // appends after merges fold in normally
    t.commit(Seq((6L, "v6")).toDF("url_hash", "v"), Map.empty)
    assert(t.read().get.count() == 6)
    // the live read now plans over merged dirs: 2 merge dirs + 1 append
    assert(t.read().get.inputFiles.length <= 3,
      "bin-packing did not shrink the read's file set")
  }

  test("second-level bin-pack: level-1 merges pack into a terminal level-2 merge; content/time-travel intact") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = new SnapshotTable(spark, tmpDir())
    for (i <- 1 to 8)
      t.commit(Seq((i.toLong, s"v$i")).toDF("url_hash", "v"), Map.empty)
    val before = t.read().get.as[(Long, String)].collect().toSet
    // four level-1 packs of the 8 appends
    val l1 = (1 to 4).flatMap(_ => t.mergeAppends(2, _.coalesce(1)))
    assert(l1.size == 4 && l1.forall(t.mergeLevelOf(_) == 1))
    // below a FULL batch nothing fires; at the batch size it packs all 4
    assert(t.mergeMerges(5).isEmpty, "level-2 fired below a full batch")
    val l2 = t.mergeMerges(4, _.coalesce(1), Map("binpack" -> 2.0))
    assert(l2.nonEmpty && t.kindOf(l2.get) == "merge" && t.mergeLevelOf(l2.get) == 2)
    assert(t.read().get.as[(Long, String)].collect().toSet == before,
      "level-2 merge changed table content")
    // the live read plans over ONE dir now
    assert(t.read().get.inputFiles.length == 1,
      "level-2 pack did not collapse the read's file set")
    // level-2 merges are terminal: nothing left to pack at either level
    assert(t.mergeAppends(10).isEmpty && t.mergeMerges(2).isEmpty,
      "re-packed superseded or terminal dirs")
    // time travel: before any merge sees the originals; between the
    // level-1 packs and the level-2 pack sees level-1 dirs
    assert(t.readAt(8).get.count() == 8)
    assert(t.readAt(l1.last).get.as[(Long, String)].collect().toSet == before)
    // incremental/cardinality contracts ignore rewrites at every level
    assert(t.readBetween(0, t.latestSnapshot.get).get.count() == 8)
    assert(t.totalRows == 8)
    // appends after a level-2 pack fold in and can start a new cycle
    t.commit(Seq((9L, "v9")).toDF("url_hash", "v"), Map.empty)
    assert(t.read().get.count() == 9)
    assert(t.mergeAppends(10).isEmpty, "a single new append must not pack alone")
  }

  test("third-level bin-pack: full level-2 batches pack into level-3; rewrite bound and content hold") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = new SnapshotTable(spark, tmpDir())
    for (i <- 1 to 8)
      t.commit(Seq((i.toLong, s"v$i")).toDF("url_hash", "v"), Map.empty)
    val before = t.read().get.as[(Long, String)].collect().toSet
    val l1 = (1 to 4).flatMap(_ => t.mergeAppends(2, _.coalesce(1)))
    assert(l1.size == 4)
    val l2 = (1 to 2).flatMap(_ => t.mergeMerges(2, _.coalesce(1)))
    assert(l2.size == 2 && l2.forall(t.mergeLevelOf(_) == 2))
    // below a full level-2 batch nothing fires; at the batch size it packs
    assert(t.mergeMerges(3, level = 3).isEmpty, "level-3 fired below a full batch")
    val l3 = t.mergeMerges(2, _.coalesce(1), Map("binpack" -> 3.0), level = 3)
    assert(l3.nonEmpty && t.mergeLevelOf(l3.get) == 3)
    assert(t.read().get.as[(Long, String)].collect().toSet == before,
      "level-3 merge changed table content")
    assert(t.read().get.inputFiles.length == 1,
      "level-3 pack did not collapse the read's file set")
    // terminal at the configured top level: nothing repacks at any level
    assert(t.mergeAppends(10).isEmpty && t.mergeMerges(2).isEmpty &&
      t.mergeMerges(2, level = 3).isEmpty, "re-packed superseded or terminal dirs")
    // time-travel / incremental / cardinality contracts hold through 3 levels
    assert(t.readAt(8).get.count() == 8)
    assert(t.readAt(l2.last).get.as[(Long, String)].collect().toSet == before)
    assert(t.readBetween(0, t.latestSnapshot.get).get.count() == 8)
    assert(t.totalRows == 8)
    // rewrite bound: every original row's bytes were rewritten exactly
    // 3 times (once per level) — count data dirs ever created
    val merges = (l1 ++ l2 ++ l3)
    assert(merges.size == 7, s"expected 4+2+1 merge commits, got ${merges.size}")
  }

  test("partitioned layout: round-trip, partition pruning, lineage, scheme stickiness") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = new SnapshotTable(spark, tmpDir())
    def rows(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, (i % 4).toInt, s"v$i")).toDF("seq", "bucket", "v")
    t.commit(rows(1, 100), Map.empty, Some("seq"), partitionBy = Seq("bucket"))
    t.commit(rows(101, 200), Map.empty, Some("seq"), partitionBy = Seq("bucket"))
    assert(t.partitionScheme == Seq("bucket"))
    // full read unions both partitioned commits and restores the column
    val all = t.read().get
    assert(all.count() == 200)
    assert(all.columns.contains("bucket"))
    assert(all.select("seq", "bucket").as[(Long, Int)].collect()
      .forall { case (s, b) => b == (s % 4).toInt })
    // a bucket restriction prunes PARTITIONS (not just row groups)
    val plan = all.filter($"bucket".isin(1, 3)).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"no partition filter in:\n$plan")
    assert(all.filter($"bucket".isin(1, 3)).count() == 100)
    // footer lineage walked the bucket=K subdirs: counts + seq range intact
    val l = t.manifests().get.selectExpr("explode(lineage) as l")
      .selectExpr("sum(l.n_rows) as n", "min(l.min_seq) as mn", "max(l.max_seq) as mx")
      .collect().head
    assert(l.getLong(0) == 200L && l.getLong(1) == 1L && l.getLong(2) == 200L)
    // the layout is a TABLE property: a later commit requesting a
    // DIFFERENT scheme (or none) still writes the established one —
    // Spark cannot union flat and partitioned dirs in a single read
    t.commit(rows(201, 220), Map.empty, Some("seq"))
    assert(t.partitionScheme == Seq("bucket"))
    assert(t.read().get.count() == 220)
    // and a flat table ignores a late partitioning request the same way
    val flat = new SnapshotTable(spark, tmpDir())
    flat.commit(rows(1, 10), Map.empty, Some("seq"))
    flat.commit(rows(11, 20), Map.empty, Some("seq"), partitionBy = Seq("bucket"))
    assert(flat.partitionScheme.isEmpty)
    assert(flat.read().get.count() == 20)
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
