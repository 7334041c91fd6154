package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("every registered query runs and every query has a name-matched oracle or none") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.count() // forces execution
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01 pricing summary groups are complete and sums positive") {
    val rows = SparkEntry.queries("q01_pricing_summary")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("q08 per-group top-k never exceeds k=3 and ranks are 1-based") {
    val rows = SparkEntry.queries("q08_topk_per_group")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => { val rk = r.getAs[Int]("rk"); rk >= 1 && rk <= 3 }))
  }

  test("q09 sliding window count never exceeds frame size 50") {
    val rows = SparkEntry.queries("q09_sliding_window")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("win_n") <= 50L))
  }

  test("q11 type coercion round-trips money and dates") {
    val rows = SparkEntry.queries("q11_type_coercion")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("total_amount") > 0))
  }

  test("q12 clean_field_name output is lowercase word chars + underscores only") {
    val rows = SparkEntry.queries("q12_clean_field_name")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("field_name").matches("[a-z0-9_]+")))
  }

  test("oracle SQL map keys are a subset of query keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
