package graft

import graft.urlkit.UrlKit
import org.scalatest.funsuite.AnyFunSuite

class UrlKitSpec extends AnyFunSuite {

  test("canonicalize: lowercases host, strips default port and fragment") {
    assert(UrlKit.canonicalize("http://HOST-001.TEST:80/page/5#frag") ==
      "http://host-001.test/page/5")
    assert(UrlKit.canonicalize("https://Example.com:443/a") == "https://example.com/a")
    assert(UrlKit.canonicalize("https://example.com:8443/a") == "https://example.com:8443/a")
  }

  test("canonicalize: sorts query params, keeps values") {
    assert(UrlKit.canonicalize("http://h.test/p?b=2&a=1") == "http://h.test/p?a=1&b=2")
    assert(UrlKit.canonicalize("http://h.test/p?z=9&z=1&a=") == "http://h.test/p?a=&z=1&z=9")
  }

  test("canonicalize: empty path becomes /") {
    assert(UrlKit.canonicalize("http://h.test") == "http://h.test/")
  }

  test("canonicalize: idempotent over the noise-variant space") {
    val hosts = Seq("a.test", "B.Test", "host-001.test")
    val ports = Seq("", ":80", ":8080")
    val paths = Seq("", "/", "/page/1", "/a/b/../c")
    val queries = Seq("", "?b=2&a=1", "?x=1")
    val frags = Seq("", "#frag")
    for (h <- hosts; p <- ports; pa <- paths; q <- queries; f <- frags) {
      val u = s"http://$h$p$pa$q$f"
      val once = UrlKit.canonicalize(u)
      assert(UrlKit.canonicalize(once) == once, s"not idempotent for $u -> $once")
    }
  }

  test("canonicalize: non-http and garbage pass through unchanged") {
    assert(UrlKit.canonicalize("mailto:x@y.z") == "mailto:x@y.z")
    assert(UrlKit.canonicalize("not a url") == "not a url")
  }

  test("xxhash64 matches Spark SQL xxhash64") {
    val spark = TestSpark.spark
    import spark.implicits._
    val samples = Seq("http://host-000.test/page/0", "", "naïve ünïcode", "a&b=c")
    val sparkHashes = samples.toDF("s")
      .selectExpr("xxhash64(s)").as[Long].collect()
    samples.zip(sparkHashes).foreach { case (s, expect) =>
      assert(UrlKit.xxhash64(s) == expect, s"mismatch for '$s'")
    }
  }

  test("jitter is deterministic and within [0.8, 1.2)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val h = rnd.nextLong(); val a = 1 + rnd.nextInt(4)
      val j = UrlKit.jitter(h, a)
      assert(j >= 0.8 && j < 1.2, s"jitter $j out of range for ($h,$a)")
      assert(j == UrlKit.jitter(h, a))
    }
  }

  test("jitter matches Scheduler.jitterCol expression") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq((123456789L, 1), (-42L, 2), (0L, 3))
    val got = rows.toDF("url_hash", "attempt")
      .select(graft.frontier.Scheduler.jitterCol(col("url_hash"), col("attempt")))
      .as[Double].collect()
    rows.zip(got).foreach { case ((h, a), j) =>
      assert(math.abs(j - UrlKit.jitter(h, a)) < 1e-12)
    }
  }

  test("canonical_url / url_host / url_path expressions agree with UrlKit") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    graft.functions.UrlFunctions.register(spark)
    val urls = Seq(
      "http://HOST-001.TEST:80/page/5#frag",
      "http://h.test/p?b=2&a=1",
      "http://h.test",
      "garbage")
    val df = urls.toDF("u")
    val viaExpr = df.select(
      graft.functions.UrlFunctions.canonical_url(col("u")),
      graft.functions.UrlFunctions.url_host(col("u")),
      graft.functions.UrlFunctions.url_path(col("u"))).collect()
    urls.zip(viaExpr).foreach { case (u, r) =>
      assert(r.getString(0) == UrlKit.canonicalize(u))
      assert(r.getString(1) == UrlKit.host(u))
      assert(r.getString(2) == UrlKit.path(u))
    }
    val viaSql = spark.sql("SELECT canonical_url('http://A.test:80/x#y')").collect()
    assert(viaSql.head.getString(0) == "http://a.test/x")
  }

  test("resolve handles relative links like the reference's urljoin") {
    assert(UrlKit.resolve("http://h.test/a/b", "c") == "http://h.test/a/c")
    assert(UrlKit.resolve("http://h.test/a/b", "/x") == "http://h.test/x")
    assert(UrlKit.resolve("http://h.test/a/", "http://other.test/z") == "http://other.test/z")
  }
}
