package graft

import graft.query.{ConfigStore, ExtractionConfig, HeuristicConfigGenerator, IntelligentCrawler}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Specs for the phase-1 selector bootstrap (ConfigGenerator), the
  * composed two-phase workflow (crawler_framework.py:209-270), and the
  * config export/import bundles (config_manager.py:333-446). */
class WorkflowSpec extends AnyFunSuite {

  private def examplePages = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq(
      (1, "<html><head><title>Alpha</title></head><body><span class=\"price\">10.5</span></body></html>"),
      (2, "<html><head><title>Beta</title><meta name=\"mfgr\" content=\"acme\"></head><body>price is 20.0 usd</body></html>"),
      (3, "<html><head><title>Gamma</title></head><body><span class=\"price\">30.0</span><div class=\"vendor\">v1</div></body></html>"),
      (4, "<html><head><title>Delta</title></head><body>price is 40 usd<div class=\"vendor\">v2</div></body></html>"),
      (5, "<html><head><title>Eps</title></head><body><div id=\"vendor\">v3</div></body></html>"))
      .toDF("id", "html")
  }
  private val fields = Seq("title", "price", "vendor", "mfgr")

  test("heuristic bootstrap: evidence-backed winners, rate confidences, losers-with-hits as fallbacks") {
    val cfg = HeuristicConfigGenerator.generate(
      examplePages, "html", fields, "boot", "d.test", Seq("t"), 7L)
    assert(cfg.name == "boot" && cfg.domain == "d.test" && cfg.tags == Seq("t")
      && cfg.createdAtMs == 7L)
    assert(cfg.selectors("title") == "title", "title tag must beat no-hit candidates")
    assert(cfg.selectors("vendor") == "css:.vendor")
    assert(cfg.selectors("mfgr") == "meta:mfgr")
    // price: bare-class (pages 1,3) ties span.class (same spans) and
    // regex (pages 2,4) at 2 hits — registry order breaks the tie toward
    // the bare class form; the tied losers chain behind it in order
    assert(cfg.selectors("price") == "css:.price")
    assert(cfg.fallbacks("price") ==
      Seq("css:span.price", "regex:price is ([0-9.]+)"))
    // vendor: bare-class wins 2 hits over the tied div.class (ord), with
    // the id form (page 5, 1 hit) trailing the chain
    assert(cfg.fallbacks("vendor") == Seq("css:div.vendor", "css:div#vendor"))
    assert(cfg.confidence("title") == 1.0)
    assert(cfg.confidence("price") == 0.4 && cfg.confidence("vendor") == 0.4)
    assert(cfg.confidence("mfgr") == 0.2)
    assert(!cfg.fallbacks.contains("title") && !cfg.fallbacks.contains("mfgr"),
      "zero-hit losers must not enter the fallback chain")
  }

  test("heuristic bootstrap on ZERO example pages: zero-confidence config, no crash") {
    val spark = TestSpark.spark
    import spark.implicits._
    val empty = Seq.empty[(Int, String)].toDF("id", "html")
    val cfg = HeuristicConfigGenerator.generate(empty, "html", fields, "empty")
    assert(cfg.selectors.keySet == fields.toSet, "every field still gets a (first-registry) selector")
    assert(cfg.confidence.values.forall(_ == 0.0), "no evidence → zero confidence")
    assert(cfg.fallbacks.isEmpty, "zero-hit losers must not enter fallback chains")
  }

  test("full two-phase workflow: bootstrap persists the config, extraction uses the STORED copy, stats line up") {
    val spark = TestSpark.spark
    import spark.implicits._
    val store = new ConfigStore(Files.createTempDirectory("wfstore").toString)
    val wf = new IntelligentCrawler(store, HeuristicConfigGenerator)
    val result = wf.fullCrawlingWorkflow(examplePages, examplePages, "html",
      fields, "wf-test", domain = "d.test", tags = Seq("wf"))
    // phase 1 persisted, and the workflow ran with the round-tripped copy
    assert(store.load("wf-test").contains(result.config))
    val byId = result.extracted
      .select("id", "title_value", "price_value", "price_method")
      .as[(Int, Option[String], Option[String], String)].collect()
      .map(r => r._1 -> r).toMap
    assert(byId(1)._2.contains("Alpha"))
    assert(byId(2)._3.contains("20.0"), "fallback chain must fill page 2's price")
    assert(byId(2)._4 == "primary", "reference quirk: fallback hits still record 'primary'")
    assert(byId(4)._3.contains("40"))
    // workflow_metadata analogue: every page extracted at least one field
    // (page 5's vendor arrives via the id-form fallback)
    assert(wf.workflowMetadata(result) == ((5L, 5L, 1.0)))
    // phase 2 alone refuses a never-bootstrapped config, like the reference
    intercept[IllegalStateException] {
      wf.crawlMultiplePages(examplePages, "html", "nope")
    }
  }

  test("config bundles: json and zip export/import round-trip, incl. hostile selector strings") {
    val a = ExtractionConfig("alpha cfg", "dom.test", Seq("t1", "t2"),
      selectors = Map(
        "price" -> "regex:p{1,\"q\\uote\nline",  // unbalanced brace, quote, backslash, newline
        "bsn" -> "a\\nb",                        // literal backslash+n (unescape-order trap)
        "ctrl" -> "c\u0001d",               // control char (\u00xx escape form)
        "weird" -> "css:.a-b"),
      confidence = Map("price" -> 0.75, "weird" -> 0.5),
      createdAtMs = 123L,
      fallbacks = Map("price" -> Seq("css:td.amount", "regex:price is ([0-9.]+)")))
    val b = ExtractionConfig("beta", "", Nil, Map("t" -> "title"), Map.empty, 456L)
    val src = new ConfigStore(Files.createTempDirectory("cfgsrc").toString)
    src.save(a); src.save(b)

    val jsonOut = Files.createTempDirectory("cfgbundle").resolve("bundle.json").toString
    val zipOut = Files.createTempDirectory("cfgbundle").resolve("bundle.zip").toString
    assert(src.exportConfigs(jsonOut, "json") == 2)
    assert(src.exportConfigs(zipOut, "zip") == 2)

    val viaJson = new ConfigStore(Files.createTempDirectory("cfgjson").toString)
    assert(viaJson.importConfigs(jsonOut, "json") == 2)
    assert(viaJson.load("alpha cfg").contains(a), "json round-trip must be exact")
    assert(viaJson.load("beta").contains(b))

    val viaZip = new ConfigStore(Files.createTempDirectory("cfgzip").toString)
    assert(viaZip.importConfigs(zipOut, "zip") == 2)
    assert(viaZip.load("alpha cfg").contains(a), "zip round-trip must be exact")
    assert(viaZip.load("beta").contains(b))
  }
}
