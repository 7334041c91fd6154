package graft

import graft.query.{ConfigStore, ExtractionConfig, RuleExtractor}
import graft.queries.{Extraction, TrainingData}
import graft.sinks.Sinks
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the config-driven extraction executor (rule_parser.py:62-201
  * semantics), the extended config store, the XML sink, and IVF nprobe. */
class ExtractionSpec extends AnyFunSuite {

  test("fallback precedence: primary wins when present; fallbacks tried in order") {
    val spark = TestSpark.spark
    import spark.implicits._
    val cfg = ExtractionConfig("t", "d", Nil,
      selectors = Map("price" -> "css:span.price"),
      confidence = Map("price" -> 0.8), createdAtMs = 0L,
      fallbacks = Map("price" -> Seq("css:td.amount", "regex:price is ([0-9.]+)")))
    val pages = Seq(
      (1, "<span class=\"price\">10</span><td class=\"amount\">20</td>price is 30"),
      (2, "<td class=\"amount\">20</td>price is 30"),
      (3, "price is 30 usd"),
      (4, "nothing here")).toDF("id", "html")
    val got = RuleExtractor.extract(pages, "html", cfg)
      .select("id", "price_value", "price_method", "price_confidence")
      .as[(Int, Option[String], String, Double)].collect().sortBy(_._1)
    assert(got(0) == ((1, Some("10"), "primary", 0.8)), "primary must beat fallbacks")
    assert(got(1) == ((2, Some("20"), "primary", 0.8)), "first fallback (reference quirk: method still 'primary')")
    assert(got(2) == ((3, Some("30"), "primary", 0.8)), "second fallback")
    assert(got(3) == ((4, None, "fallback", 0.8)), "all-miss records method 'fallback' (rule_parser.py:115-119)")
  }

  test("selector forms: title, meta, css tag/class/id, regex; inner tags stripped like get_text") {
    val spark = TestSpark.spark
    import spark.implicits._
    val html = """<html><head><title> The <b>Title</b> </title>
      |<meta name="author" content="ada"></head>
      |<body><div id="main">Main</div><p>para</p></body></html>""".stripMargin
    val df = Seq((1, html)).toDF("id", "html")
    def one(sel: String): Option[String] = {
      val cfg = ExtractionConfig("t", "d", Nil, Map("f" -> sel), Map.empty, 0L)
      RuleExtractor.extract(df, "html", cfg).select("f_value")
        .as[Option[String]].collect().head
    }
    assert(one("title").contains("The Title"))
    assert(one("meta:author").contains("ada"))
    assert(one("css:div#main").contains("Main"))
    assert(one("css:p").contains("para"))
    assert(one("regex:<p>(\\w+)</p>").contains("para"))
    assert(one("css:div.absent").isEmpty)
  }

  test("config store round-trips fallback chains") {
    val dir = java.nio.file.Files.createTempDirectory("cfgstore").toString
    val store = new ConfigStore(dir)
    val cfg = Extraction.demoConfig
    store.save(cfg)
    val back = store.load(cfg.name).get
    assert(back.selectors == cfg.selectors)
    assert(back.fallbacks == cfg.fallbacks, "fallback chains lost in round-trip")
    assert(back.confidence == cfg.confidence)
  }

  test("config store survives '}' inside selector values (regex quantifiers)") {
    val dir = java.nio.file.Files.createTempDirectory("cfgstore2").toString
    val store = new ConfigStore(dir)
    val cfg = ExtractionConfig("braces", "d", Nil,
      selectors = Map("amount" -> "regex:([0-9]{1,5}\\.[0-9]{2})"),
      confidence = Map("amount" -> 0.7), createdAtMs = 1L,
      fallbacks = Map("amount" -> Seq("regex:\\$([0-9]{3,})", "css:td.amount")))
    store.save(cfg)
    val back = store.load("braces").get
    assert(back.selectors == cfg.selectors, s"selectors mangled: ${back.selectors}")
    assert(back.fallbacks == cfg.fallbacks, s"fallbacks mangled: ${back.fallbacks}")
  }

  test("XML sink: every part well-formed, records complete, text escaped") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1, "a&b", "x<y>z"), (2, "plain", null.asInstanceOf[String]))
      .toDF("id", "name", "note").repartition(2)
    val base = java.nio.file.Files.createTempDirectory("xmlsink").toString
    val out = Sinks.exportXml(df, base, "recs", stampMs = 1L)
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(out))
    val parts = try {
      import scala.jdk.CollectionConverters._
      files.iterator().asScala.filter(_.getFileName.toString.startsWith("part-")).toSeq
    } finally files.close()
    assert(parts.nonEmpty)
    var records = 0
    parts.foreach { p =>
      val text = new String(java.nio.file.Files.readAllBytes(p))
      // well-formed: the JDK parser must accept every part document
      val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder()
        .parse(new java.io.ByteArrayInputStream(text.getBytes("UTF-8")))
      assert(doc.getDocumentElement.getTagName == "records")
      records += doc.getElementsByTagName("record").getLength
    }
    assert(records == 2, s"expected 2 records across parts, got $records")
    val all = parts.map(p => new String(java.nio.file.Files.readAllBytes(p))).mkString
    assert(all.contains("a&amp;b") && all.contains("x&lt;y&gt;z"), "xml escaping missing")
  }

  test("IVF nprobe: probed-list search ⊆ corpus; nprobe=K equals exact brute force; nprobe=2 recalls most") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val exact = TrainingData.q26CosineTopk(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    val allLists = TrainingData.q48IvfNprobe(spark, dir, nprobe = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(allLists == exact, "nprobe = K must degenerate to exact brute force")
    val probed2 = TrainingData.q48IvfNprobe(spark, dir, nprobe = 2)
      .select("vec_id").as[Long].collect().toSet
    val recall = (probed2 & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"nprobe=2 recall $recall too low — probing is broken")
    assert(probed2.size == exact.size, "probed search must still fill top-k")
  }
}
