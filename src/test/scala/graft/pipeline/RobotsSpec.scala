package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {

  private val txt =
    """# example policy
      |User-agent: *
      |Disallow: /private
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /doc/1
      |Allow: /doc/1$
      |Disallow: /doc/*7$
      |Disallow:
      |Crawl-delay: 5
      |""".stripMargin

  test("group selection: exact agent beats *, unknown agent falls back to *") {
    val g = Robots.parse(txt, "graftbot/1.0")
    assert(g.map(_.pattern) === Seq("/doc/1", "/doc/1$", "/doc/*7$"))
    val star = Robots.parse(txt, "randombot")
    assert(star.map(_.pattern) === Seq("/private"))
    assert(Robots.parse("", "any") === Seq.empty)
  }

  test("longest match wins; Allow wins the length tie; no match allows") {
    val rules = Robots.parse(txt, "graftbot")
    assert(!Robots.allowed(rules, "/doc/12"))   // /doc/1 prefix
    assert(Robots.allowed(rules, "/doc/1"))     // exact $-allow outranks
    assert(!Robots.allowed(rules, "/doc/7"))    // *7$ anchor
    assert(!Robots.allowed(rules, "/doc/137"))  // both disallows
    assert(Robots.allowed(rules, "/doc/23"))    // nothing matches
    assert(Robots.allowed(rules, "/"))          // empty Disallow ignored
  }

  test("wildcard and anchor semantics") {
    val r = Robots.Rule(allow = false, pattern = "/a/*/b$")
    assert(r.matches("/a/x/b"))
    assert(r.matches("/a//b"))
    assert(!r.matches("/a/x/b/c")) // $ pins the end
    val p = Robots.Rule(allow = false, pattern = "/a*c")
    assert(p.matches("/abc") && p.matches("/ac") && p.matches("/abcd"))
    assert(!p.matches("/b/ac")) // prefix-anchored
  }

  test("column kernel matches the driver kernel on generated paths") {
    import spark.implicits._
    val rules = Robots.parse(txt, "graftbot")
    val rnd = new scala.util.Random(7)
    val paths = Seq.fill(300) {
      "/doc/" + rnd.nextInt(200) + (if (rnd.nextBoolean()) "" else "/sub" + rnd.nextInt(9))
    }.distinct
    val urls = paths.map("https://ex.org" + _)
    val got = urls.toDF("url")
      .withColumn("ok", Robots.allowedCol(rules, col("url")))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    urls.zip(paths).foreach { case (u, p) =>
      assert(got(u) === Robots.allowed(rules, p), s"$p")
    }
    // pathless url defaults to '/'
    val root = Seq("https://ex.org").toDF("url")
      .select(Robots.allowedCol(rules, col("url"))).head().getBoolean(0)
    assert(root === Robots.allowed(rules, "/"))
  }

  test("crawl-delay: group-scoped, first value wins, malformed ignored") {
    val txt =
      """User-agent: *
        |Disallow: /private
        |Crawl-delay: 10
        |
        |User-agent: fastbot
        |Crawl-delay: 0.5
        |Crawl-delay: 99
        |
        |User-agent: brokenbot
        |Crawl-delay: soon
        |""".stripMargin
    assert(Robots.crawlDelay(txt, "fastbot") === Some(0.5))   // first wins
    assert(Robots.crawlDelay(txt, "unknownbot") === Some(10)) // * fallback
    assert(Robots.crawlDelay(txt, "brokenbot") === None)      // malformed dropped
    assert(Robots.crawlDelay("User-agent: *\nDisallow: /x\n", "any") === None)
    // rules unaffected by delay lines (delay ends the agent list like a rule)
    assert(Robots.parse(txt, "unknownbot").map(_.pattern) === Seq("/private"))
  }

  test("sitemap discovery: global, agent-independent, ordered, comments stripped") {
    val txt =
      """Sitemap: https://a.org/s1.xml
        |User-agent: *
        |Disallow: /
        |sitemap:   https://a.org/s2.xml   # trailing comment
        |SITEMAP: https://a.org/s1.xml
        |Sitemap:
        |""".stripMargin
    // duplicates kept, order preserved, case-insensitive key, empty dropped
    assert(Robots.sitemapUrls(txt) ===
      Seq("https://a.org/s1.xml", "https://a.org/s2.xml", "https://a.org/s1.xml"))
    assert(Robots.sitemapUrls("User-agent: *\nDisallow:\n") === Nil)
  }
}
