package graft

import graft.enrich.{Enricher, HtmlFetcher}

/** Hermetic HtmlFetcher coverage: canned fixture HTML for both reference
  * layouts (showcase / traditional), an invalid page, and a layoutless
  * page — no network (the transport is a Map lookup). End-to-end through
  * Enricher.enrich to prove the fetcher slots into the pipeline seam.
  */
class HtmlFetcherSpec extends SparkSuite {

  private val showcasePage =
    """<html><head><title>Specimen 42 | Showcase Media | Repo</title></head>
      |<body>
      |  <div class="panel">
      |    <div class="showcase-label">Media type</div>
      |    <div class="showcase-value">Mesh</div>
      |    <div class="showcase-label">Media ID</div>
      |    <div class="showcase-value">000123456</div>
      |    <div class="showcase-label">Object Taxonomy</div>
      |    <div class="showcase-value">Panthera &amp; leo
      |second line ignored</div>
      |    <div class="showcase-label">Creator</div>
      |    <div class="showcase-value">  Dr. A  </div>
      |  </div>
      |</body></html>""".stripMargin

  private val traditionalPage =
    """<html><head><title>Showcase Media — Specimen 7</title></head>
      |<body>
      |  <div class="field-name">Media type</div>
      |  <div class="field-value">Volumetric Image Series</div>
      |  <div class="field-name">Media ID</div>
      |  <div class="field-value">7890</div>
      |  <div class="field-name">Slice Thickness</div>
      |  <div class="field-value">0.05mm</div>
      |</body></html>""".stripMargin

  // values with NESTED markup — a real MorphoSource page wraps values in
  // icons/links; the depth-counting scan must take the whole sibling div
  private val nestedPage =
    """<html><head><title>Showcase Media — Specimen 9</title></head>
      |<body>
      |  <div class="field-name">Media type</div>
      |  <div class="field-value">Mesh</div>
      |  <div class="field-name">Media ID</div>
      |  <div class="field-value"><span class="mono">42</span><a href="/m/42">-link</a></div>
      |  <div class="field-name">Creator</div>
      |  <div class="field-value"><div><div>Dr. <b>B</b></div></div> et al.</div>
      |</body></html>""".stripMargin

  private val notMediaPage =
    "<html><head><title>Login required</title></head><body></body></html>"

  private val layoutlessPage =
    """<html><head><title>Showcase Media</title></head>
      |<body><div class="other">Media type</div><div>Mesh</div></body></html>""".stripMargin

  private val pages = Map(
    "http://fixture/showcase" -> showcasePage,
    "http://fixture/traditional" -> traditionalPage,
    "http://fixture/nested" -> nestedPage,
    "http://fixture/error" -> notMediaPage,
    "http://fixture/layoutless" -> layoutlessPage)

  private def fetcher = new HtmlFetcher(pages(_))

  test("showcase layout: media type + fields extracted, entities unescaped, first line only") {
    val f = fetcher.fetch("http://fixture/showcase")
    assert(f("Media Type") === "Mesh")
    assert(f("Media ID") === "000123456")
    assert(f("Object Taxonomy") === "Panthera & leo") // first text line only
    assert(f("Creator") === "Dr. A") // trimmed
  }

  test("traditional layout: field-name/field-value pairs extracted") {
    val f = fetcher.fetch("http://fixture/traditional")
    assert(f("Media Type") === "Volumetric Image Series")
    assert(f("Media ID") === "7890")
    assert(f("Slice Thickness") === "0.05mm")
  }

  test("nested markup inside value divs is extracted whole, not truncated") {
    val f = fetcher.fetch("http://fixture/nested")
    assert(f("Media Type") === "Mesh")
    // span + anchor inside the value: both text fragments survive
    assert(f("Media ID") === "42 -link")
    // doubly-nested divs: the old non-greedy regex stopped at the first
    // inner </div> and dropped " et al."
    assert(f("Creator") === "Dr. B et al.")
  }

  test("page without 'Showcase Media' title is rejected") {
    val e = intercept[RuntimeException](fetcher.fetch("http://fixture/error"))
    assert(e.getMessage === "Not a valid MorphoSource media page")
  }

  test("valid title but no recognizable layout is rejected") {
    val e = intercept[RuntimeException](fetcher.fetch("http://fixture/layoutless"))
    assert(e.getMessage === "Could not determine page layout or media type")
  }

  test("end-to-end: enrichment over fixture pages routes errors to dead letter") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val p = pages // local copy: the closure must not capture the suite
    val urls = p.keys.toSeq.toDF("url")
    val out = Enricher.enrich(urls, () => new HtmlFetcher(p(_)),
      Enricher.Config(maxAttempts = 2, backoffMs = 1))
    val recs = out.records.select($"url", $"media_type", $"media_id").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(recs.keySet === Set("http://fixture/showcase",
      "http://fixture/traditional", "http://fixture/nested"))
    assert(recs("http://fixture/showcase") === (("Mesh", "000123456")))
    assert(recs("http://fixture/traditional") === (("Volumetric Image Series", "7890")))
    assert(recs("http://fixture/nested") === (("Mesh", "42 -link")))
    // conditional field-set selection (P5): the volumetric-section column
    // carries its page value for the volumetric record
    val vol = out.records.where($"media_type" === "Volumetric Image Series")
      .select($"slice_thickness").head()
    assert(vol.getString(0) === "0.05mm")
    val dead = out.deadLetter.select($"url", $"reason").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dead.keySet === Set("http://fixture/error", "http://fixture/layoutless"))
    assert(dead.values.forall(_ == "max_attempts"))
  }
}
