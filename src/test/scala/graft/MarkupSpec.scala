package graft

import org.apache.spark.sql.functions._

import graft.operators.Markup

/** Crafted-page battery for the HTML → text extraction operator
  * (q277's engine): tag stripping, script/style/comment removal,
  * entity decode order, block segmentation, and the jusText-class
  * word-count × link-density boilerplate rule. */
class MarkupSpec extends SparkSpec {
  import spark.implicits._

  private def extract(pages: (Long, String)*)
      : Map[Long, (Long, Long, String)] =
    Markup.extractText(pages.toDF("doc_id", "html"), "doc_id", "html")
      .select("doc_id", "n_blocks", "n_content", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("script/style/comment content never leaks; nav and footer link " +
    "farms are boilerplate; content paragraphs survive") {
    val page =
      """<html><head><title>Tiny title</title>
        |<style>.x { secret-style-token: 1; }</style>
        |<script>var secretScriptToken = "hidden";</script>
        |</head><body>
        |<!-- secretCommentToken should vanish -->
        |<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
        |<p>This paragraph clearly has enough words to be kept as content.</p>
        |<div class="footer"><a href="/p">Privacy</a> <a href="/t">Terms</a></div>
        |</body></html>""".stripMargin
    val (nBlocks, nContent, text) = extract(1L -> page)(1L)
    assert(!text.contains("secret-style-token"))
    assert(!text.contains("secretScriptToken"))
    assert(!text.contains("secretCommentToken"))
    assert(!text.contains("Home") && !text.contains("Privacy"),
      s"link farm leaked into: $text")
    assert(text ==
      "This paragraph clearly has enough words to be kept as content.")
    assert(nContent == 1L)
    assert(nBlocks >= 3L) // title+nav block, paragraph, footer
  }

  test("entity decode: frozen set, &amp; last (double-escape stays " +
    "escaped once)") {
    val page = "<p>Fish &amp; chips &lt;b&gt; &quot;q&quot; &#39;s " +
      "&amp;lt;still-escaped and some filler words</p>"
    val (_, _, text) = extract(1L -> page)(1L)
    assert(text.contains("Fish & chips <b> \"q\" 's"))
    // &amp;lt; = the AUTHOR wrote "&lt;" — must decode exactly once
    assert(text.contains("&lt;still-escaped"))
    assert(!text.contains("<still-escaped"))
  }

  test("<br> and block-level end tags segment blocks; word-count and " +
    "link-density rules classify per block") {
    val page =
      "<p>first half has five words<br>tiny tail</p>" + // 5 kept, 2 dropped
        "<p>only four words here</p>" + // 4 < 5 dropped
        "<p>exactly five words right here</p>" + // kept
        // 5 words, 2 links: 5 < 4*2 — link-dense, dropped
        "<p>see <a href='/x'>x</a> and <a href='/y'>y</a> now</p>" +
        // 8 words, 2 links: 8 >= 8 — kept, anchor text retained
        "<p>read <a href='/m'>the manual</a> and <a href='/f'>the faq" +
        "</a> first please</p>"
    val (nBlocks, nContent, text) = extract(1L -> page)(1L)
    assert(nBlocks == 6L, s"expected 6 blocks, got $nBlocks: $text")
    assert(nContent == 3L, s"expected 3 content blocks: $text")
    assert(text.split("\n").toSeq == Seq(
      "first half has five words",
      "exactly five words right here",
      "read the manual and the faq first please"))
    assert(!text.contains(Markup.LinkMark), "sentinel leaked")
  }

  test("<abbr>/<article> are not anchors; bare <a> is; empty and " +
    "tag-only pages extract to nothing") {
    val page = "<p><abbr>HTML</abbr> text with an <a>anchor</a> plus " +
      "several filler words here</p>"
    val (_, nContent, text) = extract(1L -> page)(1L)
    assert(nContent == 1L)
    assert(text.contains("HTML text with an anchor"))
    val empty = extract(1L -> "", 2L -> "<div><br></div>",
      3L -> "<script>x</script>")
    empty.foreach { case (id, (nb, nc, t)) =>
      assert(nb == 0L && nc == 0L && t == "", s"doc $id: $t")
    }
  }

  test("uppercase tags and attribute-bearing variants strip the same") {
    val page = "<P CLASS='x'>Mixed case paragraph with plenty of words " +
      "inside</P><BR/><SCRIPT>leak()</SCRIPT><A HREF='/z'>z</A>"
    val (_, _, text) = extract(1L -> page)(1L)
    assert(text == "Mixed case paragraph with plenty of words inside")
  }
}
