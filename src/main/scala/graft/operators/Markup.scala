package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/markup → text extraction — the FIRST stage of a web-corpus
  * curation pipeline, sitting in front of the existing C4
  * (TextAnalysis.c4Rules), encoding (encodingQuality) and
  * canonical-URL (canonicalizeUrls) gates, which all assume
  * pre-extracted text.
  *
  * The formulation is the public jusText-class recipe (Pomikálek 2011,
  * "Removing boilerplate and duplicate content from web corpora"),
  * simplified to its two load-bearing signals so it stays
  * engine-portable: after tag stripping, a BLOCK (delimited by
  * block-level end tags and <br>) is CONTENT iff it has at least
  * `minWords` words AND its words outnumber its embedded links
  * `linkWordRatio`-fold — short blocks and link farms (navigation,
  * footers, tag clouds) are boilerplate. Link positions survive tag
  * stripping as an inert sentinel token injected for every anchor-open
  * tag, counted per block and removed from the output text.
  *
  * Pipeline (ONE shared Java/RE2 pattern chain — the redactPii /
  * c4Rules posture; every pattern avoids backreferences and \uXXXX so
  * both engines parse it identically):
  *   1. drop <script>…</script> and <style>…</style> wholesale
  *   2. drop <!-- comments -->
  *   3. mark anchor-open tags with the link sentinel
  *   4. turn block-level END tags and <br> into newlines
  *   5. strip every remaining tag
  *   6. decode the frozen entity set (&nbsp; &lt; &gt; &quot; &#39;
  *      then &amp; LAST — so "&amp;lt;" decodes to the literal "&lt;"
  *      exactly once, per the HTML spec's double-escape semantics)
  *   7. collapse [ \t]+, split on newlines, trim, drop empty blocks
  *   8. classify blocks by word count and link density; join kept
  *      blocks with newlines, sentinel removed.
  *
  * Scale shape: pure per-row scan work (regexp chains + HOFs inside
  * whole-stage codegen), no shuffle, no UDF — the same 100-TB posture
  * as every other text gate. Output: (doc_id, n_blocks, n_content,
  * clean_text, n_chars), all hash-checkable.
  */
object Markup {

  /** Shared Java/RE2 patterns (inline (?i)/(?s) flags only, no
    * backreferences, no \uXXXX — both engines parse these
    * identically). */
  val ScriptPattern = "(?is)<script[^>]*>.*?</script>"
  val StylePattern = "(?is)<style[^>]*>.*?</style>"
  val CommentPattern = "(?s)<!--.*?-->"
  /** `<a>` or `<a …>` — the `(>|\s…)` guard keeps <abbr>/<article>
    * untouched. The whitespace class is spelled `\t`-as-two-chars so
    * the SAME string embeds verbatim in a single-quoted SQL literal
    * (DuckDB strings don't process escapes; both regex engines decode
    * `\t`/`\r`/`\n` identically). */
  val AnchorPattern = "(?i)<a(>|[ \\t\\r\\n][^>]*>)"
  val BlockBreakPattern =
    "(?i)</(p|div|li|h1|h2|h3|h4|h5|h6|tr|ul|ol|table|blockquote" +
      "|section|article|header|footer|nav|pre)>|<br[^>]*>"
  val TagPattern = "<[^>]*>"
  /** Inert link sentinel: survives tag stripping as its own word,
    * counted per block, removed from the output. Contains no regex
    * metacharacters and no whitespace. */
  val LinkMark = "§a§"
  /** Frozen entity decode set, IN ORDER (&amp; last). */
  val Entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  /** The tag-strip half (steps 1-6) as a Column, exposed so the spec
    * can pin it independently of block classification. */
  def stripMarkup(html: Column): Column = {
    val noScript = regexp_replace(html, ScriptPattern, " ")
    val noStyle = regexp_replace(noScript, StylePattern, " ")
    val noComment = regexp_replace(noStyle, CommentPattern, " ")
    val marked = regexp_replace(noComment, AnchorPattern, s" $LinkMark ")
    val broken = regexp_replace(marked, BlockBreakPattern, "\n")
    val noTags = regexp_replace(broken, TagPattern, " ")
    Entities.foldLeft(noTags) { case (c, (k, v)) =>
      replace(c, lit(k), lit(v))
    }
  }

  /** Extract boilerplate-filtered text from an HTML column. Output:
    * (doc_id, n_blocks, n_content, clean_text, n_chars) — `doc_id`
    * keeps `idCol`'s own type (numeric corpora stay numeric; a WARC
    * ingest keys by record-id strings). */
  def extractText(df: DataFrame, idCol: String, htmlCol: String,
                  minWords: Int = 5, linkWordRatio: Int = 4)
      : DataFrame = {
    require(minWords >= 1 && linkWordRatio >= 1,
      "minWords and linkWordRatio must be >= 1")
    val collapsed = regexp_replace(stripMarkup(col(htmlCol)),
      "[ \\t]+", " ")
    val blocks = filter(
      transform(split(collapsed, "\n"), b => trim(b)), b => b =!= "")
    // annotate each block ONCE (no expensive subtree re-evaluated per
    // predicate — the HOF-CSE rule), then classify on the fields
    val annotated = transform(blocks, b => struct(
      b.as("t"),
      size(filter(split(b, " "),
        w => w =!= "" && w =!= LinkMark)).as("wc"),
      (size(split(b, LinkMark, -1)) - 1).as("lk")))
    val content = filter(annotated, s =>
      s("wc") >= minWords && s("wc") >= lit(linkWordRatio) * s("lk"))
    df.select(col(idCol).as("doc_id"),
        blocks.as("__b"), content.as("__c"))
      .select(col("doc_id"),
        size(col("__b")).cast("long").as("n_blocks"),
        size(col("__c")).cast("long").as("n_content"),
        array_join(transform(col("__c"), s =>
          trim(regexp_replace(replace(s("t"), lit(LinkMark), lit("")),
            "[ ]+", " "))), "\n").as("clean_text"))
      .withColumn("n_chars", length(col("clean_text")).cast("long"))
  }
}
