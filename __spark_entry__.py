"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction round-trip on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 + the
training-data-pipeline operators); each callable (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query.

Extraction correctness trick: ``documents.text`` is clean single-spaced
prose, so wrapping it in article HTML and running the FULL extraction
cascade must return the text byte-identically — giving the per-document
kernel a DuckDB-checkable oracle (`SELECT ... text FROM documents`).
"""

from __future__ import annotations

import os
import re
import sys
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

_EPOCH_2026 = 1767225600  # 2026-01-01T00:00:00Z
_PYFILES_SHIPPED: set[str] = set()


def _utc(spark: SparkSession) -> None:
    """Timestamps must compare UTC-naive against the DuckDB oracle
    regardless of how the driver configured its session."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass


def _ensure_pyfiles(spark: SparkSession) -> None:
    """Ship the package to executor Python workers (the spark-submit
    --py-files mechanism, applied at runtime since the driver owns the
    session).  Idempotent per SparkContext."""
    _utc(spark)
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _PYFILES_SHIPPED:
        return
    zip_path = os.path.join("/tmp", f"rs_trafilatura_spark_{os.getpid()}.zip")
    if not os.path.exists(zip_path):
        pkg_dir = os.path.join(_REPO_DIR, "rs_trafilatura_spark")
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for name in files:
                    if name.endswith(".py"):
                        full = os.path.join(root, name)
                        rel = os.path.relpath(full, _REPO_DIR)
                        zf.write(full, rel)
    sc.addPyFile(zip_path)
    _PYFILES_SHIPPED.add(key)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    # The sf-dir tables are written as ONE parquet row group, and a row
    # group is the real split unit — every downstream map/join stage
    # would otherwise run on a single core regardless of cluster size
    # (measured: the ngram_jaccard self-join spent 6.8s single-task vs
    # 1.3s spread).  One tiny round-robin shuffle of the input rows
    # right after the read (guide: "input skew — repartition immediately
    # after the read") spreads every query; count is cluster-derived,
    # not a local-mode constant.
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _docs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_docs + a hash repartition on the unique doc_id: the sf-dir tables
    are ONE parquet row group (the real split unit), so without a spread
    every map/join stage runs on a single core regardless of cluster
    size.  Used by the queries whose per-row work dominates (measured:
    the ngram_jaccard self-join 6.8s single-task vs 1.1s spread; Gopher
    regex rules 3.2s vs 1.3s); branch-heavy cheap queries keep the plain
    read — for them the extra exchanges cost more than one core loses
    (ann_topk_methods measured 3.8s plain vs 6.2s spread).  Hash on
    doc_id, NOT round-robin: keyless repartition pays a local whole-row
    sort (SPARK-23207) and does not co-partition later doc_id joins.
    Count is cluster-derived, not a local-mode constant."""
    return _docs(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _synth_url():
    return F.concat(F.lit("https://docs.example/blog/doc-"),
                    F.col("doc_id").cast("string"))


# roundtrip template parts — shared between the Spark page builder and the
# oracle's span-offset arithmetic (the byte offset of <p> in the page is
# len(_RT_P1) + len(lang) + len(_RT_P3) + len(str(doc_id)) + len(_RT_P5))
_RT_P1 = '<!doctype html><html lang="'
_RT_P3 = '"><head><title>Doc '
_RT_P5 = (" - Docs Example</title></head><body>"
          '<nav class="main-nav"><a href="/">Home</a> '
          '<a href="/blog">Blog</a></nav>'
          "<article>")
_RT_P7 = ("</p></article>"
          '<footer class="site-footer">© docs.example</footer>'
          "</body></html>")


def _wrap_roundtrip(documents: DataFrame) -> DataFrame:
    """Template A: article page around the document text (binary html)."""
    html = F.concat(
        F.lit(_RT_P1), F.col("lang"),
        F.lit(_RT_P3), F.col("doc_id").cast("string"),
        F.lit(_RT_P5 + "<p>"),
        F.col("text"),
        F.lit(_RT_P7),
    )
    return documents.select(
        _synth_url().alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2026) + F.col("doc_id")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("lang"),
    )


def _wrap_metadata(documents: DataFrame) -> DataFrame:
    """Template B: rich <head> whose metadata derives from table columns."""
    ts = F.timestamp_seconds(F.lit(_EPOCH_2026) + F.col("doc_id") * 60)
    iso = F.concat(F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z"))
    html = F.concat(
        F.lit('<!doctype html><html lang="en"><head><title>Doc '),
        F.col("doc_id").cast("string"),
        F.lit(' - Meta Site</title><meta name="author" content="Author '),
        F.col("source"),
        F.lit('"><meta property="og:site_name" content="Meta Site">'
              '<meta property="article:published_time" content="'),
        iso,
        F.lit('"></head><body><article><p>'),
        F.col("text"),
        F.lit("</p></article></body></html>"),
    )
    return documents.select(
        _synth_url().alias("url"),
        ts.alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("lang"),
    )


def _run_kernel(spark: SparkSession, pages: DataFrame,
                options=None) -> DataFrame:
    _ensure_pyfiles(spark)
    from rs_trafilatura_spark.plans import run_extraction
    from rs_trafilatura_spark.options import DEFAULT_OPTIONS

    return run_extraction(spark, pages, options or DEFAULT_OPTIONS,
                          target_partitions=spark.sparkContext.defaultParallelism)


def _id_str():
    return F.col("doc_id").cast("string")


def _wrap_structured(documents: DataFrame) -> DataFrame:
    """Template S: h2 + p + ul article — the structured-output surface
    (content_html whitelist emitter + GFM markdown walker) becomes fully
    predictable from the template constants."""
    i = _id_str()
    html = F.concat(
        F.lit('<!doctype html><html lang="en"><head><title>Doc '), i,
        F.lit(" - Structured Site</title></head><body><article><h2>Section "),
        i,
        F.lit("</h2><p>"), F.col("text"),
        F.lit("</p><ul><li>Alpha note "), i,
        F.lit("</li><li>Beta note "), i,
        F.lit("</li></ul></article></body></html>"),
    )
    return documents.select(
        F.concat(F.lit("https://www.structured.example/blog/doc-"), i).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2026) + F.col("doc_id")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("lang"),
    )


_MD_TAIL = " Star *alpha beta* plus [bracket] and 5 * 6 _under_ tail"
_MD_TAIL_GFM = r" Star *alpha beta* plus \[bracket\] and 5 \* 6 _under_ tail"
_MD_TABLE = ("<table><tr><th>Name</th><th>Value</th></tr>"
             "<tr><td>a|b</td><td>x_y</td></tr></table>")
_MD_TABLE_GFM = "| Name | Value |\n| --- | --- |\n| a\\|b | x_y |"


def _wrap_mdesc(documents: DataFrame) -> DataFrame:
    """Template E: the structured template plus markdown-special characters
    in the paragraph and a pipe-bearing table cell, so the GFM walker's
    position-aware escaping (functions/markdown.py: matched emphasis pairs
    survive, stray * [ ] escape, table pipes escape) is pinned by the
    driver, not just the spike mirrors."""
    i = _id_str()
    html = F.concat(
        F.lit('<!doctype html><html lang="en"><head><title>Doc '), i,
        F.lit(" - Escape Site</title></head><body><article><h2>Section "),
        i,
        F.lit("</h2><p>"), F.col("text"),
        F.lit(_MD_TAIL + "</p>" + _MD_TABLE + "</article></body></html>"),
    )
    return documents.select(
        F.concat(F.lit("https://esc.example/blog/doc-"), i).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2026) + F.col("doc_id")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("lang"),
    )


def _wrap_images(documents: DataFrame) -> DataFrame:
    """Template I: figure+figcaption+plain img with og:image hero match
    (reference extract.rs:3352-3565 semantics)."""
    i = _id_str()
    html = F.concat(
        F.lit('<!doctype html><html lang="en"><head><title>Doc '), i,
        F.lit(' - Image Site</title><meta property="og:image" '
              'content="https://cdn.example.com/img/hero-'), i,
        F.lit('.jpg"></head><body><article><figure><img src="/img/fig-'), i,
        F.lit('.png" alt="Figure '), i,
        F.lit('"><figcaption>Caption '), i,
        F.lit("</figcaption></figure><p>"), F.col("text"),
        F.lit('</p><img src="/img/hero-'), i,
        F.lit('.jpg" alt="Hero '), i,
        F.lit('"></article></body></html>'),
    )
    return documents.select(
        F.concat(F.lit("https://www.imgsite.example/blog/doc-"), i).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2026) + F.col("doc_id")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("lang"),
    )


def _wrap_comments(documents: DataFrame) -> DataFrame:
    """Template C: article + #comments section with two text-derived
    comments (largest-comment-section rule, extract.rs:3568-3636)."""
    i = _id_str()
    html = F.concat(
        F.lit('<!doctype html><html lang="en"><head><title>Doc '), i,
        F.lit(" - Comment Site</title></head><body><article><p>"),
        F.col("text"),
        F.lit('</p></article><div id="comments">'
              '<div class="comment"><p>First take: '),
        F.col("text"),
        F.lit('</p></div><div class="comment"><p>Second take: '),
        F.col("text"),
        F.lit("</p></div></div></body></html>"),
    )
    return documents.select(
        F.concat(F.lit("https://www.commentsite.example/blog/doc-"), i).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2026) + F.col("doc_id")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("lang"),
    )


def _rt_html(text_col):
    """Template-A html around an arbitrary text column (shared with
    _wrap_roundtrip so the oracle's html-length arithmetic holds)."""
    return F.concat(
        F.lit(_RT_P1), F.col("lang"),
        F.lit(_RT_P3), F.col("doc_id").cast("string"),
        F.lit(_RT_P5 + "<p>"), text_col, F.lit(_RT_P7),
    )


_CUR_BP_PREFIX = "Subscribe to our newsletter today. "
_CUR_NEAR_TAIL = " Appended closing remark for the near duplicate audit row."
_CUR_AUDIT_CACHE: list = []

# Planted near-dup STAR for the pairwise-vs-clusters divergence (r4 verdict
# task #4): center text T on the url with the LARGEST md5-prefix id
# (chain-a), leaves T+X / T+Y on the smaller ids (chain-b / chain-c).
# Shingle Jaccard: J(center, leaf) = 880 >= 800, J(leaf, leaf) = 786 < 800
# (118 shared T-shingles, 18 tail shingles per leaf).  Pairwise-loser
# semantics drops only the b-side of each pair (= the center, the largest
# id) and KEEPS both leaves although they are transitively near-dups;
# cluster semantics keeps exactly ONE of the three (min id = chain-b).
_CH_T = " ".join(f"chain{i:03d}" for i in range(120))
_CH_X = " ".join(f"extx{i:02d}" for i in range(16))
_CH_Y = " ".join(f"exty{i:02d}" for i in range(16))
_CH_ROWS = [
    (9000001, "en", _CH_T, "https://www.curated.example/blog/chain-a"),
    (9000002, "en", _CH_T + " " + _CH_X,
     "https://www.curated.example/blog/chain-b"),
    (9000003, "en", _CH_T + " " + _CH_Y,
     "https://www.curated.example/blog/chain-c"),
]


def _wrap_curation(documents: DataFrame) -> DataFrame:
    """Planted curation corpus: every doc gets a base page; docs with
    doc_id%10==1 are truncated to 100 chars (too_short), %10==3 get two
    boilerplate keywords prepended (low_quality when short enough); extra
    pages plant exact duplicates (%10==0) and near duplicates
    (%10==2, en)."""
    i = _id_str()
    base_text = (
        F.when(F.col("doc_id") % 10 == 1,
               F.rtrim(F.substring(F.col("text"), 1, 100)))
        .when(F.col("doc_id") % 10 == 3,
              F.concat(F.lit(_CUR_BP_PREFIX), F.col("text")))
        .otherwise(F.col("text"))
    )
    base = documents.select(
        F.concat(F.lit("https://www.curated.example/blog/doc-"), i).alias("url"),
        base_text.alias("etext"), "doc_id", "lang",
    )
    dups = documents.filter(F.col("doc_id") % 10 == 0).select(
        F.concat(F.lit("https://www.curated.example/blog/dup-"), i).alias("url"),
        F.col("text").alias("etext"), "doc_id", "lang",
    )
    nears = documents.filter(
        (F.col("doc_id") % 10 == 2) & (F.col("lang") == "en")
    ).select(
        F.concat(F.lit("https://www.curated.example/blog/near-"), i).alias("url"),
        F.concat(F.col("text"), F.lit(_CUR_NEAR_TAIL)).alias("etext"),
        "doc_id", "lang",
    )
    chain = documents.sparkSession.createDataFrame(
        _CH_ROWS, ["doc_id", "lang", "etext", "url"]
    ).select("url", "etext", F.col("doc_id").cast("long").alias("doc_id"),
             "lang")
    rows = base.unionByName(dups).unionByName(nears).unionByName(chain)
    return rows.select(
        "url",
        F.timestamp_seconds(F.lit(_EPOCH_2026) + F.col("doc_id")).alias("warc_ts"),
        F.encode(_rt_html(F.col("etext")), "utf-8").alias("html"),
        F.col("lang"),
    )


def _md5_id(url_col):
    """SQL-reproducible 60-bit doc id: first 15 hex chars of md5(url)."""
    return F.conv(F.substring(F.md5(url_col), 1, 15), 16, 10).cast("long")


def _wrap_metadata_full(documents: DataFrame) -> DataFrame:
    """Template B2: the remaining metadata surfaces — og:description,
    article:section, keywords, canonical link, og:image and a rel=license
    CC anchor (kernel/metadata.py meta router + _license_from_dom,
    reference metadata/dom_extraction.rs:519-563)."""
    i = _id_str()
    html = F.concat(
        F.lit('<!doctype html><html lang="en"><head><title>Doc '), i,
        F.lit(' - Meta Site</title><meta name="author" content="Author '),
        F.col("source"),
        F.lit('"><meta property="og:site_name" content="Meta Site">'
              '<meta property="og:description" content="Summary of doc '), i,
        F.lit(' for the meta surface.">'
              '<meta property="article:section" content="Cat '),
        (F.col("doc_id") % 5).cast("string"),
        F.lit('"><meta name="keywords" content="'),
        F.col("source"),
        F.lit(', spark, web">'
              '<meta property="og:image" content="https://cdn.example.com/i/'),
        i,
        F.lit('.jpg"><link rel="canonical" href="https://canonical.example/doc-'),
        i,
        F.lit('"></head><body><article><p>'),
        F.col("text"),
        F.lit('</p><a rel="license" '
              'href="https://creativecommons.org/licenses/by-sa/4.0/">License'
              "</a></article></body></html>"),
    )
    return documents.select(
        F.concat(F.lit("https://www.metafull.example/blog/doc-"), i).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2026) + F.col("doc_id")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("lang"),
    )


# fallback template parts (query: extract_fallback_spans)
_FB_P1 = '<!doctype html><html lang="'
_FB_P2 = '"><head><title>Doc '
_FB_P3 = ' - Fallback Site</title></head><body><div class="content">'
_FB_SHORT = ("intercontinental " * 15).strip()  # 254 chars, only 15 words


def _wrap_fallback(documents: DataFrame) -> DataFrame:
    """Template F: the content rule selects div.content whose paragraph has
    plenty of characters but too few words (min_output_size), forcing the
    baseline paragraph-scrape rescue (fallback.rs:259-368); the rescue must
    carry SOURCE-anchored spans for both contributing <p> nodes."""
    i = _id_str()
    html = F.concat(
        F.lit(_FB_P1), F.col("lang"),
        F.lit(_FB_P2), i,
        F.lit(_FB_P3 + "<p>" + _FB_SHORT + "</p></div><p>"),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    return documents.select(
        F.concat(F.lit("https://www.fallback.example/blog/doc-"), i).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2026) + F.col("doc_id")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("lang"),
    )


# post-pass ladder templates (queries: extract_merge, extract_repeated_items,
# extract_jsonld_product, extract_discourse).  Shared doc filter: text length
# in [450, 900] keeps every candidate-score inequality provable (see the
# _wrap_merge docstring); page_type is pinned via Options and fallback
# extraction disabled so the post passes compare against the main-ladder
# text, not a baseline rescue.
_PP_LEN_MIN, _PP_LEN_MAX = 450, 900

_MG_P1 = '<!doctype html><html lang="en"><head><title>Doc '
_MG_P2 = ' - Merge Site</title></head><body><div class="content"><p>'
_MG_BLOB = ("intercontinental " * 59).strip()  # 1002 chars: rule 4 selects
# div.content directly (>= MIN_CONTENT_TEXT_LEN, no parent promotion)
_MG_P3 = "</p></div><section><p>"
_MG_A2 = ("Our service desk answers within one business day, assigns a "
          "tracking number to each request for later reference, and routes "
          "billing questions to a separate queue staffed on weekday "
          "mornings by the finance liaison team. Most issues close after a "
          "single reply, while satisfaction surveys follow every closed "
          "ticket and feed the quarterly training plan for new desk staff "
          "across both regions. The desk also maintains a public status "
          "page listing planned maintenance windows, and posts a summary "
          "of recurring problems at the end of each month so engineering "
          "teams can plan around known limitations of the platform and "
          "its supporting tools")
_MG_P4 = "</p></section><section>"
_MG_P5 = "</section></body></html>"


def _wrap_merge(documents: DataFrame) -> DataFrame:
    """Template M: service page forcing the multi-candidate merge post pass
    (extract.rs:644-768; kernel/postprocess.py::try_multi_candidate_merge).
    Content rule 4 (class == "content") selects div.content directly: its
    1002-char blob clears MIN_CONTENT_TEXT_LEN so no parent promotion fires,
    and the main text stays the blob (59 words >= min_output_size, so the
    recovery ladder and fallback stay off).  The merge pass (service profile
    => aggregate_sections) then collects the three candidates in score
    order.  Score inequalities hold for every L = len(text) in [450, 900]
    given the corpus has no sentence punctuation (doc-section sentence
    bonus is 0): div.content scores 1002+500+25 = 1527, the doc section
    L+500 <= 1400, the fixed no-<p> section 634+2*50 = 734 >= top/5 =
    306, and merged = 1002+L+634+4 > 2*1002 for every L >= 365 — so
    the merged order is always [div.content, doc section, fixed section]
    and the pass always fires."""
    i = _id_str()
    html = F.concat(
        F.lit(_MG_P1), i,
        F.lit(_MG_P2 + _MG_BLOB + _MG_P3),
        F.col("text"),
        F.lit(_MG_P4 + _MG_A2 + _MG_P5),
    )
    return documents.select(
        F.concat(F.lit("https://svc.example/about/team-"), i).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2026) + F.col("doc_id")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("lang"),
    )


_CL_P1 = '<!doctype html><html lang="en"><head><title>Doc '
_CL_DESC = ("Seasonal guides for the northern orchards, collected over a "
            "decade of field notes and interviews with the growers "
            "themselves. Each entry lists the cultivar, the rootstock, and "
            "the first-frost window observed at the site, with raw tables.")
_CL_LI2 = ("Walkthrough of the cold-frame build, with a parts list, the "
           "measured temperatures across four weeks, and what we would "
           "change on the next build after a full season of use.")
_CL_LI3 = ("Notes on the drip irrigation retrofit: emitter spacing, observed "
           "pressure loss along the runs, and the simple fix that cut water "
           "use by a fifth without hurting yields at all.")
_CL_P2 = (' - Collection Site</title></head><body>'
          '<div class="category-description"><p>' + _CL_DESC + "</p></div>"
          '<div class="feed"><ul><li>')
_CL_P3 = ("</li><li>" + _CL_LI2 + "</li><li>" + _CL_LI3
          + "</li></ul></div></body></html>")


def _wrap_collection(documents: DataFrame) -> DataFrame:
    """Template R: collection/listing page forcing repeated-item collection
    (extract.rs:524-636; kernel/postprocess.py::try_collect_repeated_items)
    PLUS the collection-description prepend (extract.rs:472-514).  The
    collection profile's content selector picks div.category-description
    (248 chars >= min_extracted_len), then the card grid (ul with 3 li of
    >= 15 words, total >= 450+345 > 2*248) replaces it, and the
    description — absent from the items — is prepended."""
    i = _id_str()
    html = F.concat(
        F.lit(_CL_P1), i, F.lit(_CL_P2), F.col("text"), F.lit(_CL_P3),
    )
    return documents.select(
        F.concat(F.lit("https://shop.example/collection/guides-"), i).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2026) + F.col("doc_id")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("lang"),
    )


def _wrap_jsonld_product(documents: DataFrame) -> DataFrame:
    """Template J: product page whose DOM body is a too-short stock notice
    (< 100 chars => dom_too_short) while the JSON-LD Product description
    carries the document text — the structured description must override the
    DOM (extract.rs:292-318; kernel/extract.py step 10d).  The JSON is built
    with to_json so arbitrary text is correctly escaped."""
    i = _id_str()
    ld = F.to_json(F.struct(
        F.lit("https://schema.org").alias("@context"),
        F.lit("Product").alias("@type"),
        F.concat(F.lit("Item "), i).alias("name"),
        F.col("text").alias("description"),
    ))
    html = F.concat(
        F.lit('<!doctype html><html lang="en"><head><title>Item '), i,
        F.lit(' - Store</title><script type="application/ld+json">'), ld,
        F.lit('</script></head><body><div class="product-info">'
              "<p>In stock.</p></div></body></html>"),
    )
    return documents.select(
        F.concat(F.lit("https://store.example/product/item-"), i).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2026) + F.col("doc_id")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("lang"),
    )


_DS_REPLY = ("That matches what we saw on the south slope as well, though "
             "our sensors were cheaper and the wind gusts clipped their "
             "range on the worst mornings of the spring campaign.")


def _html_attr_escape(col):
    """Minimal HTML attribute escaping for a single-quoted attribute value
    (html.parser entity-decodes these back): & first, then < > '."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    out = F.replace(out, F.lit(">"), F.lit("&gt;"))
    return F.replace(out, F.lit("'"), F.lit("&#39;"))


def _wrap_discourse(documents: DataFrame) -> DataFrame:
    """Template D: Discourse-style page whose only body payload is the
    #data-preloaded attribute — JSON-in-JSON (topic_* value is itself a JSON
    string) holding two cooked posts; the DOM yields no text, so the
    data-preloaded extraction must win (extractor/fallback.rs:44-110;
    kernel/fallback.py::extract_discourse_content).  Both JSON layers are
    built with to_json (inner escaped as a string by the outer), then
    attribute-escaped for the single-quoted attribute."""
    i = _id_str()
    inner = F.to_json(F.struct(F.struct(F.array(
        F.struct(F.concat(F.lit("<p>"), F.col("text"),
                          F.lit("</p>")).alias("cooked")),
        F.struct(F.lit("<p>" + _DS_REPLY + "</p>").alias("cooked")),
    ).alias("posts")).alias("post_stream")))
    outer = _html_attr_escape(
        F.to_json(F.struct(inner.alias("topic_1")))
    )
    html = F.concat(
        F.lit('<!doctype html><html lang="en"><head><title>Topic '), i,
        F.lit("</title></head><body><div id='data-preloaded' "
              "data-preloaded='"), outer,
        F.lit("'></div></body></html>"),
    )
    return documents.select(
        F.concat(F.lit("https://forum.example/t/topic-"), i).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2026) + F.col("doc_id")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("lang"),
    )


_TYPED_FAMILIES = ("forum", "product", "documentation")


def _wrap_typed(documents: DataFrame) -> DataFrame:
    """Templates T: one page per (doc, family) for the three URL-typed
    families whose URL-stage and ML-stage classifications provably agree →
    classification_confidence hits the 1.0 agreement constant
    (extract.rs:55-92; kernel/page_type.py::classify_page)."""
    i = _id_str()
    fam = F.explode(F.array(*[F.lit(f) for f in _TYPED_FAMILIES])).alias("family")
    d = documents.select("doc_id", "text", "lang", fam)
    url = (
        F.when(F.col("family") == "forum",
               F.concat(F.lit("https://community.example/thread/topic-"), i))
        .when(F.col("family") == "product",
              F.concat(F.lit("https://shop.example/product/widget-"), i))
        .otherwise(F.concat(F.lit("https://docs.example.org/docs/guide-"), i))
    )
    forum_html = F.concat(
        F.lit('<!doctype html><html lang="en"><head><title>Thread '), i,
        F.lit(' - Community</title></head><body><div class="post-stream" '
              'itemtype="https://schema.org/DiscussionForumPosting">'
              '<div class="topic-body"><p>'),
        F.col("text"),
        F.lit('</p></div><div class="topic-body"><p>Reply '), i,
        F.lit(" agrees with the topic and adds several additional words of "
              "discussion content here.</p></div></div></body></html>"),
    )
    product_html = F.concat(
        F.lit('<!doctype html><html lang="en"><head><title>Widget '), i,
        F.lit(' - Shop</title></head><body><div class="product-info" '
              'itemtype="https://schema.org/Product"><h1>Widget '), i,
        F.lit('</h1><div class="product-description"><p>'),
        F.col("text"),
        F.lit('</p></div><button class="add-to-cart">Add to cart</button>'
              '<span class="product-price">$'), i,
        F.lit("</span></div></body></html>"),
    )
    docs_html = F.concat(
        F.lit('<!doctype html><html lang="en"><head><title>Guide '), i,
        F.lit(' - Docs</title></head><body><nav class="docs-sidebar">'
              '<a href="/docs/a">A</a></nav><div role="main"><h1>Guide '), i,
        F.lit("</h1><p>"), F.col("text"),
        F.lit("</p><pre><code>example code one</code></pre>"
              "<pre><code>example code two</code></pre>"
              "<pre><code>example code three</code></pre>"
              "</div></body></html>"),
    )
    html = (
        F.when(F.col("family") == "forum", forum_html)
        .when(F.col("family") == "product", product_html)
        .otherwise(docs_html)
    )
    return d.select(
        url.alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2026) + F.col("doc_id")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("lang"),
        F.col("family"),
    )


# --- query functions -------------------------------------------------------------


def q_extract_roundtrip(spark, sf_dir):
    """Full-cascade roundtrip incl. span offsets: the one <p> of the
    template must yield exactly one SOURCE span whose start is the byte
    offset of <p> in the page and whose length is len(text)+3 (start tag ->
    end tag) — both computable in SQL from the template constants."""
    out = _run_kernel(spark, _wrap_roundtrip(_docs(spark, sf_dir)))
    first = F.element_at("spans", 1)
    return out.select(
        "url",
        F.col("content_text").alias("text"),
        F.col("language").alias("lang"),
        F.col("title").alias("title"),
        F.size("spans").cast("long").alias("n_spans"),
        first.getField("kind").alias("span_kind"),
        first.getField("start").alias("span_start"),
        (first.getField("end") - first.getField("start")).alias("span_len"),
    )


def q_extract_fastscan(spark, sf_dir):
    """The python-side parquet scan (sources/fastscan.py) end-to-end:
    the roundtrip pages are materialized as a parquet table, then read
    and extracted INSIDE the workers (pyarrow scan, no JVM->Python HTML
    hop).  Same oracle as extract_roundtrip — the source must be
    invisible in the results."""
    import hashlib

    from rs_trafilatura_spark.sources import extract_from_parquet

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = f"/tmp/rs_traf_fastscan_oracle_{tag}"
    _wrap_roundtrip(_docs(spark, sf_dir)).write.mode("overwrite").parquet(path)
    _ensure_pyfiles(spark)
    out = extract_from_parquet(spark, path)
    first = F.element_at("spans", 1)
    return out.select(
        "url",
        F.col("content_text").alias("text"),
        F.col("language").alias("lang"),
        F.col("title").alias("title"),
        F.size("spans").cast("long").alias("n_spans"),
        first.getField("kind").alias("span_kind"),
        first.getField("start").alias("span_start"),
        (first.getField("end") - first.getField("start")).alias("span_len"),
    )


def q_warc_roundtrip(spark, sf_dir):
    """The Common-Crawl ingestion path end-to-end: the roundtrip pages are
    serialized to per-record-gzipped .warc.gz archives (deterministic
    sink), then parsed AND extracted in one mapInArrow stage
    (sources/warc.py).  Same oracle as extract_roundtrip — the archive
    hop must be invisible in the results."""
    import hashlib

    from rs_trafilatura_spark.sources.warc import extract_from_warc, write_warc

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = f"/tmp/rs_traf_warc_oracle_{tag}"
    _ensure_pyfiles(spark)
    write_warc(_wrap_roundtrip(_docs(spark, sf_dir)), path, n_files=8).count()
    out = extract_from_warc(spark, path)
    first = F.element_at("spans", 1)
    return out.select(
        "url",
        F.col("content_text").alias("text"),
        F.col("language").alias("lang"),
        F.col("title").alias("title"),
        F.size("spans").cast("long").alias("n_spans"),
        first.getField("kind").alias("span_kind"),
        first.getField("start").alias("span_start"),
        (first.getField("end") - first.getField("start")).alias("span_len"),
    )


def q_warc_cdx_fetch(spark, sf_dir):
    """The CDX random-access path: archives + .cdx sidecars are written,
    the index is read back as a DataFrame, and every indexed record is
    re-fetched by (file, offset, length) — one seek + one-member gunzip
    per row.  Oracle reconstructs each page's exact bytes (md5) from the
    template, so a wrong offset/length fails the hash.

    Two archive framings, discriminated by ``src``: 'native' is this
    engine's own sink (one gzip member per record, canonical headers);
    'foreign' is the same pages re-framed the way another tool might
    write them (two records per gzip member, FNAME/mtime/level-varying
    headers, empty padding members — datagen/foreign_warc.py), proving
    the CDX seek logic honors written offsets rather than its own
    writer's layout."""
    import hashlib

    from rs_trafilatura_spark.datagen.foreign_warc import write_foreign_warc
    from rs_trafilatura_spark.sources.warc import (
        fetch_records, read_cdx, write_warc,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = f"/tmp/rs_traf_cdx_oracle_{tag}"
    _ensure_pyfiles(spark)
    pages_in = _wrap_roundtrip(_docs(spark, sf_dir))
    write_warc(pages_in, path, n_files=8).count()

    fpath = f"/tmp/rs_traf_cdx_foreign_{tag}"
    write_foreign_warc(
        (r.asDict() for r in pages_in.toLocalIterator()), fpath,
        records_per_member=2,
    )

    def fetched(archive, src):
        pages = fetch_records(read_cdx(spark, archive), archive)
        return pages.select(
            F.lit(src).alias("src"),
            "url",
            F.col("warc_ts").cast("long").alias("ts_epoch"),
            F.md5("html").alias("html_md5"),
            "lang",
        )

    return fetched(path, "native").unionByName(fetched(fpath, "foreign"))


def q_mixture_weights(spark, sf_dir):
    """Temperature-scaled (alpha=0.5) per-source mixing weights PLUS the
    downsampling that consumes them, as one driver row (registry
    consolidation): n_kept = survivors of the deterministic per-doc gate
    at rate T*w_k/n_k with T = min_k(n_k*1e6/w_k).  The gate is an
    md5-prefix so DuckDB reproduces the exact survivor set; the
    irrational count^alpha is integer-discretized before normalization
    so both engines divide identical integers."""
    from rs_trafilatura_spark.operators.packing import (
        downsample_to_mixture, mixture_weights, split_corpus,
    )

    docs = _docs(spark, sf_dir)
    weights = mixture_weights(docs, key="source", alpha_x100=50)
    gate = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("long"),
        F.lit(1_000_000),
    )
    kept = downsample_to_mixture(docs, weights=weights, key="source",
                                 gate_col=gate)
    # leakage-safe split assignment folded into the same row: per-source
    # train/val/test counts under the md5-prefix gate (oracle-exact)
    split_gate = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("long"),
        F.lit(100),
    )
    splits = split_corpus(docs, key_col="doc_id", gate_col=split_gate)
    split_counts = splits.groupBy("source").agg(*[
        F.sum((F.col("split") == s).cast("long")).alias(f"n_{s}")
        for s in ("train", "val", "test")
    ])
    return weights.join(
        kept.groupBy("source").agg(F.count("*").cast("long")
                                   .alias("n_kept")),
        "source", "left",
    ).join(split_counts, "source", "left").select(
        "source", "n_docs", "weight_x1e6",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        "n_train", "n_val", "n_test")


def q_streaming_warc_roundtrip(spark, sf_dir):
    """Live-crawler ingest: the roundtrip pages land as .warc.gz archive
    files, a binaryFile readStream picks them up, the streaming parse +
    watermark + url-dedup + kernel runs to completion — results must
    equal the batch roundtrip (same oracle)."""
    import hashlib
    import shutil

    from rs_trafilatura_spark.sources.warc import write_warc
    from rs_trafilatura_spark.streaming.pipeline import (
        run_warc_stream_to_memory,
    )

    _ensure_pyfiles(spark)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    src = f"/tmp/rs_traf_warc_stream_{tag}"
    shutil.rmtree(src, ignore_errors=True)
    write_warc(_wrap_roundtrip(_docs(spark, sf_dir)), src, n_files=8).count()
    _STREAM_SEQ[0] += 1
    name = f"warc_stream_{os.getpid()}_{_STREAM_SEQ[0]}"
    out = run_warc_stream_to_memory(spark, src, query_name=name)
    rows = out.select(
        "url",
        F.col("content_text").alias("text"),
        F.col("language").alias("lang"),
    )
    rows.count()
    return rows


def q_extract_incremental(spark, sf_dir):
    """Incremental crawl processing: old crawl = docs 0-399, new crawl =
    docs 100-499 with content edited in 200-299.  The kernel runs only
    over added+changed urls; unchanged rows are carried from the previous
    output; removed urls drop out.  Oracle = the expected post-crawl
    corpus built directly from the documents table."""
    _ensure_pyfiles(spark)
    from rs_trafilatura_spark.operators.delta import extract_incremental

    d = _docs(spark, sf_dir)
    old_pages = _wrap_roundtrip(d.filter(F.col("doc_id") < 400))
    new_docs = d.filter(F.col("doc_id") >= 100).withColumn(
        "text",
        F.when(
            (F.col("doc_id") >= 200) & (F.col("doc_id") < 300),
            F.concat(F.col("text"), F.lit(" with updated crawl words")),
        ).otherwise(F.col("text")),
    )
    new_pages = _wrap_roundtrip(new_docs)
    old_output = _run_kernel(spark, old_pages)
    out = extract_incremental(spark, new_pages, old_pages, old_output)
    return out.select(
        "url",
        F.col("content_text").alias("text"),
        F.col("language").alias("lang"),
    )


def q_extract_metadata(spark, sf_dir):
    out = _run_kernel(spark, _wrap_metadata(_docs(spark, sf_dir)))
    return out.select(
        "url",
        F.col("author"),
        F.col("date"),
        F.col("sitename"),
    )


def q_extract_metadata_full(spark, sf_dir):
    """The metadata surfaces not covered by extract_metadata: description,
    categories (article:section), tags (keywords), canonical-url override
    + hostname backfill, og:image, and the rel=license CC anchor."""
    out = _run_kernel(spark, _wrap_metadata_full(_docs(spark, sf_dir)))
    return out.select(
        F.col("canonical_url"),
        "hostname",
        "description",
        F.element_at("categories", 1).alias("category1"),
        F.array_join("tags", "|").alias("tags_joined"),
        "license",
        "image",
    )


def q_quality_heuristic(spark, sf_dir):
    """The extraction-quality heuristic (kernel/quality.py, reference
    extract.rs:880-985) pinned directly: page_type is forced so the
    expected-length table is fixed, and the oracle reproduces the exact
    float chain (same operation order -> identical IEEE doubles ->
    identical floor)."""
    from rs_trafilatura_spark.options import Options

    out = _run_kernel(spark, _wrap_roundtrip(_docs(spark, sf_dir)),
                      Options(page_type="article"))
    return out.select(
        "url",
        F.floor(F.col("extraction_quality") * 1000).cast("long")
        .alias("quality_x1000"),
    )


def q_corpus_datasheet(spark, sf_dir):
    """Release datasheet for the corpus (operators/datasheet.py: totals,
    uniqueness, per-source/per-language composition, discrete token
    percentiles) UNIONED with the extraction stage-metrics section the
    row previously pinned alone, and (r6) with the by-GUESSED-language
    section the pipeline's guess_language flag produces: the datasheet's
    lang_col path driven by language_guess_col's 10-language stopword
    argmax instead of the stored lang column — one tall (section, key,
    value) frame, every value integer-exact in both engines."""
    from rs_trafilatura_spark.operators.datasheet import corpus_datasheet
    from rs_trafilatura_spark.operators.textstats import language_guess_col
    from rs_trafilatura_spark.plans import stage_metrics

    # deliberately NOT _docs_spread: the union's many branches already
    # run as parallel stages, so the per-branch repartition exchanges
    # cost more than the single-core scans lose (interleaved A/B:
    # 5.1-5.7s plain vs 6.5-7.2s spread)
    docs = _docs(spark, sf_dir)
    out = _run_kernel(spark, _wrap_roundtrip(docs))
    stages = stage_metrics(out).select(
        F.lit("extraction_stage").alias("section"),
        F.col("stage").alias("key"),
        F.col("n_pages").cast("long").alias("value"),
    )
    guessed = (
        corpus_datasheet(
            docs.withColumn("lang_guess", language_guess_col()),
            lang_col="lang_guess",
        )
        .filter(F.col("section") == "docs_per_lang")
        .select(F.lit("docs_per_guessed_lang").alias("section"),
                "key", "value")
    )
    # (r6) tokenizer-training sections: word-frequency vocab top-20 and
    # BPE round-1 char-pair top-20 over the engine-exact ASCII slice
    # (filter-then-lower; counts integer; (n, word) / (pair_n, left,
    # right) are total orders so the top-20 sets match across engines)
    from rs_trafilatura_spark.operators.tokenizer import (
        char_pair_counts, word_vocab,
    )

    vocab = word_vocab(docs, ascii_only=True)
    topw = (
        vocab.orderBy(F.desc("n"), F.asc("word")).limit(20)
        .select(F.lit("tokenizer_top_words").alias("section"),
                F.col("word").alias("key"),
                F.col("n").cast("long").alias("value"))
    )
    topp = (
        char_pair_counts(vocab)
        .orderBy(F.desc("pair_n"), F.asc("left"), F.asc("right")).limit(20)
        .select(F.lit("tokenizer_top_pairs").alias("section"),
                F.concat("left", F.lit("+"), "right").alias("key"),
                F.col("pair_n").cast("long").alias("value"))
    )
    # (r6) the trainer itself, oracle-pinned: 4 BPE merge rounds via the
    # deployment-shape trainer (one word-count shuffle + local merge
    # loop); the SQL twin unrolls 4 count->argmax->apply rounds over a
    # double-delimited symbol string ('|a||b|'), where replace('|l||r|',
    # '|lr|') is exactly the non-overlapping left-to-right application
    # (single delimiters would let a merge match a SUFFIX of a longer
    # symbol — caught on an adversarial corpus before wiring)
    from rs_trafilatura_spark.operators.tokenizer import bpe_train_local

    merges = bpe_train_local(docs, 4, ascii_only=True)
    mrows = spark.createDataFrame(
        [("tokenizer_merges", f"{i + 1}:{left}+{right}", int(n))
         for i, (left, right, n) in enumerate(merges)],
        "section string, key string, value long",
    )
    return (corpus_datasheet(docs).unionByName(stages)
            .unionByName(guessed).unionByName(topw).unionByName(topp)
            .unionByName(mrows))


# planted cross-document duplicate paragraph so paragraph_dedup provably
# bites: docs with doc_id%5 in {0,1} share this exact footer paragraph
_SHARED_PARA = "\n\nShared footer paragraph planted for corpus dedup."


def q_dedup_exact(spark, sf_dir):
    """Exact page dedup + Dolma-style corpus-wide paragraph dedup in one
    row: each keep_id joins its paragraph-dedup audit (clean_text with
    non-canonical duplicate paragraphs removed, first occurrence by
    (doc_id, position) wins — the oracle re-picks canonicals with a
    row_number window)."""
    from rs_trafilatura_spark.operators.dedup import (
        dedup_exact, paragraph_dedup,
    )

    docs = _docs(spark, sf_dir)
    planted = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 5 < 2,
               F.concat(F.col("text"), F.lit(_SHARED_PARA)))
        .otherwise(F.col("text")),
    )
    pd_audit = paragraph_dedup(planted)
    return dedup_exact(docs).join(
        pd_audit.withColumnRenamed("doc_id", "keep_id")
        .withColumnRenamed("clean_text", "para_clean_text"),
        "keep_id",
    )


def q_token_stats(spark, sf_dir):
    from rs_trafilatura_spark.operators.textstats import token_stats

    return token_stats(_docs(spark, sf_dir))


def q_bpe_token_stats(spark, sf_dir):
    from rs_trafilatura_spark.operators.textstats import bpe_token_stats

    return bpe_token_stats(_docs(spark, sf_dir))


# planted 60-word shared passage (docs with doc_id%6 < 2) so exact
# substring dedup at the paper's n=50 provably cuts spans
_SS_PASSAGE = " ".join(f"shared{i:02d}" for i in range(60))


def q_redact_pii(spark, sf_dir):
    """PII scrub over documents with planted emails/phones (the natural
    corpus has none, so the plant makes the redaction observable); counts
    + redacted text both checked, via Java/RE2-agreeing patterns.
    Consolidated into the same row: Lee et al. 2022 exact substring
    dedup over the corpus with a planted 60-word shared passage — the
    oracle recomputes positional 50-gram hashes, duplicated-hash spans
    and the surviving word stream in SQL."""
    from rs_trafilatura_spark.operators.substring import (
        exact_substring_dedup,
    )
    from rs_trafilatura_spark.operators.textstats import redact_pii

    base = _docs_spread(spark, sf_dir)
    docs = base.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact: user"), _id_str(),
            F.lit("@example.com or 555-123-4567."),
        ).alias("text"),
    )
    planted = base.select(
        "doc_id",
        F.when(F.col("doc_id") % 6 < 2,
               F.concat(F.col("text"), F.lit(" " + _SS_PASSAGE)))
        .otherwise(F.col("text")).alias("text"),
    )
    ss = exact_substring_dedup(planted, n=50).select(
        "doc_id",
        F.col("n_words").alias("ss_n_words"),
        F.col("n_removed").alias("ss_n_removed"),
        F.col("clean_text").alias("ss_clean_text"),
    )
    return redact_pii(docs).join(ss, "doc_id")


def q_chunk_documents(spark, sf_dir):
    """Token-bounded overlapping chunking (training-data windowing) —
    pure-Catalyst one-to-many; the oracle reproduces the chunk grid with
    generate_series + list slicing."""
    from rs_trafilatura_spark.operators.textstats import chunk_documents

    return chunk_documents(_docs(spark, sf_dir), chunk_tokens=64,
                           overlap_tokens=8)


def q_language_id(spark, sf_dir):
    from rs_trafilatura_spark.operators.textstats import language_id

    return language_id(_docs(spark, sf_dir))


def q_quality_score(spark, sf_dir):
    from rs_trafilatura_spark.operators.textstats import quality_score

    return quality_score(_docs(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    """Document fingerprints + benchmark decontamination in one driver
    row (registry consolidation): the benchmark is docs 0-4's texts, so
    those docs — and any doc sharing a 13-word gram with them (the
    corpus's planted exact duplicates do) — must flag, with n_hits =
    the count of distinct overlapping grams the oracle recomputes as a
    string-set intersection."""
    from rs_trafilatura_spark.operators.decontaminate import (
        contamination_hits,
    )
    from rs_trafilatura_spark.operators.textstats import (
        canonical_fingerprint, fingerprint,
    )

    docs = _docs_spread(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") < 5).select("text")
    hits = contamination_hits(docs, bench, n=13)
    base = fingerprint(docs).join(
        canonical_fingerprint(docs), "doc_id"
    ).join(hits, "doc_id", "left").select(
        "doc_id", "fingerprint", "canon_fingerprint",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_contam_hits"),
        F.col("n_hits").isNotNull().alias("contaminated"),
    )
    # DSIR importance scores against the same 5-doc benchmark as the
    # target distribution (Xie et al. 2023): hashed unigram+bigram
    # buckets, integer floor-log2 LLR, exact top-30% selection
    from rs_trafilatura_spark.operators.dsir import (
        dsir_scores, hashed_bucket_counts, select_top_frac,
    )

    target = hashed_bucket_counts(docs.filter(F.col("doc_id") < 5))
    raw = hashed_bucket_counts(docs)
    scored = select_top_frac(
        dsir_scores(docs, target, raw), frac_x100=30,
        total=docs.count(),
    ).withColumnRenamed("selected", "dsir_selected")
    return base.join(scored, "doc_id")


def q_ngram_jaccard(spark, sf_dir):
    from rs_trafilatura_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs_spread(spark, sf_dir))


def q_minhash_lsh(spark, sf_dir):
    """LSH-prefiltered exact near-dup pairs.  Oracle = all-pairs exact
    shingle Jaccard in DuckDB; parity holds because MinHash is deterministic
    and recall at threshold 800 is 1.0 ON THIS CORPUS (verified equal to
    the all-pairs result; the general bounds are probabilistic — banding
    miss (1-s^4)^16 ~ 2e-4 at s=0.8 plus the tier-1 estimate prefilter's
    ~2e-5 near-threshold miss, see lsh_near_dup_pairs' RECALL CONTRACT)."""
    _ensure_pyfiles(spark)
    from rs_trafilatura_spark.operators.dedup import lsh_near_dup_pairs

    return lsh_near_dup_pairs(_docs_spread(spark, sf_dir), threshold_x1000=800)


def q_simhash_near_dups(spark, sf_dir):
    _ensure_pyfiles(spark)
    from rs_trafilatura_spark.operators.dedup import simhash_near_dups

    return simhash_near_dups(_docs_spread(spark, sf_dir))


def q_near_dup_clusters(spark, sf_dir):
    """Transitive near-dup CLUSTER resolution: LSH-verified pairs ->
    alternating large-star/small-star connected components -> canonical
    survivor per cluster.  Oracle = recursive-CTE label propagation over
    the all-pairs exact shingle-Jaccard graph (recall-1.0 argument as in
    minhash_lsh_pairs)."""
    _ensure_pyfiles(spark)
    from rs_trafilatura_spark.operators.dedup import near_dup_clusters

    return near_dup_clusters(_docs_spread(spark, sf_dir), threshold_x1000=800)


# suffix planted onto every document so the line-level rules (bullet,
# ellipsis, terminal punctuation, short lines) all fire deterministically
_QLINES = ("\n- bullet point item\nshort\nTrailing thought goes on..."
           "\nThe final complete sentence with several words is right here.")


def _multiline_docs(spark, sf_dir):
    return _docs_spread(spark, sf_dir).withColumn(
        "text", F.concat(F.col("text"), F.lit(_QLINES))
    )


def q_gopher_quality(spark, sf_dir):
    """Published Gopher corpus-quality rules (Rae et al. 2021 App. A1.1)
    over multi-line text; oracle recomputes every integer-scaled signal
    with DuckDB list/regex functions."""
    from rs_trafilatura_spark.operators.textstats import gopher_quality

    return gopher_quality(_multiline_docs(spark, sf_dir))


def q_c4_lines(spark, sf_dir):
    """C4 line-level cleaning (Raffel et al. 2020 §2.2): terminal-punct +
    min-word line keep, blocklist page drop; the cleaned text itself is
    hash-pinned."""
    from rs_trafilatura_spark.operators.textstats import c4_line_filter

    return c4_line_filter(_multiline_docs(spark, sf_dir))


def q_per_host_quota(spark, sf_dir):
    """Two-phase per-host page quota over the zipfian-host corpus (the hot
    host holds ~half the docs): phase-1 (host,salt) ranks bound every
    task at n rows per bucket, phase-2 ranks exactly — same rows as
    DuckDB's flat row_number()."""
    from rs_trafilatura_spark.operators.windows import capped_per_key

    from rs_trafilatura_spark.operators.urlfilter import url_filter

    hosted = _docs(spark, sf_dir).select(
        "doc_id", _zipf_host().alias("host")
    )
    capped = capped_per_key(hosted, "host", n=5,
                            order_cols=("doc_id",)).select(
        "host", F.col("rank").cast("long").alias("rank"), "doc_id"
    )
    # URL-rule audit folded into the same row: deterministic doc_id%4
    # path classes exercise every rule (clean / spam keyword / blocked
    # extension / double keyword), and the hot zipf host is blocklisted
    mod = F.col("doc_id") % 4
    ds = F.col("doc_id").cast("string")
    path = (
        F.when(mod == 0, F.concat(F.lit("/blog/post-"), ds))
        .when(mod == 1, F.concat(F.lit("/casino/win-"), ds))
        .when(mod == 2, F.concat(F.lit("/static/app-"), ds, F.lit(".js")))
        .otherwise(F.concat(F.lit("/go-lottery-"), ds, F.lit("-xxx")))
    )
    with_urls = hosted.withColumn(
        "url", F.concat(F.lit("https://"), F.col("host"), path)
    )
    audit = url_filter(
        with_urls, blocked_domains=("h0.example",)
    ).select("doc_id", "url", "domain_blocked", "url_kw_hits",
             "ext_blocked", "url_ok")
    return capped.join(audit, "doc_id")


def _revisions(spark, sf_dir):
    """Two crawl revisions of each of 250 urls: doc_id d is revision
    d // 250 of url u{d % 250}, crawled at epoch+d, with revision-specific
    bytes."""
    d = _docs(spark, sf_dir)
    return d.select(
        F.concat(F.lit("https://rev.example/u"),
                 (F.col("doc_id") % 250).cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2026) + F.col("doc_id"))
        .alias("warc_ts"),
        F.encode(F.concat(F.lit("rev"), (F.col("doc_id") / 250).cast("int")
                          .cast("string"), F.lit(":"), F.col("text")),
                 "utf-8").alias("html"),
    )


def q_latest_revision(spark, sf_dir):
    """Authoritative-revision pick per url (newest warc_ts, digest
    tiebreak): the recrawl dedupe every CC-style ingest needs."""
    from rs_trafilatura_spark.operators.delta import latest_revision_per_url

    out = latest_revision_per_url(_revisions(spark, sf_dir))
    return out.select(
        "url",
        F.col("warc_ts").cast("long").alias("ts_epoch"),
        F.md5(F.col("html").cast("binary")).alias("content_md5"),
    )


def q_crawl_delta(spark, sf_dir):
    """Snapshot diff for incremental extraction: old crawl = docs 0-399,
    new crawl = docs 100-499 with content edited in 200-299 -> removed /
    unchanged / changed / added urls."""
    from rs_trafilatura_spark.operators.delta import crawl_delta

    d = _docs(spark, sf_dir).select(
        "doc_id", _synth_url().alias("url"), "text"
    )
    old = d.filter(F.col("doc_id") < 400).select(
        "url", F.encode("text", "utf-8").alias("html")
    )
    new = d.filter(F.col("doc_id") >= 100).select(
        "url",
        F.encode(
            F.when((F.col("doc_id") >= 200) & (F.col("doc_id") < 300),
                   F.concat(F.lit("edited:"), F.col("text")))
            .otherwise(F.col("text")),
            "utf-8",
        ).alias("html"),
    )
    return crawl_delta(new, old)


def q_pack_shards(spark, sf_dir):
    """Token-budget shard assignment AND fixed-length sequence packing in
    one driver row (registry consolidation): per (doc, overlapping
    sequence) row carrying the doc's shard_id (budget 2000) plus the
    seq-64 split arithmetic.  Both run on the distributed prefix sum (no
    global single-task window); oracle = plain global window cumsum +
    LATERAL range explode in DuckDB."""
    from rs_trafilatura_spark.operators.packing import (
        pack_sequences, pack_shards,
    )

    shards = pack_shards(_docs(spark, sf_dir), budget_tokens=2000,
                         bucket_width=64)
    seqs = pack_sequences(_docs(spark, sf_dir), seq_len=64,
                          bucket_width=64)
    return seqs.withColumnRenamed("n_tokens", "piece_tokens").join(
        shards, "doc_id"
    ).select(
        "doc_id", "n_tokens", "shard_id",
        "seq_id", "doc_off", "seq_off", "piece_tokens",
    )


def q_write_shards(spark, sf_dir):
    """The SPLIT-AWARE shard WRITER end to end (r6 widening): leakage-safe
    train/val/test assignment -> per-split pack_shards -> one
    shard-NNNNNNN.txt.gz file per (split, shard) -> the written manifest,
    with content_md5 = md5 of each file's uncompressed payload.  A wrong
    split gate, assignment, ordering, or byte emitted by the writer
    changes the md5 the oracle recomputes from the table alone
    (deterministic doc_id\\tn_tokens\\ttext\\n lines sorted by doc_id,
    cumsum PARTITIONED by split) — this oracle-pins the
    never-mix-splits guarantee of plans/pipeline.py's per-split packing
    composition: a doc in the wrong split lands in the wrong file and
    flips two md5s."""
    import os
    import shutil
    import tempfile

    from rs_trafilatura_spark.operators.packing import (
        pack_shards, split_corpus, write_shards,
    )

    _ensure_pyfiles(spark)
    split_gate = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("long"),
        F.lit(100),
    )
    splits = split_corpus(_docs(spark, sf_dir), key_col="doc_id",
                          gate_col=split_gate)
    out_dir = tempfile.mkdtemp(prefix="rs_traf_shards_")

    # mirrors plans/pipeline.py: packing runs PER SPLIT so a shard
    # file can never contain mixed train/eval text.  The three splits
    # are independent job chains, so they run from a small thread pool
    # (guide §2.6): one split's straggling write tasks back-fill with
    # the next split's pack jobs instead of leaving the cluster idle —
    # results are collected per split and ordered deterministically
    # below, so the output is identical to the serial loop.
    def _run_split(s):
        packed = pack_shards(splits.filter(F.col("split") == s),
                             budget_tokens=2000, bucket_width=64,
                             carry=("text",))
        rows = write_shards(
            packed, os.path.join(out_dir, f"split={s}")).collect()
        return [dict(r.asDict(), split=s) for r in rows]

    from concurrent.futures import ThreadPoolExecutor

    try:
        with ThreadPoolExecutor(max_workers=3) as pool:
            manifest = [d for part in pool.map(_run_split,
                                               ("train", "val", "test"))
                        for d in part]
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return spark.createDataFrame(manifest).select(
        "split", "shard_id", "n_docs", "shard_tokens", "content_md5"
    )


def _query_vec(spark, sf_dir):
    row = (
        _embs(spark, sf_dir).filter(F.col("vec_id") == 0)
        .select("embedding").first()
    )
    return [float(x) for x in row["embedding"]]


def q_embedding_topk(spark, sf_dir):
    from rs_trafilatura_spark.operators.similarity import cosine_topk

    return cosine_topk(_embs(spark, sf_dir), _query_vec(spark, sf_dir),
                       k=10, exclude_id=0)


def _twin(emb_col, power_col_or_int):
    """Scaled copy of an embedding: x * 2^t is an exponent shift, exact in
    both float32 and float64, so the twin's hyperplane signs — and therefore
    its LSH bucket — provably equal the original's.  This is the planted
    structure that makes LSH recall provable against the exact oracle."""
    p = (F.pow(F.lit(2.0), power_col_or_int)
         if not isinstance(power_col_or_int, int)
         else F.lit(float(2 ** power_col_or_int)))
    return F.transform(emb_col, lambda x: (x * p).cast("float"))


def q_ann_lsh_topk(spark, sf_dir):
    """ANN top-10 over the corpus + 10 planted scale-twins of the query
    vector.  The twins share the query's bucket by construction (sign
    pattern preserved exactly), so the probe-0 bucket alone recalls all 10;
    their cosine ~1.0 dominates the natural maximum (~0.37), so the exact
    oracle returns exactly the twins too.  Proves bucketing, probing,
    scoring and ranking end to end."""
    from rs_trafilatura_spark.operators.similarity import ann_topk

    embs = (_embs(spark, sf_dir)
            .select(F.col("vec_id").cast("long").alias("vec_id"),
                    "embedding"))
    base = embs.filter(F.col("vec_id") == 0)
    twins = base.select(
        F.explode(F.array(*[F.lit(t) for t in range(1, 11)])).alias("t"),
        "embedding",
    ).select(
        (F.col("t") + 10000).cast("long").alias("vec_id"),
        _twin(F.col("embedding"), F.col("t")).alias("embedding"),
    )
    corpus = embs.unionByName(twins)
    return ann_topk(corpus, _query_vec(spark, sf_dir), k=10, exclude_id=0)


def q_ivf_ann_topk(spark, sf_dir):
    """IVF (coarse-quantizer) ANN top-10 — the second scale path next to
    LSH — over the corpus + 10 planted scale-twins of the query vector.
    Cosine argmax is scale-invariant, so each twin provably lands in the
    query's cell; the query's own cell is probe #1, so recall of all 10
    twins is 1.0 by construction and the exact oracle must agree."""
    from rs_trafilatura_spark.operators.similarity import ivf_topk

    embs = (_embs(spark, sf_dir)
            .select(F.col("vec_id").cast("long").alias("vec_id"),
                    "embedding"))
    base = embs.filter(F.col("vec_id") == 0)
    twins = base.select(
        F.explode(F.array(*[F.lit(t) for t in range(1, 11)])).alias("t"),
        "embedding",
    ).select(
        (F.col("t") + 10000).cast("long").alias("vec_id"),
        _twin(F.col("embedding"), F.col("t")).alias("embedding"),
    )
    corpus = embs.unionByName(twins)
    return ivf_topk(corpus, _query_vec(spark, sf_dir), k=10,
                    n_cells=16, n_probe=4, exclude_id=0)


def q_knn_join(spark, sf_dir):
    from rs_trafilatura_spark.operators.similarity import knn_join_exact

    return knn_join_exact(_embs(spark, sf_dir), k=3)


def q_knn_join_lsh(spark, sf_dir):
    """LSH KNN self-join (k=1) over the corpus + one scale-twin per vector.
    Every vector's nearest neighbor is its twin (cosine ~1.0 vs natural max
    ~0.37) and every twin provably shares its original's bucket, so LSH
    recall is 1.0 by construction and the exact all-pairs oracle must agree
    row for row."""
    from rs_trafilatura_spark.operators.similarity import knn_join_lsh

    embs = (_embs(spark, sf_dir)
            .select(F.col("vec_id").cast("long").alias("vec_id"),
                    "embedding"))
    twins = embs.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        _twin(F.col("embedding"), 1).alias("embedding"),
    )
    corpus = embs.unionByName(twins)
    return knn_join_lsh(corpus, k=1, dim=64)


def q_embedding_near_dups(spark, sf_dir):
    """Embedding near-dup family, two methods in one row set:

    method='pairs' — LSH-candidate near-dup pairs over the corpus + one
    scale-twin per vector: every (v, 2v) pair sits at cosine ~1.0 and
    provably shares v's LSH bucket, while the natural pair maximum
    (~0.37) is far below the 0.9 threshold — so the exact all-pairs
    oracle must return exactly the twin pairs, and LSH recall is 1.0 by
    construction.

    method='semdedup' — SemDeDup (Abbas et al. 2023) keep/drop verdicts
    over the corpus + x2 twins for vec_id%3==0 and x4 twins for
    vec_id%6==0.  Scale twins share their original's k-means cell
    (cosine argmax is scale-invariant, exactly in floats) and tie on
    cent_x1000, so the within-cluster triu greedy reduces to vec_id
    order inside each twin group — the all-pairs oracle (partner count +
    "exists a smaller-id partner") is provably the same computation, no
    centroids needed in SQL."""
    from rs_trafilatura_spark.operators.similarity import (
        embedding_near_dup_pairs,
        semdedup,
    )

    embs = (_embs(spark, sf_dir)
            .select(F.col("vec_id").cast("long").alias("vec_id"),
                    "embedding"))
    twins = embs.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        _twin(F.col("embedding"), 1).alias("embedding"),
    )
    pairs = embedding_near_dup_pairs(
        embs.unionByName(twins), cos_threshold_x1000=900, dim=64
    ).select(
        F.lit("pairs").alias("method"), "a_id", "b_id", "cos_x1000",
        F.lit(None).cast("long").alias("n_dup_cands"),
        F.lit(None).cast("long").alias("kept"),
    )
    t2 = embs.filter(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        _twin(F.col("embedding"), 1).alias("embedding"),
    )
    t4 = embs.filter(F.col("vec_id") % 6 == 0).select(
        (F.col("vec_id") + 20000).alias("vec_id"),
        _twin(F.col("embedding"), 2).alias("embedding"),
    )
    sd = semdedup(
        embs.unionByName(t2).unionByName(t4), n_cells=16,
        cos_threshold_x1000=900,
    ).select(
        F.lit("semdedup").alias("method"),
        F.col("vec_id").alias("a_id"),
        F.lit(None).cast("long").alias("b_id"),
        F.lit(None).cast("long").alias("cos_x1000"),
        "n_dup_cands",
        # kept as 0/1 BIGINT: NULL booleans land asymmetrically in pandas
        # (None vs NaN) across the two engines; NULL BIGINTs agree
        F.col("kept").cast("long").alias("kept"),
    )
    return pairs.unionByName(sd)


def q_multimodal_image_meta(spark, sf_dir):
    _ensure_pyfiles(spark)
    from rs_trafilatura_spark.operators.multimodal import (
        documents_as_fake_images,
        extract_image_metadata,
    )

    return extract_image_metadata(
        documents_as_fake_images(_docs(spark, sf_dir))
    ).select("doc_id", "byte_len", "fake_width", "fake_height")




def q_multimodal_resize(spark, sf_dir):
    _ensure_pyfiles(spark)
    from rs_trafilatura_spark.operators.multimodal import (
        documents_as_fake_images,
        resize_images,
    )

    return resize_images(documents_as_fake_images(_docs(spark, sf_dir)),
                         max_dim=256)


def q_multimodal_frame_sample(spark, sf_dir):
    """One-to-many frame sampling: output cardinality is sum(ceil(len/64))
    over docs — the oracle reproduces the explosion with generate_series."""
    _ensure_pyfiles(spark)
    from rs_trafilatura_spark.operators.multimodal import (
        documents_as_fake_images,
        sample_frames,
    )

    return sample_frames(documents_as_fake_images(_docs(spark, sf_dir)))


def q_pdf_roundtrip(spark, sf_dir):
    """The PDF text layer end-to-end: every document rendered into a
    real Flate-compressed single-page PDF, then extracted back — the
    text must round-trip exactly (functions/pdf.py; the 'PDF/layout
    parse' slot of the extraction tier)."""
    _ensure_pyfiles(spark)
    from rs_trafilatura_spark.operators.multimodal import (
        documents_as_pdfs,
        extract_pdf_text_column,
    )

    out = extract_pdf_text_column(documents_as_pdfs(_docs(spark, sf_dir)))
    return out.select("doc_id", F.col("pdf_text").alias("text"))


def q_page_type_features(spark, sf_dir):
    _ensure_pyfiles(spark)
    from rs_trafilatura_spark.operators.features import page_type_features

    out = page_type_features(_wrap_roundtrip(_docs(spark, sf_dir)))
    # a few named slots for readability, plus a checksum over ALL 89 slots
    # (sum of floor(1000*slot) — integer arithmetic, so float summation
    # order can't flip the hash) pinning the whole vector to the oracle
    checksum = F.aggregate(
        F.transform("features", lambda x: F.floor(x * 1000)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return out.select(
        "url",
        F.element_at("features", 10).alias("f_article_path"),
        F.element_at("features", 15).alias("f_p_count"),
        F.element_at("features", 19).alias("f_has_article"),
        F.size("features").alias("n_features"),
        checksum.alias("checksum_x1000"),
    )


def q_extract_structured(spark, sf_dir):
    """Structured output surfaces: the whitelist HTML emitter and the GFM
    markdown walker over an h2+p+ul article — both fully predictable from
    the template constants (traversal.py::extract_filtered_html,
    functions/markdown.py)."""
    from rs_trafilatura_spark.options import Options

    out = _run_kernel(spark, _wrap_structured(_docs(spark, sf_dir)),
                      Options(output_markdown=True))
    return out.select("url", "content_html", "content_markdown")


def q_markdown_escapes(spark, sf_dir):
    """GFM escaping pinned end-to-end: matched emphasis pairs survive,
    stray markdown specials escape, and html_table_to_markdown-style pipe
    escaping applies inside table cells."""
    from rs_trafilatura_spark.options import Options

    out = _run_kernel(spark, _wrap_mdesc(_docs(spark, sf_dir)),
                      Options(output_markdown=True))
    return out.select("url", "content_html", "content_markdown")


def q_extract_images(spark, sf_dir):
    """Image extraction surface (extract.rs:3352-3565 semantics): figure
    caption pairing, filename derivation, og:image hero match; one output
    row per image via posexplode."""
    from rs_trafilatura_spark.options import Options

    out = _run_kernel(spark, _wrap_images(_docs(spark, sf_dir)),
                      Options(include_images=True))
    img = F.posexplode("images")
    return out.select("url", img).select(
        "url",
        F.col("pos").cast("long").alias("img_idx"),
        F.col("col.src").alias("src"),
        F.col("col.filename").alias("filename"),
        F.col("col.alt").alias("alt"),
        F.col("col.caption").alias("caption"),
        F.col("col.is_hero").alias("is_hero"),
    )


def q_extract_comments(spark, sf_dir):
    """Comments surface: #comments id-probe, filtered traversal with
    comment classes as content, min_output_comm_size word gate
    (extract.rs:3568-3636, 1123-1133); article text must stay free of the
    comment bodies."""
    from rs_trafilatura_spark.options import Options

    out = _run_kernel(spark, _wrap_comments(_docs(spark, sf_dir)),
                      Options(include_comments=True))
    return out.select(
        "url",
        F.col("content_text").alias("text"),
        "comments_text",
        "comments_html",
    )


def q_page_type_predict(spark, sf_dir):
    """End-to-end page-type prediction on the three URL-typed families:
    URL stage and ML stage agree on every page, so
    classification_confidence is exactly the 1.0 agreement constant
    (extract.rs:55-92)."""
    out = _run_kernel(spark, _wrap_typed(_docs(spark, sf_dir)))
    family = (
        F.when(F.col("url").startswith("https://community."), F.lit("forum"))
        .when(F.col("url").startswith("https://shop."), F.lit("product"))
        .otherwise(F.lit("documentation"))
    )
    return out.select(
        "url", family.alias("family"), "page_type",
        F.col("classification_confidence").alias("confidence"),
    )


def q_extract_fallback_spans(spark, sf_dir):
    """Source-anchored spans on the baseline rescue stage: both rescued
    <p> nodes must carry source-html offsets computable from the template
    constants (kernel/fallback.py::baseline span emission)."""
    docs = _docs(spark, sf_dir).filter(F.length("text") >= 300)
    out = _run_kernel(spark, _wrap_fallback(docs))
    s1 = F.element_at("spans", 1)
    s2 = F.element_at("spans", 2)
    return out.select(
        "url",
        "stage",
        F.col("content_text").alias("text"),
        F.size("spans").cast("long").alias("n_spans"),
        s1.getField("kind").alias("s1_kind"),
        s1.getField("start").alias("s1_start"),
        (s1.getField("end") - s1.getField("start")).alias("s1_len"),
        s2.getField("kind").alias("s2_kind"),
        s2.getField("start").alias("s2_start"),
        (s2.getField("end") - s2.getField("start")).alias("s2_len"),
    )


def _pp_docs(spark, sf_dir):
    return _docs(spark, sf_dir).filter(
        F.col("text").isNotNull()
        & F.length("text").between(_PP_LEN_MIN, _PP_LEN_MAX)
    )


def _pp_options(page_type: str):
    from rs_trafilatura_spark.options import Options

    return Options(page_type=page_type, use_fallback_extraction=False)


def _span_cols(out, n: int):
    cols = [F.size("spans").cast("long").alias("n_spans")]
    for k in range(1, n + 1):
        s = F.element_at("spans", k)
        cols += [
            s.getField("kind").alias(f"s{k}_kind"),
            s.getField("start").alias(f"s{k}_start"),
            (s.getField("end") - s.getField("start")).alias(f"s{k}_len"),
        ]
    return cols


_ZH_HOSTS = 37  # tail hosts; even doc_ids all land on h0 (~50% of pages)


def _zipf_host():
    """Deterministic zipf-ish host: half the corpus on one hot host, the
    rest spread over _ZH_HOSTS tails — the skew shape salting exists for."""
    hid = F.when(F.col("doc_id") % 2 == 0, F.lit(0)).otherwise(
        F.col("doc_id") % _ZH_HOSTS
    )
    return F.concat(F.lit("h"), hid.cast("string"), F.lit(".example"))


def _wrap_hosted(documents: DataFrame) -> DataFrame:
    """Template H: the roundtrip article page, but URLs keyed by the
    zipfian host — input for the salted host-keyed aggregation path."""
    i = _id_str()
    html = F.concat(
        F.lit(_RT_P1), F.col("lang"),
        F.lit(_RT_P3), i,
        F.lit(_RT_P5 + "<p>"),
        F.col("text"),
        F.lit(_RT_P7),
    )
    return documents.select(
        F.concat(F.lit("https://"), _zipf_host(), F.lit("/blog/doc-"), i)
        .alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2026) + F.col("doc_id")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("lang"),
    )


def q_host_stats_salted(spark, sf_dir):
    """The documented zipfian-host answer (plans/job.py::salted_host,
    PLANS.md §4) under the oracle: extraction -> per-(host, salt) partial
    aggregation -> per-host final combine.  The hot host's rows spread over
    SALT buckets in the first (wide) aggregation, so no task ever sees the
    whole hot host; the second aggregation combines one row per (host,
    salt).  Values are exact integers (count + summed text length), so the
    two-stage plan must agree with DuckDB's flat GROUP BY."""
    from rs_trafilatura_spark.plans.job import salted_host

    out = _run_kernel(spark, _wrap_hosted(_docs(spark, sf_dir)))
    host = F.substring_index(F.substring_index("url", "/", 3), "/", -1)
    partial = (
        out.groupBy(salted_host(host, F.col("url"), 8).alias("_hs"))
        .agg(
            F.count("*").alias("_n"),
            F.sum(F.length("content_text")).alias("_len"),
        )
    )
    return (
        partial.groupBy(
            F.substring_index("_hs", "#", 1).alias("host")
        )
        .agg(
            F.sum("_n").cast("long").alias("n_pages"),
            F.sum("_len").cast("long").alias("sum_len"),
        )
    )


_SG_MOD = 8          # doc_id % _SG_MOD == 3 picks a deterministic handful
_SG_BODY_CHARS = 1_050_000   # body text over the 1 MB prune-skip guard
_SG_MAX_LEN = 100_000        # Options.max_extracted_len for the query


def _wrap_size_guards(documents: DataFrame) -> DataFrame:
    """Template G: multi-MB article pages exercising the size-guard ladder
    (cleaning.py MAX_PRUNE_DOCUMENT_SIZE skip; extract.py max_extracted_len
    truncation + exact reference warning, extract.rs:1113-1120; the
    reference's own 10 MB robustness gate is extract.rs:3901-3918).  Each
    page repeats the document paragraph until body text exceeds 1 MB."""
    i = _id_str()
    reps = F.expr(
        f"repeat('<p>' || text || '</p>', "
        f"CAST(ceil({_SG_BODY_CHARS} / length(text)) AS INT))"
    )
    html = F.concat(
        F.lit('<!doctype html><html lang="en"><head><title>Doc '), i,
        F.lit(" - Big Site</title></head><body><article>"), reps,
        F.lit("</article></body></html>"),
    )
    return documents.select(
        F.concat(F.lit("https://big.example/blog/doc-"), i).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2026) + F.col("doc_id")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("lang"),
    )


def q_extract_size_guards(spark, sf_dir):
    """Size-guard ladder end-to-end: >1 MB body (prune skip), truncation to
    max_extracted_len with the exact reference warning, and the truncated
    text itself hash-pinned (substr arithmetic in the oracle)."""
    from rs_trafilatura_spark.options import Options

    docs = _pp_docs(spark, sf_dir).filter(
        F.col("doc_id") % _SG_MOD == F.lit(3)
    )
    out = _run_kernel(spark, _wrap_size_guards(docs),
                      Options(max_extracted_len=_SG_MAX_LEN))
    return out.select(
        "url", "stage",
        F.length("content_text").cast("long").alias("content_len"),
        F.col("content_text").alias("text"),
        F.size("warnings").cast("long").alias("n_warnings"),
        F.element_at("warnings", 1).alias("warning"),
    )


def q_extract_merge(spark, sf_dir):
    """Stage `merge`: the service-profile multi-candidate merge post pass
    fires and all three merged candidates carry SOURCE-anchored spans in
    score order (doc section, div.content, fixed section)."""
    out = _run_kernel(spark, _wrap_merge(_pp_docs(spark, sf_dir)),
                      _pp_options("service"))
    return out.select(
        "url", "stage", F.col("content_text").alias("text"),
        *_span_cols(out, 3),
    )


def q_extract_repeated_items(spark, sf_dir):
    """Stage `repeated_items`: collection-profile card-grid collection
    replaces the selected description node, which is then prepended as the
    collection description; spans are the three source li nodes."""
    out = _run_kernel(spark, _wrap_collection(_pp_docs(spark, sf_dir)),
                      _pp_options("collection"))
    return out.select(
        "url", "stage", F.col("content_text").alias("text"),
        *_span_cols(out, 3),
    )


def q_extract_jsonld_product(spark, sf_dir):
    """Stage `jsonld_product`: the structured Product description overrides
    a too-short DOM body; spans are output-relative (out:jsonld_product)."""
    out = _run_kernel(spark, _wrap_jsonld_product(_pp_docs(spark, sf_dir)),
                      _pp_options("product"))
    return out.select(
        "url", "stage", F.col("content_text").alias("text"),
        *_span_cols(out, 1),
    )


def q_extract_discourse(spark, sf_dir):
    """Stage `discourse`: the #data-preloaded JSON-in-JSON payload is the
    only content on the page and must win over the (empty) DOM result."""
    out = _run_kernel(spark, _wrap_discourse(_pp_docs(spark, sf_dir)),
                      _pp_options("article"))
    return out.select(
        "url", "stage", F.col("content_text").alias("text"),
        *_span_cols(out, 1),
    )


# --- registry consolidation (round 5) --------------------------------------
# The driver caps one correctness run at 50 queries taken in registry order
# (CORRECTNESS_r04.json == the first 50 keys of the r4 registry), so the
# multi-variant families below are folded into single driver rows: a UNION
# with a discriminator column when the variants share a schema, a doc_id
# join when they are per-doc signals over the same input.  Every folded
# variant keeps its own q_* function (used here and by tests); only the
# registry key merges.


def q_extract_special_stages(spark, sf_dir):
    """Stages `jsonld_product` + `discourse` as one driver row set; the
    `stage` column discriminates.  Covers extract.rs:292-318 (structured
    Product description beats a too-short DOM) and extractor/
    fallback.rs:44-110 (#data-preloaded JSON-in-JSON)."""
    return q_extract_jsonld_product(spark, sf_dir).unionByName(
        q_extract_discourse(spark, sf_dir)
    )


def q_ann_topk_methods(spark, sf_dir):
    """All three ANN top-k paths — exact cosine, LSH-bucketed, IVF coarse
    quantizer — as one driver row set with a `method` column.  The lsh/ivf
    halves keep their planted scale-twin corpora, so the exact oracle's
    agreement still proves bucketing/probing/ranking end to end."""
    return (
        q_embedding_topk(spark, sf_dir)
        .select(F.lit("exact").alias("method"), "*")
        .unionByName(q_ann_lsh_topk(spark, sf_dir)
                     .select(F.lit("lsh").alias("method"), "*"))
        .unionByName(q_ivf_ann_topk(spark, sf_dir)
                     .select(F.lit("ivf").alias("method"), "*"))
    )


def q_knn_join_methods(spark, sf_dir):
    """Exact all-pairs KNN self-join (k=3) and LSH KNN join (k=1, twin
    corpus) as one driver row set with a `method` column."""
    return (
        q_knn_join(spark, sf_dir)
        .select(F.lit("exact").alias("method"), "*")
        .unionByName(q_knn_join_lsh(spark, sf_dir)
                     .select(F.lit("lsh").alias("method"), "*"))
    )


def _moji_plant() -> str:
    """Planted mojibake suffix, built FROM the repair table so it always
    round-trips: ' caf<moji é> <moji “>fixed<moji ”>'."""
    from rs_trafilatura_spark.operators.textstats import MOJIBAKE_PAIRS

    m = {ch: moji for moji, ch in MOJIBAKE_PAIRS}
    return " caf" + m["é"] + " " + m["“"] + "fixed" + m["”"]


def q_token_stats_full(spark, sf_dir):
    """Whitespace token stats + BPE-ish regex token stats joined per doc
    (both are per-doc projections of the same table, so the join is
    cardinality-preserving).  Consolidated into the same row: mojibake
    repair (ftfy's cp1252/latin-1 double-encoding case) over docs with a
    planted broken suffix on doc_id%3==1 — the oracle replays the same
    30-entry replace chain."""
    from rs_trafilatura_spark.operators.textstats import fix_mojibake

    base = _docs(spark, sf_dir)
    planted = base.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 1,
               F.concat(F.col("text"), F.lit(_moji_plant())))
        .otherwise(F.col("text")).alias("text"),
    )
    fm = fix_mojibake(planted).select(
        "doc_id",
        F.col("fixed_text").alias("moji_fixed_text"),
        "moji_changed",
    )
    return q_token_stats(spark, sf_dir).join(
        q_bpe_token_stats(spark, sf_dir), "doc_id"
    ).join(fm, "doc_id")


# Planted repetition for the Gopher A1.2 signals: doc_id%4 picks a
# deterministic suffix (repeated paragraph / spammy n-gram run / repeated
# line / nothing) so every repetition signal fires on a known subset.
# The oracle mirrors this CASE exactly.
_REP_PARA = ("\n\nPlanted paragraph body here."
             "\n\nPlanted paragraph body here.")
_REP_SPAM = ("\nclick here click here click here click here click here"
             " click here")
_REP_LINE = "\nA planted duplicate line.\nA planted duplicate line."


def _repetition_docs(spark, sf_dir):
    d = _docs_spread(spark, sf_dir)
    mod = F.col("doc_id") % 4
    suffix = (
        F.when(mod == 0, F.lit(_REP_PARA))
        .when(mod == 1, F.lit(_REP_SPAM))
        .when(mod == 2, F.lit(_REP_LINE))
        .otherwise(F.lit(""))
    )
    return d.withColumn("text", F.concat(F.col("text"), suffix))


def q_gopher_repetition(spark, sf_dir):
    """Gopher repetition filters (Rae et al. 2021 App. A1.2): duplicate
    line/paragraph (char) fractions, top n-gram char fraction (n=2..4),
    duplicated n-gram char fraction (n=5..10, overlap counted once) —
    Arrow-batched map-only pass; oracle recomputes every signal with
    DuckDB unnest/group-by positional SQL."""
    _ensure_pyfiles(spark)
    from rs_trafilatura_spark.operators.textstats import gopher_repetition

    return gopher_repetition(_repetition_docs(spark, sf_dir))


def q_corpus_quality_rules(spark, sf_dir):
    """Gopher corpus-quality signals (Rae et al. 2021 App. A1.1) + C4
    line-level cleaning (Raffel et al. 2020 section 2.2) + Gopher A1.2
    repetition filters joined per doc (each family over its own
    deterministic text variant)."""
    return (
        q_gopher_quality(spark, sf_dir)
        .join(q_c4_lines(spark, sf_dir), "doc_id")
        .join(q_gopher_repetition(spark, sf_dir), "doc_id")
    )


def q_ccnet_lm(spark, sf_dir):
    """CCNet-style LM quality bucketing (Wenzek et al. 2020): self-trained
    unigram counts -> integer floor-log2 surprisal per doc -> global
    head/middle/tail thirds.  The oracle recomputes vocabulary, surprisal
    and ntile in DuckDB; length(bin(cnt)) keeps the 'log' integer-exact
    in both engines."""
    _ensure_pyfiles(spark)
    from rs_trafilatura_spark.operators.lm import ccnet_pipeline

    return (
        ccnet_pipeline(_docs(spark, sf_dir).select("doc_id", "text"))
        .withColumnRenamed("n_tokens", "lm_n_tokens")
        .withColumnRenamed("bucket", "ppl_bucket")
    )


def q_text_quality_id(spark, sf_dir):
    """Language-ID hits/guess + quality-score signals + CCNet LM
    surprisal/bucket joined per doc."""
    return (
        q_language_id(spark, sf_dir)
        .join(q_quality_score(spark, sf_dir), "doc_id")
        .join(q_ccnet_lm(spark, sf_dir), "doc_id")
    )


def q_multimodal_image_pipeline(spark, sf_dir):
    """Fake-image metadata extraction + resize joined per doc — the two
    fixed-cardinality stages of the image pipeline (frame sampling stays
    its own row: it explodes cardinality)."""
    return q_multimodal_image_meta(spark, sf_dir).join(
        q_multimodal_resize(spark, sf_dir), "doc_id"
    )


def q_crawl_revisions_delta(spark, sf_dir):
    """Recrawl handling as one driver row set: authoritative-revision pick
    per url (kind='latest') + snapshot diff statuses (kind='delta'); the
    two halves run over different planted corpora, so schemas are padded
    with typed NULLs rather than joined."""
    latest = q_latest_revision(spark, sf_dir).select(
        F.lit("latest").alias("kind"), "url", "ts_epoch", "content_md5",
        F.lit(None).cast("string").alias("status"),
    )
    delta = q_crawl_delta(spark, sf_dir).select(
        F.lit("delta").alias("kind"), "url",
        F.lit(None).cast("long").alias("ts_epoch"),
        F.lit(None).cast("string").alias("content_md5"), "status",
    )
    return latest.unionByName(delta)


def q_curation_audit(spark, sf_dir):
    """The composed curation pipeline a pretraining user actually runs
    (plans/curate.py): extraction -> quality gate -> language gate ->
    exact dedup -> LSH near-dup marking, audited as (method, url, kept,
    drop_reason) over a corpus with planted short/low-quality/duplicate/
    near-duplicate rows PLUS a 3-node near-dup star (see _CH_ROWS) on
    which the pairwise-loser and cluster-survivor rules provably diverge:
    'pairs' keeps both star leaves, 'clusters' keeps exactly one of the
    three.  page_type is pinned so the quality heuristic is
    SQL-reproducible; the near-dup id is an md5-prefix so the survivor
    choice is too."""
    from rs_trafilatura_spark.options import Options
    from rs_trafilatura_spark.plans.curate import (
        curate_pages, mark_near_duplicates,
    )

    pages = _wrap_curation(_docs(spark, sf_dir))
    curated = curate_pages(
        spark, pages, Options(page_type="article"),
        min_quality=0.5, min_chars=200, languages=("en",),
    )
    # caller-owned persist: both audit passes (and the driver's final
    # collect) read the SAME materialized extraction instead of
    # re-running the kernel per near-dup method (mark_near_duplicates
    # leaves caller-persisted inputs alone).  The previous call's cache
    # is released here so repeated bench/driver invocations don't stack.
    from pyspark import StorageLevel

    while _CUR_AUDIT_CACHE:
        _CUR_AUDIT_CACHE.pop().unpersist()
    curated = curated.persist(StorageLevel.MEMORY_AND_DISK)
    _CUR_AUDIT_CACHE.append(curated)

    def audit(method):
        marked = mark_near_duplicates(curated, 800, id_col=_md5_id,
                                      method=method)
        return marked.select(
            F.lit(method if method != "exact" else "pairs").alias("method"),
            "url",
            F.col("drop_reason").isNull().alias("kept"),
            "drop_reason",
        )

    # the two near-dup semantics over the SAME gated corpus; collect the
    # first before the second call releases its owned caches
    rows_pairs = audit("exact").collect()
    out_clusters = audit("clusters")
    return spark.createDataFrame(
        rows_pairs, out_clusters.schema
    ).unionByName(out_clusters)


def q_resume_manifest(spark, sf_dir):
    """Checkpoint/resume under the driver's eye: run the chunked
    extraction twice into the same output dir — run 1 writes all 4 chunks
    + manifest entries, run 2 (with input-fingerprint verification on)
    must skip all 4 via the manifest anti-join
    (sources/checkpoint.py:90-140).  Emits the manifest table; chunk
    assignment uses an md5-prefix id so the oracle can recompute it."""
    import shutil
    import tempfile

    from pyspark.sql import types as T
    from rs_trafilatura_spark.sources.checkpoint import (
        completed_chunks, run_extraction_checkpointed,
    )

    _ensure_pyfiles(spark)
    out_dir = tempfile.mkdtemp(prefix="rs_traf_resume_")
    try:
        pages = _wrap_roundtrip(_docs(spark, sf_dir))

        def chunk(url_col):
            return F.pmod(_md5_id(url_col), F.lit(4))

        s1 = run_extraction_checkpointed(
            spark, pages, out_dir, n_chunks=4, chunk_col=chunk
        )
        s2 = run_extraction_checkpointed(
            spark, pages, out_dir, n_chunks=4, chunk_col=chunk,
            verify_input_fingerprint=True,
        )
        manifest = completed_chunks(out_dir)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    rows = [
        (int(k), int(v["rows"]), int(v["input_rows"]),
         int(s1["chunks_run"]), int(s2["chunks_skipped"]))
        for k, v in sorted(manifest.items())
    ]
    schema = T.StructType([
        T.StructField("chunk_id", T.LongType()),
        T.StructField("rows", T.LongType()),
        T.StructField("input_rows", T.LongType()),
        T.StructField("run1_chunks_run", T.LongType()),
        T.StructField("run2_chunks_skipped", T.LongType()),
    ])
    return spark.createDataFrame(rows, schema)


_STREAM_SEQ = [0]


def q_streaming_roundtrip(spark, sf_dir):
    """The Structured Streaming path under the driver's eye: readStream
    over the roundtrip pages -> watermark + dropDuplicates -> the SAME
    mapInPandas kernel -> memory sink, driven to completion
    (streaming/pipeline.py).  Results must match the batch roundtrip."""
    import shutil
    import tempfile

    _ensure_pyfiles(spark)
    from rs_trafilatura_spark.streaming.pipeline import run_stream_to_memory

    src = tempfile.mkdtemp(prefix="rs_traf_stream_rt_")
    _STREAM_SEQ[0] += 1
    name = f"stream_rt_{os.getpid()}_{_STREAM_SEQ[0]}"
    try:
        pages = _wrap_roundtrip(_docs(spark, sf_dir)).withColumn(
            "text", F.lit(None).cast("string")
        )
        pages.write.mode("overwrite").parquet(src)
        out = run_stream_to_memory(spark, src, query_name=name)
        # materialize from the memory sink before the source dir is removed
        rows = out.select(
            "url",
            F.col("content_text").alias("text"),
            F.col("language").alias("lang"),
        )
        rows.count()
        return rows
    finally:
        shutil.rmtree(src, ignore_errors=True)


def q_streaming_window_metrics(spark, sf_dir):
    """Watermarked tumbling-window stage metrics over the extraction
    stream (the streaming form of stage_metrics), in complete mode so all
    3 planted 10-minute windows emit deterministically."""
    import shutil
    import tempfile

    _ensure_pyfiles(spark)
    from rs_trafilatura_spark.streaming.pipeline import (
        extraction_stream,
        read_pages_stream,
        windowed_stage_metrics_stream,
    )

    src = tempfile.mkdtemp(prefix="rs_traf_stream_win_")
    _STREAM_SEQ[0] += 1
    name = f"stream_win_{os.getpid()}_{_STREAM_SEQ[0]}"
    try:
        # _wrap_roundtrip loses doc_id; rebuild warc_ts from the docs table
        docs = _docs(spark, sf_dir)
        pages = _wrap_roundtrip(docs).drop("warc_ts").join(
            docs.select(
                _synth_url().alias("url"),
                F.timestamp_seconds(
                    F.lit(_EPOCH_2026) + (F.col("doc_id") % 3) * 600
                ).alias("warc_ts"),
            ),
            "url",
        ).withColumn("text", F.lit(None).cast("string"))
        pages.write.mode("overwrite").parquet(src)
        extracted = extraction_stream(read_pages_stream(spark, src))
        metrics = windowed_stage_metrics_stream(extracted, set_watermark=False)
        q = (metrics.writeStream.outputMode("complete")
             .format("memory").queryName(name)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()
        rows = spark.sql(f"SELECT * FROM {name}")
        rows.count()
        return rows
    finally:
        shutil.rmtree(src, ignore_errors=True)


def q_topk_per_source(spark, sf_dir):
    from rs_trafilatura_spark.operators.windows import topk_docs_per_source

    return topk_docs_per_source(_docs(spark, sf_dir), k=2)


def q_sessionize_events(spark, sf_dir):
    from rs_trafilatura_spark.operators.windows import sessionize_events

    _utc(spark)
    return sessionize_events(
        spark.read.parquet(f"{sf_dir}/events.parquet"), gap_minutes=30
    )


# --- contract -----------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction cascade round-trip on sf0.001."""
    return q_extract_roundtrip(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # EXACTLY 50 keys: the driver caps one correctness run at 50 queries in
    # registry order (r4 evidence: CORRECTNESS_r04.json == the first 50 of
    # the 59-key r4 registry, leaving 9 rows unexercised).  Multi-variant
    # families are folded (see "registry consolidation" above) so every
    # capability is driver-oracled in a single run.  Keep this at <= 50.
    return {
        "extract_roundtrip": q_extract_roundtrip,
        "extract_fastscan": q_extract_fastscan,
        "warc_roundtrip": q_warc_roundtrip,
        "warc_cdx_fetch": q_warc_cdx_fetch,
        "streaming_warc_roundtrip": q_streaming_warc_roundtrip,
        "extract_incremental": q_extract_incremental,
        "mixture_weights": q_mixture_weights,
        "extract_metadata": q_extract_metadata,
        "extract_metadata_full": q_extract_metadata_full,
        "corpus_datasheet": q_corpus_datasheet,
        "quality_heuristic": q_quality_heuristic,
        "dedup_exact": q_dedup_exact,
        "token_stats_full": q_token_stats_full,
        "redact_pii": q_redact_pii,
        "chunk_documents": q_chunk_documents,
        "text_quality_id": q_text_quality_id,
        "doc_fingerprint": q_fingerprint,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_lsh_pairs": q_minhash_lsh,
        "simhash_near_dups": q_simhash_near_dups,
        "near_dup_clusters": q_near_dup_clusters,
        "pack_shards": q_pack_shards,
        "write_shards": q_write_shards,
        "corpus_quality_rules": q_corpus_quality_rules,
        "per_host_quota": q_per_host_quota,
        "crawl_revisions_delta": q_crawl_revisions_delta,
        "ann_topk_methods": q_ann_topk_methods,
        "knn_join_methods": q_knn_join_methods,
        "embedding_near_dups": q_embedding_near_dups,
        "multimodal_image_pipeline": q_multimodal_image_pipeline,
        "multimodal_frame_sample": q_multimodal_frame_sample,
        "pdf_roundtrip": q_pdf_roundtrip,
        "page_type_features": q_page_type_features,
        "extract_structured": q_extract_structured,
        "markdown_escapes": q_markdown_escapes,
        "extract_images": q_extract_images,
        "extract_comments": q_extract_comments,
        "page_type_predict": q_page_type_predict,
        "extract_fallback_spans": q_extract_fallback_spans,
        "extract_size_guards": q_extract_size_guards,
        "host_stats_salted": q_host_stats_salted,
        "extract_merge": q_extract_merge,
        "extract_repeated_items": q_extract_repeated_items,
        "extract_special_stages": q_extract_special_stages,
        "curation_audit": q_curation_audit,
        "resume_manifest": q_resume_manifest,
        "streaming_roundtrip": q_streaming_roundtrip,
        "streaming_window_metrics": q_streaming_window_metrics,
        "topk_per_source": q_topk_per_source,
        "sessionize_events": q_sessionize_events,
    }


_SHINGLES_CTE = (
    "WITH d AS (SELECT doc_id, string_split(text, ' ') AS words "
    "FROM documents), "
    "s AS (SELECT doc_id, CASE WHEN len(words) < 3 "
    "THEN [array_to_string(words, ' ')] "
    "ELSE list_distinct(list_transform(range(1, len(words) - 1), "
    "i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) END AS sh "
    "FROM d)"
)


def _simhash_pairs_sql(hamming_threshold: int = 3) -> str:
    """All-pairs SimHash Hamming oracle with the fingerprint computed IN SQL
    (same construction as operators/dedup.py::_simhash64: per word-occurrence
    md5 top-64-bits, per-bit +-1 vote, majority sign).  hashlib.md5 big-endian
    first 8 bytes == the first 16 hex chars of DuckDB's md5()."""
    # power-of-two arithmetic instead of shifts: DuckDB's << works on
    # BIGINT and overflows at bit 63
    sums = ", ".join(
        f"sum(CASE WHEN (h // {1 << p}::UBIGINT) % 2 = 1 THEN 1 ELSE -1 END)"
        f" AS s{p}"
        for p in range(64)
    )
    fp = " + ".join(
        f"(CASE WHEN s{p} > 0 THEN {1 << p}::UBIGINT ELSE 0::UBIGINT END)"
        for p in range(64)
    )
    return (
        "WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w "
        "FROM documents), "
        "hashes AS (SELECT doc_id, "
        "('0x' || substr(md5(w), 1, 16))::UBIGINT AS h FROM words), "
        f"votes AS (SELECT doc_id, {sums} FROM hashes GROUP BY doc_id), "
        f"fps AS (SELECT doc_id, {fp} AS fp FROM votes) "
        "SELECT a.doc_id AS a_id, b.doc_id AS b_id, "
        "CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming "
        "FROM fps a JOIN fps b ON a.doc_id < b.doc_id "
        f"WHERE bit_count(xor(a.fp, b.fp)) <= {hamming_threshold}"
    )


def _page_type_features_sql() -> str:
    """Whole-vector checksum oracle: sum of floor(1000*slot) over all 89
    slots.  9000 covers the 85 template-constant slots; the text-dependent
    slots are f14/f15 (substantive-paragraph count / mean length), f40
    (links / paragraph words — 2.0/wc mirrors the kernel's IEEE double
    division bit-for-bit), f41 (paragraph words), f58 (body text length:
    nav 'Home Blog' + text + footer concatenate with NO separators, so
    +23 chars and the first/last text words merge with 'Blog'/'©' in the
    body word stream), f75-f78 (category word ratios over the body words
    — the merged first/last words can never match a list word, so the
    countable words are text words 2..n-1 and the denominator is n+2),
    f65 (currency chars), f84 (product-count regex on the merged
    body), and f10 (date-in-slug heuristic: _BLOG_SLUG_RE's -20\\d{2}
    alternative fires on doc ids 2000-2099 at sf>=0.1, so the slot is
    URL-dependent, not template-constant — recomputed with the same
    pattern, which is RE2-safe)."""
    from rs_trafilatura_spark.kernel.ml_features import (
        _COMMERCIAL, _CONTENT_W, _FORUM_W, _TECH_W,
    )

    def cnt(words):
        inlist = ", ".join(f"'{w}'" for w in words)
        return (f"len(list_filter(mid, x -> x IN ({inlist})))")

    return f"""
WITH w AS (
  SELECT doc_id, text, string_split(lower(text), ' ') AS words,
    length(text) AS L, len(string_split(text, ' ')) AS wc
  FROM documents
), mids AS (
  SELECT doc_id, text, L, wc,
    words[2:len(words) - 1] AS mid, len(words) + 2 AS T
  FROM w
), counted AS (
  SELECT doc_id, text, L, wc, T,
    {cnt(_COMMERCIAL)} AS c75, {cnt(_CONTENT_W)} AS c76,
    {cnt(_TECH_W)} AS c77, {cnt(_FORUM_W)} AS c78,
    length(text) - length(replace(replace(replace(text, '$', ''),
      chr(8364), ''), chr(163), '')) AS c65,
    CASE WHEN regexp_matches('home blog' || lower(text) ||
      chr(169) || ' docs.example',
      'showing\\s+\\d+|\\b\\d+\\s+(results|items|products)\\b')
      THEN 1000 ELSE 0 END AS c84,
    CASE WHEN regexp_matches(
      'https://docs.example/blog/doc-' || doc_id,
      '/\\d{{4}}/\\d{{2}}/|/20\\d{{2}}-|-20\\d{{2}}')
      THEN 1000 ELSE 0 END AS c10
  FROM mids
)
SELECT 'https://docs.example/blog/doc-' || doc_id AS url,
  1.0 AS f_article_path,
  CASE WHEN L > 20 THEN 1.0 ELSE 0.0 END AS f_p_count,
  1.0 AS f_has_article, 89 AS n_features,
  9000
  + CASE WHEN L > 20 THEN 1000 + 1000 * L ELSE 0 END
  + CAST(floor(1000 * (2.0 / wc)) AS BIGINT)
  + 1000 * wc + 1000 * (L + 23)
  + CAST(floor(1000 * (c75 * 1.0 / T)) AS BIGINT)
  + CAST(floor(1000 * (c76 * 1.0 / T)) AS BIGINT)
  + CAST(floor(1000 * (c77 * 1.0 / T)) AS BIGINT)
  + CAST(floor(1000 * (c78 * 1.0 / T)) AS BIGINT)
  + 1000 * c65 + c84 + c10 AS checksum_x1000
FROM counted
"""


def _quality_heuristic_sql() -> str:
    """floor(1000 * quality) over template A with page_type pinned:
    mirrors kernel/quality.py's float chain in the SAME operation order
    (left-associative subtraction sequence), so both engines produce
    bit-identical IEEE doubles and identical floors."""
    from rs_trafilatura_spark.kernel.quality import _BOILERPLATE_KEYWORDS

    hconst = len(_RT_P1) + len(_RT_P3) + len(_RT_P5) + 3 + len(_RT_P7)
    bp = " + ".join(
        "CASE WHEN contains(lower(substr(text, 1, 200)), "
        f"'{kw}') THEN 1 ELSE 0 END"
        for kw in _BOILERPLATE_KEYWORDS
    )
    return f"""
WITH scored AS (
  SELECT doc_id, length(text) AS L,
    {hconst} + length(lang) + length(CAST(doc_id AS VARCHAR))
      + length(text) AS H,
    {bp} AS bp
  FROM documents
)
SELECT 'https://docs.example/blog/doc-' || doc_id AS url,
  CAST(floor(1000 * GREATEST(0.0, LEAST(1.0, 1.0
    - CASE WHEN L * 1.0 / H < 0.005 THEN 0.30
           WHEN L * 1.0 / H < 0.01 THEN 0.20
           WHEN L * 1.0 / H < 0.02 THEN 0.10 ELSE 0.0 END
    - CASE WHEN L * 1.0 / H > 0.30 THEN 0.10 ELSE 0.0 END
    - CASE WHEN L < 100 THEN 0.30 WHEN L < 750 THEN 0.20
           WHEN L < 1500 THEN 0.10 ELSE 0.0 END
    + CASE WHEN L BETWEEN 1500 AND 15000 THEN 0.05 ELSE 0.0 END
    - CASE WHEN bp >= 2 THEN 0.25 WHEN bp = 1 THEN 0.10 ELSE 0.0 END
  ))) AS BIGINT) AS quality_x1000
FROM scored
"""


def _curation_audit_sql() -> str:
    """Gate-cascade mirror of plans/curate.py over the planted corpus:
    the quality heuristic (kernel/quality.py, page_type pinned 'article'),
    gate ordering, url-ordered exact dedup and md5-id-ordered LSH near-dup
    marking are all reproduced in SQL."""
    from rs_trafilatura_spark.kernel.quality import _BOILERPLATE_KEYWORDS

    hconst = len(_RT_P1) + len(_RT_P3) + len(_RT_P5) + 3 + len(_RT_P7)
    bp = " + ".join(
        "CASE WHEN contains(lower(substr(etext, 1, 200)), "
        f"'{kw}') THEN 1 ELSE 0 END"
        for kw in _BOILERPLATE_KEYWORDS
    )
    chain_values = ", ".join(
        f"({d}, '{lg}', '{tx}', '{u}')" for d, lg, tx, u in _CH_ROWS
    )
    return f"""
WITH RECURSIVE base AS (
  SELECT doc_id, lang,
    CASE WHEN doc_id % 10 = 1 THEN rtrim(substr(text, 1, 100))
         WHEN doc_id % 10 = 3 THEN '{_CUR_BP_PREFIX}' || text
         ELSE text END AS etext,
    'https://www.curated.example/blog/doc-' || doc_id AS url
  FROM documents
), extra AS (
  SELECT doc_id, lang, text AS etext,
    'https://www.curated.example/blog/dup-' || doc_id AS url
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id, lang, text || '{_CUR_NEAR_TAIL}' AS etext,
    'https://www.curated.example/blog/near-' || doc_id AS url
  FROM documents WHERE doc_id % 10 = 2 AND lang = 'en'
), chain AS (
  SELECT * FROM (VALUES {chain_values}) AS t(doc_id, lang, etext, url)
), pages AS (
  SELECT * FROM base UNION ALL SELECT * FROM extra
  UNION ALL SELECT * FROM chain
), scored AS (
  SELECT url, etext, lang, length(etext) AS L,
    {hconst} + length(lang) + length(CAST(doc_id AS VARCHAR))
      + length(etext) AS H,
    {bp} AS bp
  FROM pages
), quality AS (
  SELECT url, etext, lang, L,
    GREATEST(0.0, LEAST(1.0, 1.0
      - CASE WHEN L * 1.0 / H < 0.005 THEN 0.30
             WHEN L * 1.0 / H < 0.01 THEN 0.20
             WHEN L * 1.0 / H < 0.02 THEN 0.10 ELSE 0.0 END
      - CASE WHEN L * 1.0 / H > 0.30 THEN 0.10 ELSE 0.0 END
      - CASE WHEN L < 100 THEN 0.30 WHEN L < 750 THEN 0.20
             WHEN L < 1500 THEN 0.10 ELSE 0.0 END
      + CASE WHEN L BETWEEN 1500 AND 15000 THEN 0.05 ELSE 0.0 END
      - CASE WHEN bp >= 2 THEN 0.25 WHEN bp = 1 THEN 0.10 ELSE 0.0 END
    )) AS q
  FROM scored
), gated AS (
  SELECT url, etext, lang,
    CASE WHEN L = 0 THEN 'empty'
         WHEN L < 200 THEN 'too_short'
         WHEN q < 0.5 THEN 'low_quality'
         WHEN lang <> 'en' THEN 'language'
         ELSE NULL END AS reason
  FROM quality
), ranked AS (
  SELECT url, etext, reason,
    row_number() OVER (PARTITION BY etext
                       ORDER BY (reason IS NOT NULL), url) AS rn
  FROM gated
), exact AS (
  SELECT url, etext,
    CASE WHEN reason IS NOT NULL THEN reason
         WHEN rn > 1 THEN 'exact_duplicate' ELSE NULL END AS reason
  FROM ranked
), kept AS (
  SELECT url, etext, reason,
    CAST(('0x' || substr(md5(url), 1, 15))::UBIGINT AS BIGINT) AS id
  FROM exact
), shingled AS (
  SELECT id, CASE WHEN len(string_split(etext, ' ')) < 3
    THEN [etext]
    ELSE list_distinct(list_transform(
      range(1, len(string_split(etext, ' ')) - 1),
      i -> string_split(etext, ' ')[i] || ' ' ||
           string_split(etext, ' ')[i+1] || ' ' ||
           string_split(etext, ' ')[i+2])) END AS sh
  FROM kept WHERE reason IS NULL
), nd_pairs AS (
  SELECT a.id AS a_id, b.id AS b_id
  FROM shingled a JOIN shingled b ON a.id < b.id
  WHERE CAST(floor(1000.0 * len(list_intersect(a.sh, b.sh)) /
    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))))
    AS BIGINT) >= 800
), losers AS (
  SELECT DISTINCT b_id FROM nd_pairs
), edges AS (
  SELECT a_id AS u, b_id AS v FROM nd_pairs
  UNION SELECT b_id, a_id FROM nd_pairs
), reach(node, lbl) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node
), closers AS (
  SELECT node AS c_loser FROM reach GROUP BY node
  HAVING node <> min(lbl)
)
SELECT 'pairs' AS method, k.url,
  (k.reason IS NULL AND l.b_id IS NULL) AS kept,
  CASE WHEN k.reason IS NULL AND l.b_id IS NOT NULL
       THEN 'near_duplicate' ELSE k.reason END AS drop_reason
FROM kept k LEFT JOIN losers l ON k.id = l.b_id
UNION ALL
SELECT 'clusters' AS method, k.url,
  (k.reason IS NULL AND c.c_loser IS NULL) AS kept,
  CASE WHEN k.reason IS NULL AND c.c_loser IS NOT NULL
       THEN 'near_duplicate' ELSE k.reason END AS drop_reason
FROM kept k LEFT JOIN closers c ON k.id = c.c_loser
"""


def _bpe_merges_sql(n_merges: int) -> str:
    """Unrolled SQL twin of ``bpe_train_local``: ``n_merges`` rounds of
    count-pairs -> tie-broken argmax -> non-overlapping application over a
    DOUBLE-delimited symbol string ('|a||b||c|').  With both delimiters,
    replace('|l||r|', '|lr|') can only match whole adjacent symbols —
    single delimiters would let the pattern match a SUFFIX of a longer
    symbol (e.g. symbols [ab, ca] vs merge (b, c)); verified equal to the
    Python trainer on an adversarial suffix-collision corpus."""
    ctes = [
        "WITH v AS (SELECT lower(w) AS word, count(*) AS n FROM ("
        "SELECT unnest(string_split(text, ' ')) AS w FROM documents) "
        "WHERE regexp_matches(w, '^[A-Za-z]+$') GROUP BY lower(w)), "
        r"s0 AS (SELECT regexp_replace(word, '(.)', '|\1|', 'g') AS s, n "
        "FROM v)"
    ]
    for k in range(1, n_merges + 1):
        ctes.append(
            f", p{k} AS (SELECT syms[i] AS l, syms[i + 1] AS r, "
            "sum(n) AS pn FROM (SELECT string_split(substr(s, 2, "
            f"len(s) - 2), '||') AS syms, n FROM s{k - 1}) t, "
            "LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) "
            "AS i) g WHERE len(syms) >= 2 GROUP BY l, r), "
            f"m{k} AS (SELECT l, r, pn FROM p{k} "
            "ORDER BY pn DESC, l ASC, r ASC LIMIT 1), "
            f"s{k} AS (SELECT replace(s, "
            f"(SELECT '|' || l || '||' || r || '|' FROM m{k}), "
            f"(SELECT '|' || l || r || '|' FROM m{k})) AS s, n "
            f"FROM s{k - 1})"
        )
    sel = " UNION ALL ".join(
        f"SELECT {k} AS rank, l, r, pn FROM m{k}"
        for k in range(1, n_merges + 1)
    )
    return "".join(ctes) + " " + sel


def _lang_guess_case() -> str:
    """The priority-ordered argmax CASE (no alias), generated from the
    same LANG_PRIORITY/STOPWORDS tables as the operator."""
    from rs_trafilatura_spark.operators.textstats import LANG_PRIORITY

    h = {lang: _stop_cases(lang) for lang in LANG_PRIORITY}
    case = "CASE "
    for i, lang in enumerate(LANG_PRIORITY[:-1]):
        conds = " AND ".join(
            f"{h[lang]} >= {h[o]}" for o in LANG_PRIORITY[i + 1:]
        )
        case += f"WHEN {conds} THEN '{lang}' "
    case += f"ELSE '{LANG_PRIORITY[-1]}' END"
    return case


def _language_id_oracle_sql() -> str:
    """Generated from the same LANG_PRIORITY/STOPWORDS tables as the
    operator: hits per language + priority-ordered argmax CASE."""
    from rs_trafilatura_spark.operators.textstats import LANG_PRIORITY

    h = {lang: _stop_cases(lang) for lang in LANG_PRIORITY}
    sel = ", ".join(f"{h[lang]} AS {lang}_hits" for lang in LANG_PRIORITY)
    return (f"SELECT doc_id, {sel}, {_lang_guess_case()} AS lang_guess "
            "FROM documents")


def _stop_cases(lang: str) -> str:
    from rs_trafilatura_spark.operators.textstats import STOPWORDS

    stops = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(text, ' '), x -> x IN ({stops})))"
    )


def _sql_lit(s: str) -> str:
    """Embed a Python string as a DuckDB literal, newlines via chr(10)."""
    return " || ".join(
        "chr(10)" if part == "\n" else "'" + part.replace("'", "''") + "'"
        for part in re.split(r"(\n)", s) if part
    )


def _repetition_oracle_sql() -> str:
    """DuckDB recomputation of every gopher_repetition signal: planted
    CASE suffix -> word/line/paragraph unnest -> per-doc group-by counts;
    duplicated-n-gram coverage via DISTINCT (doc, position) expansion so
    overlapping occurrences count each word once (the paper's rule).
    Generated, not hand-written: one block per n keeps the two engines'
    definitions provably identical to the Python pass in
    operators/textstats.py::_repetition_row."""
    parts = [
        "docs AS (SELECT doc_id, text || CASE CAST(doc_id % 4 AS INTEGER) "
        "WHEN 0 THEN " + _sql_lit(_REP_PARA) + " "
        "WHEN 1 THEN " + _sql_lit(_REP_SPAM) + " "
        "WHEN 2 THEN " + _sql_lit(_REP_LINE) + " "
        "ELSE '' END AS t FROM documents)",
        "w AS (SELECT doc_id, "
        "list_filter(regexp_split_to_array(t, '[ \\t\\n\\r]+'), "
        "x -> len(x) > 0) AS words, "
        "list_filter(string_split(t, chr(10)), l -> len(l) > 0) AS lines, "
        "list_filter(string_split(t, chr(10) || chr(10)), "
        "p -> len(p) > 0) AS paras FROM docs)",
    ]
    for unit, col in (("line", "lines"), ("para", "paras")):
        parts.append(
            f"{unit}c AS (SELECT doc_id, item, count(*) AS cnt FROM "
            f"(SELECT doc_id, unnest({col}) AS item FROM w) "
            "GROUP BY doc_id, item)"
        )
        parts.append(
            f"{unit}agg AS (SELECT doc_id, "
            "sum(cnt) AS n_items, sum(cnt * len(item)) AS item_chars, "
            "sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS dup_n, "
            "sum(CASE WHEN cnt >= 2 THEN cnt * len(item) ELSE 0 END) "
            f"AS dup_chars FROM {unit}c GROUP BY doc_id)"
        )
    parts.append(
        "wp AS (SELECT doc_id, unnest(words) AS word, "
        "generate_subscripts(words, 1) AS i FROM w)"
    )
    parts.append(
        "wagg AS (SELECT doc_id, count(*) AS n_words, "
        "sum(len(word)) AS word_chars FROM wp GROUP BY doc_id)"
    )
    for n in range(2, 11):
        parts.append(
            f"g{n} AS (SELECT doc_id, i, array_to_string("
            f"list_slice(words, i, i + {n - 1}), ' ') AS gram "
            "FROM (SELECT doc_id, words, generate_subscripts(words, 1) AS i "
            f"FROM w) WHERE i + {n - 1} <= len(words))"
        )
    for n in (2, 3, 4):
        parts.append(
            f"top{n} AS (SELECT doc_id, max(cnt * len(gram)) AS top_chars "
            f"FROM (SELECT doc_id, gram, count(*) AS cnt FROM g{n} "
            "GROUP BY doc_id, gram) GROUP BY doc_id)"
        )
    for n in (5, 6, 7, 8, 9, 10):
        parts.append(
            f"gc{n} AS (SELECT doc_id, gram FROM g{n} "
            "GROUP BY doc_id, gram HAVING count(*) >= 2)"
        )
        parts.append(
            f"cov{n} AS (SELECT c.doc_id, sum(len(wp.word)) AS cov_chars "
            f"FROM (SELECT DISTINCT g.doc_id, g.i + t.o AS pos FROM g{n} g "
            f"JOIN gc{n} d ON g.doc_id = d.doc_id AND g.gram = d.gram, "
            f"generate_series(0, {n - 1}) t(o)) c "
            "JOIN wp ON wp.doc_id = c.doc_id AND wp.i = c.pos "
            "GROUP BY c.doc_id)"
        )
    sel = ["base.doc_id"]
    for unit in ("line", "para"):
        sel.append(
            f"CAST(CASE WHEN COALESCE({unit}agg.n_items, 0) = 0 THEN 0 ELSE "
            f"(1000 * COALESCE({unit}agg.dup_n, 0)) // {unit}agg.n_items "
            f"END AS BIGINT) AS dup_{unit}_frac_x1000"
        )
        sel.append(
            f"CAST(CASE WHEN COALESCE({unit}agg.item_chars, 0) = 0 THEN 0 "
            f"ELSE (1000 * COALESCE({unit}agg.dup_chars, 0)) // "
            f"{unit}agg.item_chars END AS BIGINT) AS dup_{unit}_char_x1000"
        )
    for n in (2, 3, 4):
        sel.append(
            f"CAST(CASE WHEN COALESCE(wagg.word_chars + wagg.n_words - 1, "
            f"0) <= 0 THEN 0 "
            f"ELSE (1000 * COALESCE(top{n}.top_chars, 0)) // "
            "(wagg.word_chars + wagg.n_words - 1) END AS BIGINT) "
            f"AS top{n}_char_x1000"
        )
    for n in (5, 6, 7, 8, 9, 10):
        sel.append(
            f"CAST(CASE WHEN COALESCE(wagg.word_chars, 0) = 0 THEN 0 ELSE "
            f"(1000 * COALESCE(cov{n}.cov_chars, 0)) // wagg.word_chars "
            f"END AS BIGINT) AS dup{n}_char_x1000"
        )
    # anchor on w (EVERY doc) so a zero-word document still gets its
    # all-zeros row — wagg is words-derived and would drop it, while the
    # Spark side always emits a row per input doc
    joins = ["(SELECT doc_id FROM w) base",
             "LEFT JOIN wagg ON wagg.doc_id = base.doc_id",
             "LEFT JOIN lineagg ON lineagg.doc_id = base.doc_id",
             "LEFT JOIN paraagg ON paraagg.doc_id = base.doc_id"]
    for n in (2, 3, 4):
        joins.append(f"LEFT JOIN top{n} ON top{n}.doc_id = base.doc_id")
    for n in (5, 6, 7, 8, 9, 10):
        joins.append(f"LEFT JOIN cov{n} ON cov{n}.doc_id = base.doc_id")
    from rs_trafilatura_spark.operators.textstats import (
        REPETITION_THRESHOLDS_X1000,
    )
    passexpr = " AND ".join(
        f"{c} <= {t}" for c, t in REPETITION_THRESHOLDS_X1000.items()
    )
    inner = ("WITH " + ", ".join(parts) + " SELECT " + ", ".join(sel)
             + " FROM " + " ".join(joins))
    return (f"SELECT *, ({passexpr}) AS repetition_pass FROM ({inner})")


def _substring_dedup_oracle_join() -> str:
    """Subquery joined onto the redact_pii oracle (consolidation step):
    Lee-et-al exact substring dedup recomputed in DuckDB — positional
    50-gram STRINGS (the Spark side's hash pass is only a prefilter; its
    string verify makes gram-string grouping the exact semantics),
    duplicated-gram starts, 0..49 coverage expansion, anti-joined
    surviving word stream."""
    inner = (
        "WITH ssm AS (SELECT doc_id, text || CASE WHEN doc_id % 6 < 2 "
        "THEN ' " + _SS_PASSAGE + "' ELSE '' END AS t FROM documents), "
        "w AS (SELECT doc_id, list_filter(regexp_split_to_array(t, "
        "'[ \\t\\n\\r]+'), x -> len(x) > 0) AS words FROM ssm), "
        "wp AS (SELECT doc_id, unnest(words) AS word, "
        "generate_subscripts(words, 1) AS i FROM w), "
        "pos AS (SELECT doc_id, i - 1 AS i0, "
        "array_to_string(list_slice(words, i, i + 49), ' ') AS gm "
        "FROM (SELECT doc_id, words, generate_subscripts(words, 1) AS i "
        "FROM w) WHERE i + 49 <= len(words)), "
        "dup AS (SELECT gm FROM pos GROUP BY gm HAVING count(*) >= 2), "
        "cov AS (SELECT DISTINCT s.doc_id, s.i0 + g.o AS p FROM "
        "(SELECT doc_id, i0 FROM pos JOIN dup USING (gm)) s, "
        "generate_series(0, 49) g(o)), "
        "reb AS (SELECT wp.doc_id, CAST(count(*) AS BIGINT) AS n_kept, "
        "string_agg(wp.word, ' ' ORDER BY wp.i) AS ss_clean_text "
        "FROM wp LEFT JOIN cov ON cov.doc_id = wp.doc_id "
        "AND cov.p = wp.i - 1 WHERE cov.p IS NULL GROUP BY wp.doc_id), "
        "tot AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS ss_n_words "
        "FROM w) "
        "SELECT tot.doc_id, tot.ss_n_words, "
        "tot.ss_n_words - COALESCE(reb.n_kept, 0) AS ss_n_removed, "
        "COALESCE(reb.ss_clean_text, '') AS ss_clean_text "
        "FROM tot LEFT JOIN reb ON reb.doc_id = tot.doc_id"
    )
    return inner


def _mojibake_oracle_sql() -> str:
    """DuckDB twin of fix_mojibake: the identical 30-entry literal
    replace chain (longest sequences first) over the planted text."""
    from rs_trafilatura_spark.operators.textstats import MOJIBAKE_PAIRS

    expr = "t"
    for moji, ch in MOJIBAKE_PAIRS:
        expr = f"replace({expr}, '{moji}', '{ch}')"
    return (
        "WITH mm AS (SELECT doc_id, text || CASE WHEN doc_id % 3 = 1 "
        "THEN '" + _moji_plant() + "' ELSE '' END AS t FROM documents) "
        "SELECT doc_id, fx AS moji_fixed_text, fx != t AS moji_changed "
        "FROM (SELECT doc_id, t, " + expr + " AS fx FROM mm)"
    )


def _ccnet_oracle_sql() -> str:
    """DuckDB twin of operators/lm.py::ccnet_pipeline over documents:
    unigram vocab -> floor-log2 surprisal (length(bin(cnt)) — identical
    string semantics in Spark and DuckDB) -> exact global ntile(3)."""
    return (
        "WITH tok AS (SELECT doc_id, unnest(list_filter("
        "regexp_split_to_array(text, '[ \\t\\n\\r]+'), "
        "x -> len(x) > 0)) AS token FROM documents), "
        "vocab AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token), "
        "tot AS (SELECT length(bin(sum(cnt))) AS bits_n FROM vocab), "
        "scored AS (SELECT t.doc_id, "
        "(SELECT bits_n FROM tot) - length(bin(v.cnt)) AS bits "
        "FROM tok t JOIN vocab v USING (token)), "
        "agg AS (SELECT doc_id, count(*) AS lm_n_tokens, "
        "CAST((1000 * sum(bits)) // count(*) AS BIGINT) "
        "AS surprisal_x1000 FROM scored GROUP BY doc_id), "
        "b AS (SELECT *, ntile(3) OVER "
        "(ORDER BY surprisal_x1000, doc_id) AS tile FROM agg) "
        "SELECT doc_id, CAST(lm_n_tokens AS BIGINT) AS lm_n_tokens, "
        "surprisal_x1000, CASE tile WHEN 1 THEN 'head' WHEN 2 THEN "
        "'middle' ELSE 'tail' END AS ppl_bucket FROM b"
    )


def _datasheet_oracle_sql() -> str:
    """DuckDB twin of operators/datasheet.py, generated by the operator
    module itself from the same section/percentile tables."""
    from rs_trafilatura_spark.operators.datasheet import datasheet_sql

    return datasheet_sql("documents")


def _dsir_oracle_sql() -> str:
    """DuckDB twin of operators/dsir.py over documents: unigram+bigram
    stream -> md5-hex bucket (CAST('0x'||substr(md5,1,8)) — same integer
    as Spark's conv(substring(md5,1,8),16,10)) -> add-one floor-log2 LLR
    vs the docs<5 target -> exact top-30% by (score desc, doc_id)."""
    return (
        "WITH wp AS (SELECT doc_id, unnest(words) AS word, "
        "generate_subscripts(words, 1) AS i FROM "
        "(SELECT doc_id, list_filter(regexp_split_to_array(text, "
        "'[ \\t\\n\\r]+'), x -> len(x) > 0) AS words FROM documents)), "
        "bg AS (SELECT doc_id, word || ' ' || "
        "lead(word) OVER (PARTITION BY doc_id ORDER BY i) AS gram "
        "FROM wp), "
        "grams AS (SELECT doc_id, word AS gram FROM wp UNION ALL "
        "SELECT doc_id, gram FROM bg WHERE gram IS NOT NULL), "
        "bk AS (SELECT doc_id, CAST(('0x' || substr(md5(gram), 1, 8)) "
        "AS BIGINT) % 10000 AS bucket FROM grams), "
        "tc AS (SELECT bucket, count(*) AS cnt FROM bk "
        "WHERE doc_id < 5 GROUP BY bucket), "
        "rc AS (SELECT bucket, count(*) AS cnt FROM bk GROUP BY bucket), "
        "scored AS (SELECT bk.doc_id, "
        "(length(bin(COALESCE(tc.cnt, 0) + 1)) "
        "- (SELECT length(bin(sum(cnt))) FROM tc)) "
        "- (length(bin(COALESCE(rc.cnt, 0) + 1)) "
        "- (SELECT length(bin(sum(cnt))) FROM rc)) AS llr "
        "FROM bk LEFT JOIN tc USING (bucket) "
        "LEFT JOIN rc USING (bucket)), "
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
        "CAST(floor(1000.0 * sum(llr) / count(*)) AS BIGINT) "
        "AS dsir_score_x1000 FROM scored GROUP BY doc_id), "
        "rnk AS (SELECT *, row_number() OVER "
        "(ORDER BY dsir_score_x1000 DESC, doc_id) AS rn FROM agg) "
        "SELECT doc_id, n_grams, dsir_score_x1000, "
        "rn <= (SELECT (count(*) * 30) // 100 FROM documents) "
        "AS dsir_selected FROM rnk"
    )


def oracle_sql() -> dict[str, str]:
    en, de, fr, es = (_stop_cases(l) for l in ("en", "de", "fr", "es"))
    # exact top-k / exact knn oracles double as the oracles for the
    # LSH-approximate variants: on the benchmark corpus the pinned
    # (n_planes, probe_bits) settings recall the exact result in full, and
    # both LSH plane hashing and the corpus are deterministic.
    topk_sql = (
        "SELECT vec_id, CAST(round(1000 * "
        "list_dot_product(embedding::DOUBLE[], q.qv) / "
        "(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(q.qv, q.qv)))) AS BIGINT) AS cos_x1000 "
        "FROM embeddings, "
        "(SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0) q "
        "WHERE vec_id != 0 "
        "ORDER BY cos_x1000 DESC, vec_id ASC LIMIT 10"
    )
    knn_sql = (
        "SELECT a_id, rank, b_id, cos_x1000 FROM ("
        "SELECT a.vec_id AS a_id, b.vec_id AS b_id, "
        "CAST(round(1000 * list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
        "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))) AS BIGINT) "
        "AS cos_x1000, "
        "row_number() OVER (PARTITION BY a.vec_id ORDER BY "
        "round(1000 * list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
        "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))) DESC, "
        "b.vec_id ASC) AS rank "
        "FROM embeddings a, embeddings b WHERE a.vec_id != b.vec_id) "
        "WHERE rank <= 3"
    )
    o = {
        "extract_roundtrip": (
            "SELECT 'https://docs.example/blog/doc-' || doc_id AS url, "
            "text, lang, 'Doc ' || doc_id AS title, "
            "CAST(1 AS BIGINT) AS n_spans, 'p' AS span_kind, "
            f"CAST({len(_RT_P1) + len(_RT_P3) + len(_RT_P5)} + length(lang) "
            "+ length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS span_start, "
            "CAST(length(text) + 3 AS BIGINT) AS span_len FROM documents"
        ),
        # same pages, same expected rows — only the SOURCE differs (python-
        # side pyarrow scan), which must be invisible in the results
        "extract_fastscan": (
            "SELECT 'https://docs.example/blog/doc-' || doc_id AS url, "
            "text, lang, 'Doc ' || doc_id AS title, "
            "CAST(1 AS BIGINT) AS n_spans, 'p' AS span_kind, "
            f"CAST({len(_RT_P1) + len(_RT_P3) + len(_RT_P5)} + length(lang) "
            "+ length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS span_start, "
            "CAST(length(text) + 3 AS BIGINT) AS span_len FROM documents"
        ),
        # same pages again through the .warc.gz archive hop — WARC
        # serialization, per-record gzip, stream parse, and the fused
        # parse+extract stage must all be invisible in the results
        "warc_roundtrip": (
            "SELECT 'https://docs.example/blog/doc-' || doc_id AS url, "
            "text, lang, 'Doc ' || doc_id AS title, "
            "CAST(1 AS BIGINT) AS n_spans, 'p' AS span_kind, "
            f"CAST({len(_RT_P1) + len(_RT_P3) + len(_RT_P5)} + length(lang) "
            "+ length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS span_start, "
            "CAST(length(text) + 3 AS BIGINT) AS span_len FROM documents"
        ),
        "extract_metadata": (
            "SELECT 'https://docs.example/blog/doc-' || doc_id AS url, "
            "'Author ' || source AS author, "
            "TIMESTAMP '2026-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS date, "
            "'Meta Site' AS sitename FROM documents"
        ),
        "extract_metadata_full": (
            "SELECT 'https://canonical.example/doc-' || doc_id "
            "AS canonical_url, "
            "'canonical.example' AS hostname, "
            "'Summary of doc ' || doc_id || ' for the meta surface.' "
            "AS description, "
            "'Cat ' || (doc_id % 5) AS category1, "
            "source || '|spark|web' AS tags_joined, "
            "'CC BY-SA' AS license, "
            "'https://cdn.example.com/i/' || doc_id || '.jpg' AS image "
            "FROM documents"
        ),
        "dedup_exact": (
            "WITH de AS (SELECT min(doc_id) AS keep_id, "
            "count(*) AS n_copies FROM documents GROUP BY text), "
            "m AS (SELECT doc_id, text || CASE WHEN doc_id % 5 < 2 THEN "
            + _sql_lit(_SHARED_PARA) + " ELSE '' END AS t FROM documents), "
            "p AS (SELECT doc_id, unnest(ps) AS para, "
            "generate_subscripts(ps, 1) AS idx FROM "
            "(SELECT doc_id, string_split(t, chr(10) || chr(10)) AS ps "
            "FROM m)), "
            "k AS (SELECT doc_id, idx, para, "
            "(len(trim(para)) < 1) AS triv, "
            "row_number() OVER (PARTITION BY len(trim(para)) < 1, "
            "md5(para) ORDER BY doc_id, idx) AS rn FROM p), "
            "reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept, "
            "string_agg(para, chr(10) || chr(10) ORDER BY idx) "
            "AS para_clean_text FROM k WHERE triv OR rn = 1 "
            "GROUP BY doc_id), "
            "tot AS (SELECT doc_id, CAST(len(string_split(t, "
            "chr(10) || chr(10))) AS BIGINT) AS n_paras FROM m) "
            "SELECT de.keep_id, de.n_copies, tot.n_paras, "
            "COALESCE(reb.n_kept, 0) AS n_kept, "
            "COALESCE(reb.para_clean_text, '') AS para_clean_text "
            "FROM de JOIN tot ON tot.doc_id = de.keep_id "
            "LEFT JOIN reb ON reb.doc_id = de.keep_id"
        ),
        "token_stats": (
            "SELECT doc_id, "
            "len(string_split(text, ' ')) AS token_cnt, "
            "length(text) AS char_cnt, "
            "len(list_distinct(string_split(text, ' '))) AS distinct_cnt, "
            "CAST(floor(1000.0 * len(list_distinct(string_split(text, ' '))) "
            "/ len(string_split(text, ' '))) AS BIGINT) AS uniq_ratio_x1000 "
            "FROM documents"
        ),
        "bpe_token_stats": (
            # same regex, RE2 side; constructs chosen to agree with Java
            # regex (see operators/textstats.py::BPE_ISH_PATTERN)
            "SELECT doc_id, len(string_split(text, ' ')) AS ws_token_cnt, "
            "CAST(len(regexp_extract_all(text, "
            "'''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s'']+')) "
            "AS BIGINT) AS bpe_ish_cnt, "
            "CAST(floor(1000.0 * len(regexp_extract_all(text, "
            "'''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s'']+')) "
            "/ len(string_split(text, ' '))) AS BIGINT) AS bpe_per_ws_x1000 "
            "FROM documents"
        ),
        "redact_pii": (
            "WITH d AS (SELECT doc_id, text || ' Contact: user' || doc_id "
            "|| '@example.com or 555-123-4567.' AS text FROM documents) "
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) "
            "AS n_emails, "
            "CAST(len(regexp_extract_all(text, "
            "'\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b')) AS BIGINT) "
            "AS n_phones, "
            "regexp_replace(regexp_replace(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', "
            "'g'), '\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b', '<PHONE>', 'g') "
            "AS redacted_text FROM d"
        ),
        "chunk_documents": (
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS words "
            "FROM documents) "
            "SELECT doc_id, CAST(s.i AS BIGINT) AS chunk_idx, "
            "CAST(LEAST(64, len(words) - s.i * 56) AS BIGINT) AS n_tokens, "
            "array_to_string(words[s.i * 56 + 1 : s.i * 56 + 64], ' ') "
            "AS chunk_text "
            "FROM w, LATERAL unnest(range((len(words) - 1) // 56 + 1)) "
            "AS s(i)"
        ),
        "language_id": _language_id_oracle_sql(),
        "quality_score": (
            "SELECT doc_id, "
            "len(string_split(text, ' ')) AS token_cnt, "
            f"CAST(floor(1000.0 * {en} / len(string_split(text, ' '))) AS BIGINT) "
            "AS stop_ratio_x1000, "
            "CAST(floor(1000.0 * len(list_distinct(string_split(text, ' '))) "
            "/ len(string_split(text, ' '))) AS BIGINT) AS uniq_ratio_x1000, "
            "CAST(floor(length(text) * 1.0 / len(string_split(text, ' '))) AS BIGINT) "
            "AS avg_token_len_x1, "
            "CAST(len(string_split(text, ' ')) >= 20 AS INT) + "
            "CAST(len(list_distinct(string_split(text, ' '))) * 1000 "
            "/ len(string_split(text, ' ')) >= 300 AS INT) AS quality_flags "
            "FROM documents"
        ),
        "doc_fingerprint": (
            # fingerprint + 13-gram benchmark decontamination (benchmark
            # = docs 0-4's texts): n_hits = |doc grams ∩ bench grams| as
            # a STRING-set intersection — the Spark side must agree via
            # its hashed-gram broadcast join
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS w, text "
            "FROM documents), "
            "g AS (SELECT doc_id, text, CASE WHEN len(w) < 13 "
            "THEN [array_to_string(w, ' ')] "
            "ELSE list_distinct(list_transform(range(1, len(w) - 11), "
            "i -> array_to_string(w[i:i+12], ' '))) END AS grams FROM w), "
            "b AS (SELECT list_distinct(flatten(list(grams))) AS bg "
            "FROM g WHERE doc_id < 5) "
            "SELECT doc_id, md5(text) AS fingerprint, "
            "md5(lower(trim(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', "
            "'g')))) AS canon_fingerprint, "
            "CAST(len(list_intersect(grams, b.bg)) AS BIGINT) "
            "AS n_contam_hits, "
            "len(list_intersect(grams, b.bg)) > 0 "
            "AS contaminated FROM g, b"
        ),
        "dsir_importance": _dsir_oracle_sql(),
        "ngram_jaccard": (
            "WITH w AS (SELECT doc_id, source, "
            "list_distinct(string_split(text, ' ')) AS words FROM documents) "
            "SELECT a.doc_id AS a_id, b.doc_id AS b_id, "
            "CAST(floor(1000.0 * len(list_intersect(a.words, b.words)) / "
            "(len(a.words) + len(b.words) - len(list_intersect(a.words, b.words)))) "
            "AS BIGINT) AS jac_x1000 "
            "FROM w a JOIN w b ON a.source = b.source AND a.doc_id < b.doc_id "
            "WHERE 1000.0 * len(list_intersect(a.words, b.words)) / "
            "(len(a.words) + len(b.words) - len(list_intersect(a.words, b.words))) "
            ">= 100"
        ),
        "embedding_topk": topk_sql,
        "ann_lsh_topk": (
            # exact top-10 over the corpus + 10 planted scale-twins of the
            # query vector (x * 2^t is exact in float and double, so both
            # engines compute identical cosines)
            "WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS e "
            "FROM embeddings UNION ALL "
            "SELECT 10000 + t, list_transform(embedding::DOUBLE[], "
            "x -> x * (2 ** t)) FROM embeddings, "
            "(SELECT unnest(range(1, 11)) AS t) WHERE vec_id = 0) "
            "SELECT vec_id, CAST(round(1000 * list_dot_product(e, q.qv) / "
            "(sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(q.qv, q.qv)))) "
            "AS BIGINT) AS cos_x1000 FROM corpus, "
            "(SELECT embedding::DOUBLE[] AS qv FROM embeddings "
            "WHERE vec_id = 0) q "
            "WHERE vec_id != 0 ORDER BY cos_x1000 DESC, vec_id ASC LIMIT 10"
        ),
        "ivf_ann_topk": (
            # exact top-10 over the corpus + 10 planted scale-twins of the
            # query vector (x * 2^t is exact in float and double, so both
            # engines compute identical cosines)
            "WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS e "
            "FROM embeddings UNION ALL "
            "SELECT 10000 + t, list_transform(embedding::DOUBLE[], "
            "x -> x * (2 ** t)) FROM embeddings, "
            "(SELECT unnest(range(1, 11)) AS t) WHERE vec_id = 0) "
            "SELECT vec_id, CAST(round(1000 * list_dot_product(e, q.qv) / "
            "(sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(q.qv, q.qv)))) "
            "AS BIGINT) AS cos_x1000 FROM corpus, "
            "(SELECT embedding::DOUBLE[] AS qv FROM embeddings "
            "WHERE vec_id = 0) q "
            "WHERE vec_id != 0 ORDER BY cos_x1000 DESC, vec_id ASC LIMIT 10"
        ),
        "page_type_features": _page_type_features_sql(),
        "extract_structured": (
            "SELECT 'https://www.structured.example/blog/doc-' || doc_id "
            "AS url, "
            "'<h2>Section ' || doc_id || '</h2><p>' || text || "
            "'</p><ul><li>Alpha note ' || doc_id || '</li><li>Beta note ' "
            "|| doc_id || '</li></ul>' AS content_html, "
            "'## Section ' || doc_id || chr(10) || chr(10) || text || "
            "chr(10) || chr(10) || '- Alpha note ' || doc_id || chr(10) || "
            "'- Beta note ' || doc_id AS content_markdown FROM documents"
        ),
        "markdown_escapes": (
            "SELECT 'https://esc.example/blog/doc-' || doc_id AS url, "
            f"'<h2>Section ' || doc_id || '</h2><p>' || text || "
            f"'{_MD_TAIL}</p>{_MD_TABLE}' AS content_html, "
            "'## Section ' || doc_id || chr(10) || chr(10) || text || "
            f"'{_MD_TAIL_GFM}' || "
            "chr(10) || chr(10) || "
            f"'{_MD_TABLE_GFM}' "
            "AS content_markdown FROM documents"
        ),
        "extract_images": (
            "SELECT 'https://www.imgsite.example/blog/doc-' || doc_id AS url, "
            "CAST(0 AS BIGINT) AS img_idx, "
            "'/img/fig-' || doc_id || '.png' AS src, "
            "'fig-' || doc_id || '.png' AS filename, "
            "'Figure ' || doc_id AS alt, 'Caption ' || doc_id AS caption, "
            "FALSE AS is_hero FROM documents "
            "UNION ALL "
            "SELECT 'https://www.imgsite.example/blog/doc-' || doc_id, "
            "CAST(1 AS BIGINT), '/img/hero-' || doc_id || '.jpg', "
            "'hero-' || doc_id || '.jpg', 'Hero ' || doc_id, NULL, TRUE "
            "FROM documents"
        ),
        "extract_comments": (
            "SELECT 'https://www.commentsite.example/blog/doc-' || doc_id "
            "AS url, text, "
            "'First take: ' || text || chr(10) || chr(10) || "
            "'Second take: ' || text AS comments_text, "
            "'<div><p>First take: ' || text || '</p></div>"
            "<div><p>Second take: ' || text || '</p></div>' AS comments_html "
            "FROM documents"
        ),
        "streaming_roundtrip": (
            "SELECT 'https://docs.example/blog/doc-' || doc_id AS url, "
            "text, lang FROM documents"
        ),
        # same pages again, but landed as .warc.gz archives consumed by
        # the binaryFile readStream — the archive + streaming hops must
        # be invisible in the extracted results
        "streaming_warc_roundtrip": (
            "SELECT 'https://docs.example/blog/doc-' || doc_id AS url, "
            "text, lang FROM documents"
        ),
        "streaming_window_metrics": (
            "SELECT to_timestamp(1767225600 + (doc_id % 3) * 600)::TIMESTAMP "
            "AS window_start, "
            "to_timestamp(1767225600 + (doc_id % 3) * 600 + 600)::TIMESTAMP "
            "AS window_end, "
            "'main' AS stage, count(*) AS n_pages "
            "FROM documents GROUP BY 1, 2"
        ),
        "extract_fallback_spans": (
            "SELECT 'https://www.fallback.example/blog/doc-' || doc_id "
            "AS url, 'baseline_rescue' AS stage, "
            f"'{_FB_SHORT}' || chr(10) || chr(10) || text AS text, "
            "CAST(2 AS BIGINT) AS n_spans, "
            "'p' AS s1_kind, "
            f"CAST({len(_FB_P1) + len(_FB_P2) + len(_FB_P3)} + length(lang) "
            "+ length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS s1_start, "
            f"CAST({len(_FB_SHORT) + 3} AS BIGINT) AS s1_len, "
            "'p' AS s2_kind, "
            f"CAST({len(_FB_P1) + len(_FB_P2) + len(_FB_P3) + len(_FB_SHORT) + 13} "
            "+ length(lang) + length(CAST(doc_id AS VARCHAR)) AS BIGINT) "
            "AS s2_start, "
            "CAST(length(text) + 3 AS BIGINT) AS s2_len "
            "FROM documents WHERE length(text) >= 300"
        ),
        # post-pass ladder: every span offset below is pure template
        # arithmetic over the page layout the _wrap_* builders emit
        # (L = length(text), D = length(doc_id); constants baked at
        # import time from the same template strings Spark uses)
        "host_stats_salted": (
            "SELECT 'h' || CAST(CASE WHEN doc_id % 2 = 0 THEN 0 "
            f"ELSE doc_id % {_ZH_HOSTS} END AS VARCHAR) || '.example' "
            "AS host, CAST(COUNT(*) AS BIGINT) AS n_pages, "
            "CAST(SUM(length(text)) AS BIGINT) AS sum_len "
            "FROM documents GROUP BY 1"
        ),
        "extract_size_guards": (
            "SELECT 'https://big.example/blog/doc-' || doc_id AS url, "
            "'main' AS stage, "
            f"CAST({_SG_MAX_LEN} AS BIGINT) AS content_len, "
            "substr(text || repeat(chr(10) || chr(10) || text, "
            f"CAST(ceil({_SG_BODY_CHARS} / length(text)) AS BIGINT) - 1), "
            f"1, {_SG_MAX_LEN}) AS text, "
            "CAST(1 AS BIGINT) AS n_warnings, "
            f"'Content truncated to max length: {_SG_MAX_LEN}' AS warning "
            f"FROM documents WHERE length(text) BETWEEN {_PP_LEN_MIN} AND "
            f"{_PP_LEN_MAX} AND doc_id % {_SG_MOD} = 3"
        ),
        "extract_merge": (
            "SELECT 'https://svc.example/about/team-' || doc_id AS url, "
            "'merge' AS stage, "
            f"'{_MG_BLOB}' || chr(10) || chr(10) || text || chr(10) || "
            f"chr(10) || '{_MG_A2}' AS text, "
            "CAST(3 AS BIGINT) AS n_spans, "
            "'div' AS s1_kind, "
            f"CAST({len(_MG_P1) + len(_MG_P2) - 24}"
            " + length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS s1_start, "
            f"CAST({24 + len(_MG_BLOB) + 4} AS BIGINT) AS s1_len, "
            "'section' AS s2_kind, "
            f"CAST({len(_MG_P1) + len(_MG_P2) + len(_MG_BLOB) + len(_MG_P3) - 12}"
            " + length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS s2_start, "
            "CAST(length(text) + 16 AS BIGINT) AS s2_len, "
            "'section' AS s3_kind, "
            f"CAST({len(_MG_P1) + len(_MG_P2) + len(_MG_BLOB) + len(_MG_P3) + len(_MG_P4) - 9}"
            " + length(CAST(doc_id AS VARCHAR)) + length(text) AS BIGINT) "
            "AS s3_start, "
            f"CAST({9 + len(_MG_A2)} AS BIGINT) AS s3_len "
            f"FROM documents WHERE length(text) BETWEEN {_PP_LEN_MIN} AND {_PP_LEN_MAX}"
        ),
        "extract_repeated_items": (
            "SELECT 'https://shop.example/collection/guides-' || doc_id "
            "AS url, 'repeated_items' AS stage, "
            f"'{_CL_DESC}' || chr(10) || chr(10) || text || chr(10) || "
            f"chr(10) || '{_CL_LI2}' || chr(10) || chr(10) || '{_CL_LI3}' "
            "AS text, "
            "CAST(3 AS BIGINT) AS n_spans, "
            "'li' AS s1_kind, "
            f"CAST({len(_CL_P1) + len(_CL_P2) - 4}"
            " + length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS s1_start, "
            "CAST(length(text) + 4 AS BIGINT) AS s1_len, "
            "'li' AS s2_kind, "
            f"CAST({len(_CL_P1) + len(_CL_P2) + 5}"
            " + length(CAST(doc_id AS VARCHAR)) + length(text) AS BIGINT) "
            "AS s2_start, "
            f"CAST({len(_CL_LI2) + 4} AS BIGINT) AS s2_len, "
            "'li' AS s3_kind, "
            f"CAST({len(_CL_P1) + len(_CL_P2) + 5 + 4 + len(_CL_LI2) + 5}"
            " + length(CAST(doc_id AS VARCHAR)) + length(text) AS BIGINT) "
            "AS s3_start, "
            f"CAST({len(_CL_LI3) + 4} AS BIGINT) AS s3_len "
            f"FROM documents WHERE length(text) BETWEEN {_PP_LEN_MIN} AND {_PP_LEN_MAX}"
        ),
        "extract_jsonld_product": (
            "SELECT 'https://store.example/product/item-' || doc_id AS url, "
            "'jsonld_product' AS stage, text, "
            "CAST(1 AS BIGINT) AS n_spans, "
            "'out:jsonld_product' AS s1_kind, "
            "CAST(0 AS BIGINT) AS s1_start, "
            "CAST(length(text) AS BIGINT) AS s1_len "
            f"FROM documents WHERE length(text) BETWEEN {_PP_LEN_MIN} AND {_PP_LEN_MAX}"
        ),
        "extract_discourse": (
            "SELECT 'https://forum.example/t/topic-' || doc_id AS url, "
            "'discourse' AS stage, "
            f"text || ' ' || '{_DS_REPLY}' AS text, "
            "CAST(1 AS BIGINT) AS n_spans, "
            "'out:discourse' AS s1_kind, "
            "CAST(0 AS BIGINT) AS s1_start, "
            f"CAST(length(text) + 1 + {len(_DS_REPLY)} AS BIGINT) AS s1_len "
            f"FROM documents WHERE length(text) BETWEEN {_PP_LEN_MIN} AND {_PP_LEN_MAX}"
        ),
        "quality_heuristic": _quality_heuristic_sql(),
        "curation_audit": _curation_audit_sql(),
        "resume_manifest": (
            "SELECT CAST(('0x' || substr(md5("
            "'https://docs.example/blog/doc-' || doc_id), 1, 15))::UBIGINT "
            "% 4 AS BIGINT) AS chunk_id, "
            "count(*) AS rows, count(*) AS input_rows, "
            "CAST(4 AS BIGINT) AS run1_chunks_run, "
            "CAST(4 AS BIGINT) AS run2_chunks_skipped "
            "FROM documents GROUP BY 1"
        ),
        "page_type_predict": (
            "SELECT 'https://community.example/thread/topic-' || doc_id "
            "AS url, 'forum' AS family, 'forum' AS page_type, "
            "1.0 AS confidence FROM documents "
            "UNION ALL SELECT 'https://shop.example/product/widget-' || "
            "doc_id, 'product', 'product', 1.0 FROM documents "
            "UNION ALL SELECT 'https://docs.example.org/docs/guide-' || "
            "doc_id, 'documentation', 'documentation', 1.0 FROM documents"
        ),
        "topk_per_source": (
            "SELECT source, rank, doc_id, n_chars FROM ("
            "SELECT source, doc_id, n_chars, "
            "row_number() OVER (PARTITION BY source "
            "ORDER BY n_chars DESC, doc_id ASC) AS rank FROM documents) "
            "WHERE rank <= 2"
        ),
        "corpus_datasheet": (
            # datasheet_sql is generated from the operator's own section/
            # percentile tables; every roundtrip page extracts at the
            # 'main' cascade stage (the row's previous sole content)
            _datasheet_oracle_sql()
            + " UNION ALL SELECT 'extraction_stage' AS section, "
            "'main' AS key, count(*) AS value FROM documents"
            + " UNION ALL SELECT 'docs_per_guessed_lang' AS section, "
            "lang_guess AS key, CAST(count(*) AS BIGINT) AS value FROM "
            f"(SELECT {_lang_guess_case()} AS lang_guess FROM documents) g "
            "GROUP BY lang_guess"
            # tokenizer sections: ASCII filter on the RAW token, lower
            # after (same order as the Spark side), integer counts
            + " UNION ALL SELECT 'tokenizer_top_words' AS section, "
            "word AS key, CAST(n AS BIGINT) AS value FROM ("
            "SELECT lower(w) AS word, count(*) AS n FROM ("
            "SELECT unnest(string_split(text, ' ')) AS w FROM documents) "
            "WHERE regexp_matches(w, '^[A-Za-z]+$') GROUP BY lower(w) "
            "ORDER BY n DESC, word ASC LIMIT 20)"
            + " UNION ALL SELECT 'tokenizer_top_pairs' AS section, "
            "lft || '+' || rgt AS key, CAST(pair_n AS BIGINT) AS value "
            "FROM (SELECT substr(word, i, 1) AS lft, "
            "substr(word, i + 1, 1) AS rgt, sum(n) AS pair_n FROM ("
            "SELECT lower(w) AS word, count(*) AS n FROM ("
            "SELECT unnest(string_split(text, ' ')) AS w FROM documents) "
            "WHERE regexp_matches(w, '^[A-Za-z]+$') GROUP BY lower(w)) v, "
            "LATERAL (SELECT unnest(generate_series(1, len(word) - 1)) "
            "AS i) s WHERE len(word) >= 2 "
            "GROUP BY lft, rgt ORDER BY pair_n DESC, lft ASC, rgt ASC "
            "LIMIT 20)"
            + " UNION ALL SELECT 'tokenizer_merges' AS section, "
            "CAST(rank AS VARCHAR) || ':' || l || '+' || r AS key, "
            "CAST(pn AS BIGINT) AS value FROM (" + _bpe_merges_sql(4) + ") mq"
        ),
        "minhash_lsh_pairs": (
            # all-pairs exact shingle-set Jaccard; the Spark side must find
            # exactly these via LSH candidates + exact verify (recall 1.0 on
            # this corpus at threshold 800 — deterministic MinHash)
            f"{_SHINGLES_CTE} "
            "SELECT a.doc_id AS a_id, b.doc_id AS b_id, "
            "CAST(floor(1000.0 * len(list_intersect(a.sh, b.sh)) / "
            "(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))) "
            "AS BIGINT) AS jac_x1000 "
            "FROM s a JOIN s b ON a.doc_id < b.doc_id "
            "WHERE CAST(floor(1000.0 * len(list_intersect(a.sh, b.sh)) / "
            "(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))) "
            "AS BIGINT) >= 800"
        ),
        "simhash_near_dups": _simhash_pairs_sql(3),
        "pack_shards": (
            # the oracle is the naive GLOBAL window cumsum duckdb can afford
            # at sf0.01 (the Spark side must use the bucketed distributed
            # prefix sum — no single-task global window), plus the seq-64
            # concat-and-chunk split as a LATERAL range explode
            "WITH t AS (SELECT doc_id, "
            "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens "
            "FROM documents), "
            "c AS (SELECT doc_id, n_tokens, sum(n_tokens) OVER "
            "(ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM t), "
            "a AS (SELECT doc_id, n_tokens, cum - n_tokens AS strt, "
            "CAST(floor((cum - n_tokens) / 2000.0) AS BIGINT) AS shard_id "
            "FROM c WHERE n_tokens > 0) "
            "SELECT doc_id, n_tokens, shard_id, "
            "CAST(s.seq_id AS BIGINT) AS seq_id, "
            "CAST(GREATEST(strt, s.seq_id * 64) - strt AS BIGINT) "
            "AS doc_off, "
            "CAST(GREATEST(strt, s.seq_id * 64) - s.seq_id * 64 AS BIGINT) "
            "AS seq_off, "
            "CAST(LEAST(strt + n_tokens, (s.seq_id + 1) * 64) "
            "- GREATEST(strt, s.seq_id * 64) AS BIGINT) AS piece_tokens "
            "FROM a, LATERAL unnest(range(CAST(strt // 64 AS BIGINT), "
            "CAST((strt + n_tokens - 1) // 64 + 1 AS BIGINT))) AS s(seq_id)"
        ),
        "write_shards": (
            # r6: the SPLIT-AWARE writer recomputed from the table alone:
            # md5-prefix gate -> 98/1/1 split, cumsum PARTITIONED BY split
            # (pipeline packs each split independently, so a shard can
            # never mix train/eval text), then md5 over the exact
            # doc_id\t n_tokens\t text\n lines in doc_id order.
            # sum() is CAST to BIGINT: DuckDB's HUGEINT lands in pandas as
            # float64 and hash-mismatches an integer-equal Spark column.
            "WITH t AS (SELECT doc_id, "
            "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
            "text, CASE WHEN g < 98 THEN 'train' WHEN g < 99 THEN 'val' "
            "ELSE 'test' END AS split FROM (SELECT *, "
            "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))"
            "::UBIGINT % 100 AS BIGINT) AS g FROM documents)), "
            "c AS (SELECT split, doc_id, n_tokens, text, "
            "sum(n_tokens) OVER (PARTITION BY split ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) AS cum FROM t), "
            "a AS (SELECT split, doc_id, n_tokens, text, "
            "CAST(floor((cum - n_tokens) / 2000.0) AS BIGINT) AS shard_id "
            "FROM c) "
            "SELECT split, shard_id, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_tokens) AS BIGINT) AS shard_tokens, "
            "md5(string_agg(doc_id || chr(9) || n_tokens || chr(9) || "
            "replace(replace(replace(text, '\\', '\\\\'), chr(10), '\\n'), "
            "chr(9), '\\t') "
            "|| chr(10), '' ORDER BY doc_id)) AS content_md5 "
            "FROM a GROUP BY split, shard_id"
        ),
        "warc_cdx_fetch": (
            # exact page bytes reconstructed from the template: a wrong
            # CDX offset/length yields different bytes -> different md5;
            # the same rows must come back from BOTH archive framings
            "SELECT s.src, 'https://docs.example/blog/doc-' || doc_id "
            "AS url, "
            "CAST(1767225600 + doc_id AS BIGINT) AS ts_epoch, "
            "md5('" + _RT_P1 + "' || lang || '" + _RT_P3 + "' || "
            "CAST(doc_id AS VARCHAR) || '" + _RT_P5 + "<p>' || text || '"
            + _RT_P7 + "') AS html_md5, lang FROM documents, "
            "(SELECT unnest(['native', 'foreign']) AS src) s"
        ),
        "mixture_weights": (
            # weights + the deterministic downsample they drive: T =
            # min_k(n_k * 1e6 // w_k), rate_k = least(1e6, T*w_k // n_k),
            # survivor iff md5-prefix(doc_id) % 1e6 < rate_k — integer
            # arithmetic end to end, so both engines keep the same docs
            "WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents "
            "GROUP BY source), "
            "n AS (SELECT source, n_docs, "
            "CAST(floor(1000 * pow(n_docs, 0.5)) AS BIGINT) AS num FROM c), "
            "w AS (SELECT source, CAST(n_docs AS BIGINT) AS n_docs, "
            "CAST(floor(1000000 * num / (SELECT SUM(num) FROM n)) "
            "AS BIGINT) AS weight_x1e6 FROM n), "
            "t AS (SELECT min(n_docs * 1000000 // weight_x1e6) AS tt "
            "FROM w WHERE weight_x1e6 > 0), "
            "r AS (SELECT source, n_docs, weight_x1e6, "
            "LEAST(1000000, (SELECT tt FROM t) * weight_x1e6 // n_docs) "
            "AS rate FROM w), "
            "k AS (SELECT d.source, count(*) AS n_kept FROM documents d "
            "JOIN r ON d.source = r.source "
            "WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), "
            "1, 15))::UBIGINT % 1000000 AS BIGINT) < r.rate "
            "GROUP BY d.source), "
            # leakage-safe split: same md5-prefix hash, mod 100, 98/1/1
            "sp AS (SELECT source, "
            "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))"
            "::UBIGINT % 100 AS BIGINT) AS g FROM documents), "
            "sc AS (SELECT source, "
            "CAST(sum(CASE WHEN g < 98 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_train, "
            "CAST(sum(CASE WHEN g >= 98 AND g < 99 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_val, "
            "CAST(sum(CASE WHEN g >= 99 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_test FROM sp GROUP BY source) "
            "SELECT r.source, r.n_docs, r.weight_x1e6, "
            "CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept, "
            "sc.n_train, sc.n_val, sc.n_test "
            "FROM r LEFT JOIN k ON r.source = k.source "
            "LEFT JOIN sc ON r.source = sc.source"
        ),
        "gopher_quality": (
            # every Gopher signal recomputed with DuckDB list/regex
            # functions over the same multi-line text
            "WITH m AS (SELECT doc_id, text || '" + _QLINES + "' AS t "
            "FROM documents), "
            "sig AS (SELECT doc_id, "
            "string_split(t, ' ') AS words, "
            "string_split(t, chr(10)) AS lines, t FROM m), "
            "calc AS (SELECT doc_id, "
            "CAST(len(words) AS BIGINT) AS n_words, "
            "CAST(floor(1000.0 * list_sum(list_transform(words, "
            "w -> len(w))) / len(words)) AS BIGINT) AS mean_word_len_x1000, "
            "CAST(floor(1000.0 * len(regexp_extract_all(t, '[#]|\\.\\.\\.'))"
            " / len(words)) AS BIGINT) AS symbol_ratio_x1000, "
            "CAST(floor(1000.0 * len(list_filter(lines, l -> "
            "l LIKE '- %' OR l LIKE '* %' OR l LIKE '• %')) / len(lines)) "
            "AS BIGINT) AS bullet_ratio_x1000, "
            "CAST(floor(1000.0 * len(list_filter(lines, l -> "
            "l LIKE '%...' OR l LIKE '%…')) / len(lines)) AS BIGINT) "
            "AS ellipsis_ratio_x1000, "
            "CAST(floor(1000.0 * len(list_filter(words, w -> "
            "regexp_matches(w, '[A-Za-z]'))) / len(words)) AS BIGINT) "
            "AS alpha_ratio_x1000, "
            "CAST(len(list_filter(words, w -> w IN ('the','be','to','of',"
            "'and','that','have','with'))) AS BIGINT) AS stop_hits FROM sig) "
            "SELECT *, (n_words >= 50 AND n_words <= 100000 "
            "AND mean_word_len_x1000 >= 3000 AND mean_word_len_x1000 <= 10000 "
            "AND symbol_ratio_x1000 < 100 AND bullet_ratio_x1000 <= 900 "
            "AND ellipsis_ratio_x1000 <= 300 AND alpha_ratio_x1000 >= 800 "
            "AND stop_hits >= 2) AS gopher_pass FROM calc"
        ),
        "c4_lines": (
            "WITH m AS (SELECT doc_id, text || '" + _QLINES + "' AS t "
            "FROM documents), "
            "k AS (SELECT doc_id, t, string_split(t, chr(10)) AS lines, "
            "list_filter(string_split(t, chr(10)), l -> "
            "regexp_matches(l, '[.!?\"]$') "
            "AND len(string_split(l, ' ')) >= 3) AS kept FROM m) "
            "SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines, "
            "CAST(len(kept) AS BIGINT) AS n_kept_lines, "
            "array_to_string(kept, chr(10)) AS clean_text, "
            "(len(kept) >= 3 AND NOT (contains(lower(t), 'lorem ipsum') "
            "OR contains(lower(t), '{') OR contains(lower(t), 'javascript')"
            ")) AS page_kept FROM k"
        ),
        "per_host_quota": (
            # flat row_number over the zipfian hosts — the Spark side must
            # reproduce it with the two-phase salted rank
            "WITH h AS (SELECT doc_id, 'h' || CAST(CASE WHEN doc_id % 2 = 0 "
            "THEN 0 ELSE doc_id % 37 END AS VARCHAR) || '.example' AS host "
            "FROM documents), "
            "r AS (SELECT host, doc_id, row_number() OVER "
            "(PARTITION BY host ORDER BY doc_id) AS rank FROM h), "
            "u AS (SELECT doc_id, 'https://' || host || "
            "CASE CAST(doc_id % 4 AS INTEGER) "
            "WHEN 0 THEN '/blog/post-' || CAST(doc_id AS VARCHAR) "
            "WHEN 1 THEN '/casino/win-' || CAST(doc_id AS VARCHAR) "
            "WHEN 2 THEN '/static/app-' || CAST(doc_id AS VARCHAR) "
            "|| '.js' "
            "ELSE '/go-lottery-' || CAST(doc_id AS VARCHAR) || '-xxx' "
            "END AS url, host FROM h), "
            "a AS (SELECT doc_id, url, "
            "(host = 'h0.example' OR host LIKE '%.h0.example') "
            "AS domain_blocked, "
            "CAST((CASE WHEN contains(url, 'casino') THEN 1 ELSE 0 END) "
            "+ (CASE WHEN contains(url, 'xxx') THEN 1 ELSE 0 END) "
            "+ (CASE WHEN contains(url, 'viagra') THEN 1 ELSE 0 END) "
            "+ (CASE WHEN contains(url, 'lottery') THEN 1 ELSE 0 END) "
            "+ (CASE WHEN contains(url, 'webcam') THEN 1 ELSE 0 END) "
            "AS BIGINT) AS url_kw_hits, "
            "regexp_matches(url, '\\.(js|css|json|xml|rss|atom|jpg|jpeg"
            "|png|gif|webp|svg|ico|mp3|mp4|avi|zip|gz|tar|exe|dmg|apk"
            "|woff2?)([?#]|\\z)') AS ext_blocked FROM u) "
            "SELECT r.host, CAST(r.rank AS BIGINT) AS rank, r.doc_id, "
            "a.url, a.domain_blocked, a.url_kw_hits, a.ext_blocked, "
            "(NOT a.domain_blocked AND a.url_kw_hits = 0 "
            "AND NOT a.ext_blocked) AS url_ok "
            "FROM r JOIN a ON a.doc_id = r.doc_id WHERE r.rank <= 5"
        ),
        "latest_revision": (
            "WITH p AS (SELECT 'https://rev.example/u' || "
            "CAST(doc_id % 250 AS VARCHAR) AS url, "
            "1767225600 + doc_id AS ts_epoch, "
            "'rev' || CAST(CAST(floor(doc_id / 250.0) AS INT) AS VARCHAR) "
            "|| ':' || text AS content FROM documents), "
            "r AS (SELECT url, ts_epoch, md5(content) AS content_md5, "
            "row_number() OVER (PARTITION BY url ORDER BY ts_epoch DESC, "
            "md5(content)) AS rn FROM p) "
            "SELECT url, CAST(ts_epoch AS BIGINT) AS ts_epoch, content_md5 "
            "FROM r WHERE rn = 1"
        ),
        "extract_incremental": (
            # the expected post-crawl corpus: urls 100-499 with the
            # 200-299 edit visible — identical whether a row was freshly
            # extracted (added/changed) or carried (unchanged)
            "SELECT 'https://docs.example/blog/doc-' || doc_id AS url, "
            "CASE WHEN doc_id >= 200 AND doc_id < 300 "
            "THEN text || ' with updated crawl words' ELSE text END AS text, "
            "lang FROM documents WHERE doc_id >= 100"
        ),
        "crawl_delta": (
            "WITH d AS (SELECT doc_id, "
            "'https://docs.example/blog/doc-' || doc_id AS url, text "
            "FROM documents), "
            "o AS (SELECT url, md5(text) AS h FROM d WHERE doc_id < 400), "
            "n AS (SELECT url, md5(CASE WHEN doc_id >= 200 AND doc_id < 300 "
            "THEN 'edited:' || text ELSE text END) AS h FROM d "
            "WHERE doc_id >= 100) "
            "SELECT COALESCE(n.url, o.url) AS url, "
            "CASE WHEN o.h IS NULL THEN 'added' "
            "WHEN n.h IS NULL THEN 'removed' "
            "WHEN n.h = o.h THEN 'unchanged' ELSE 'changed' END AS status "
            "FROM n FULL OUTER JOIN o ON n.url = o.url"
        ),
        "near_dup_clusters": (
            # recursive-CTE min-label propagation over the exact all-pairs
            # Jaccard >= 800 graph: each node's cluster_id is the smallest
            # doc_id reachable through near-dup edges (the Spark side must
            # find the same components via LSH pairs + alternating-star CC)
            "WITH RECURSIVE " + _SHINGLES_CTE[len("WITH "):] + ", "
            "pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id "
            "FROM s a JOIN s b ON a.doc_id < b.doc_id "
            "WHERE CAST(floor(1000.0 * len(list_intersect(a.sh, b.sh)) / "
            "(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))) "
            "AS BIGINT) >= 800), "
            "edges AS (SELECT a_id AS u, b_id AS v FROM pairs "
            "UNION SELECT b_id, a_id FROM pairs), "
            "reach(node, lbl) AS ("
            "SELECT u, u FROM edges "
            "UNION "
            "SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node) "
            "SELECT node AS doc_id, min(lbl) AS cluster_id, "
            "(node = min(lbl)) AS keep FROM reach GROUP BY node"
        ),
        "sessionize_events": (
            "WITH flagged AS ("
            "SELECT user_id, event_id, ts, value, "
            "CASE WHEN lag(ts) OVER w IS NULL "
            "OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END "
            "AS new_session FROM events WINDOW w AS "
            "(PARTITION BY user_id ORDER BY ts, event_id)), "
            "sessions AS (SELECT user_id, event_id, ts, value, "
            "CAST(sum(new_session) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) "
            "AS session_seq FROM flagged) "
            "SELECT user_id, session_seq, count(*) AS n_events, "
            "min(ts) AS session_start, max(ts) AS session_end, "
            "CAST(sum(CAST(value AS DECIMAL(38,6))) * 1000000 AS BIGINT) "
            "AS total_value_x1e6 "
            "FROM sessions GROUP BY user_id, session_seq"
        ),
        "knn_join": knn_sql,
        "embedding_near_dups": (
            # method='pairs': exact all-pairs cosine over the corpus + one
            # scale-twin per vector; only the twin pairs clear 0.9.
            # method='semdedup': all-pairs partner count + exists-smaller-id
            # over the x2(%3)/x4(%6) twin corpus — provably the semdedup
            # verdicts because twins share cells and tie on cent_x1000
            # (see q_embedding_near_dups docstring)
            "WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS e "
            "FROM embeddings UNION ALL "
            "SELECT vec_id + 10000, list_transform(embedding::DOUBLE[], "
            "x -> x * 2) FROM embeddings), "
            "sd_corpus AS (SELECT vec_id, embedding::DOUBLE[] AS e "
            "FROM embeddings UNION ALL "
            "SELECT vec_id + 10000, list_transform(embedding::DOUBLE[], "
            "x -> x * 2) FROM embeddings WHERE vec_id % 3 = 0 UNION ALL "
            "SELECT vec_id + 20000, list_transform(embedding::DOUBLE[], "
            "x -> x * 4) FROM embeddings WHERE vec_id % 6 = 0), "
            "sd_pairs AS (SELECT a.vec_id AS x, b.vec_id AS y "
            "FROM sd_corpus a, sd_corpus b WHERE a.vec_id != b.vec_id "
            "AND CAST(round(1000 * list_dot_product(a.e, b.e) / "
            "(sqrt(list_dot_product(a.e, a.e)) * "
            "sqrt(list_dot_product(b.e, b.e)))) AS BIGINT) >= 900) "
            "SELECT 'pairs' AS method, a.vec_id AS a_id, b.vec_id AS b_id, "
            "CAST(round(1000 * list_dot_product(a.e, b.e) / "
            "(sqrt(list_dot_product(a.e, a.e)) * "
            "sqrt(list_dot_product(b.e, b.e)))) AS BIGINT) AS cos_x1000, "
            "CAST(NULL AS BIGINT) AS n_dup_cands, "
            "CAST(NULL AS BIGINT) AS kept "
            "FROM corpus a, corpus b WHERE a.vec_id < b.vec_id "
            "AND CAST(round(1000 * list_dot_product(a.e, b.e) / "
            "(sqrt(list_dot_product(a.e, a.e)) * "
            "sqrt(list_dot_product(b.e, b.e)))) AS BIGINT) >= 900 "
            "UNION ALL "
            "SELECT 'semdedup' AS method, v.vec_id AS a_id, "
            "CAST(NULL AS BIGINT) AS b_id, CAST(NULL AS BIGINT) AS cos_x1000, "
            "COALESCE(p.cnt, 0) AS n_dup_cands, "
            "CAST(COALESCE(p.earlier, 0) = 0 AS BIGINT) AS kept "
            "FROM sd_corpus v LEFT JOIN "
            "(SELECT x, count(*) AS cnt, "
            "max(CASE WHEN y < x THEN 1 ELSE 0 END) AS earlier "
            "FROM sd_pairs GROUP BY x) p ON p.x = v.vec_id"
        ),
        "knn_join_lsh": (
            # exact 1-NN over the corpus + one scale-twin per vector
            "WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS e "
            "FROM embeddings UNION ALL "
            "SELECT vec_id + 10000, list_transform(embedding::DOUBLE[], "
            "x -> x * 2) FROM embeddings) "
            "SELECT a_id, rank, b_id, cos_x1000 FROM ("
            "SELECT a.vec_id AS a_id, b.vec_id AS b_id, "
            "CAST(round(1000 * list_dot_product(a.e, b.e) / "
            "(sqrt(list_dot_product(a.e, a.e)) * "
            "sqrt(list_dot_product(b.e, b.e)))) AS BIGINT) AS cos_x1000, "
            "row_number() OVER (PARTITION BY a.vec_id ORDER BY "
            "round(1000 * list_dot_product(a.e, b.e) / "
            "(sqrt(list_dot_product(a.e, a.e)) * "
            "sqrt(list_dot_product(b.e, b.e)))) DESC, b.vec_id ASC) AS rank "
            "FROM corpus a, corpus b WHERE a.vec_id != b.vec_id) "
            "WHERE rank <= 1"
        ),
        "multimodal_image_meta": (
            "SELECT doc_id, length(text) AS byte_len, "
            "length(text) % 1024 AS fake_width, "
            "(length(text) * 7) % 768 AS fake_height FROM documents"
        ),
        "multimodal_resize": (
            # mirror of the fake resizer's double arithmetic: s = min(1,
            # 256/max(w,h,1)); dims/bytes scale by s / s^2, truncated
            "WITH d AS (SELECT doc_id, length(text) AS n, "
            "length(text) % 1024 AS w, (length(text) * 7) % 768 AS h "
            "FROM documents), "
            "s AS (SELECT doc_id, n, w, h, "
            "LEAST(1.0, 256.0 / GREATEST(w, h, 1)) AS sc FROM d) "
            "SELECT doc_id, "
            "CAST(floor(w * sc) AS BIGINT) AS new_width, "
            "CAST(floor(h * sc) AS BIGINT) AS new_height, "
            "CAST(floor(n * sc * sc) AS BIGINT) AS resized_len FROM s"
        ),
        "pdf_roundtrip": (
            "SELECT doc_id, text FROM documents"
        ),
        "multimodal_frame_sample": (
            # one row per 64-byte chunk with 25fps timestamps
            "SELECT doc_id, t.i AS frame_idx, t.i * 40 AS ts_ms, "
            "CASE WHEN (t.i + 1) * 64 <= length(text) THEN 64 "
            "ELSE length(text) - t.i * 64 END AS frame_len "
            "FROM documents, LATERAL unnest(range(GREATEST(1, "
            "CAST(ceil(length(text) / 64.0) AS BIGINT)))) AS t(i)"
        ),
    }
    # --- registry consolidation (round 5): compose the merged oracles from
    # the per-variant SQL above, exactly mirroring the Spark-side unions /
    # per-doc joins in the merged q_* functions -------------------------------
    o["extract_special_stages"] = (
        o.pop("extract_jsonld_product")
        + " UNION ALL "
        + o.pop("extract_discourse")
    )
    o["ann_topk_methods"] = (
        "SELECT 'exact' AS method, * FROM (" + o.pop("embedding_topk") + ") "
        "UNION ALL SELECT 'lsh' AS method, * FROM ("
        + o.pop("ann_lsh_topk") + ") "
        "UNION ALL SELECT 'ivf' AS method, * FROM ("
        + o.pop("ivf_ann_topk") + ")"
    )
    o["knn_join_methods"] = (
        "SELECT 'exact' AS method, * FROM (" + o.pop("knn_join") + ") "
        "UNION ALL SELECT 'lsh' AS method, * FROM ("
        + o.pop("knn_join_lsh") + ")"
    )
    o["token_stats_full"] = (
        "SELECT * FROM (" + o.pop("token_stats") + ") ts JOIN ("
        + o.pop("bpe_token_stats") + ") bp USING (doc_id) JOIN ("
        + _mojibake_oracle_sql() + ") mj USING (doc_id)"
    )
    o["redact_pii"] = (
        "SELECT * FROM (" + o.pop("redact_pii") + ") pii JOIN ("
        + _substring_dedup_oracle_join() + ") ss USING (doc_id)"
    )
    o["doc_fingerprint"] = (
        "SELECT * FROM (" + o.pop("doc_fingerprint") + ") fp JOIN ("
        + o.pop("dsir_importance") + ") ds USING (doc_id)"
    )
    o["corpus_quality_rules"] = (
        "SELECT * FROM (" + o.pop("gopher_quality") + ") gq JOIN ("
        + o.pop("c4_lines") + ") c4 USING (doc_id) JOIN ("
        + _repetition_oracle_sql() + ") rep USING (doc_id)"
    )
    o["text_quality_id"] = (
        "SELECT * FROM (" + o.pop("language_id") + ") li JOIN ("
        + o.pop("quality_score") + ") qs USING (doc_id) JOIN ("
        + _ccnet_oracle_sql() + ") lm USING (doc_id)"
    )
    o["multimodal_image_pipeline"] = (
        "SELECT * FROM (" + o.pop("multimodal_image_meta") + ") mm JOIN ("
        + o.pop("multimodal_resize") + ") rz USING (doc_id)"
    )
    o["crawl_revisions_delta"] = (
        "SELECT 'latest' AS kind, url, ts_epoch, content_md5, "
        "CAST(NULL AS VARCHAR) AS status FROM ("
        + o.pop("latest_revision") + ") "
        "UNION ALL SELECT 'delta' AS kind, url, "
        "CAST(NULL AS BIGINT) AS ts_epoch, "
        "CAST(NULL AS VARCHAR) AS content_md5, status FROM ("
        + o.pop("crawl_delta") + ")"
    )
    return o
