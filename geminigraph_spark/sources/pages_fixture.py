"""Deterministic synthetic Common-Crawl-style ``pages`` fixture.

Schema (per /root/repo/FIXTURES.md F1 and BASELINE.json input_hint):
    url string, warc_ts timestamp, html binary, text string, lang string

Every page's content is a **pure function of (seed, page_index)** computed
with vectorized splitmix64 integer mixing — no RNG state, so generation is
identical regardless of partitioning and can be produced either on the
driver (pandas) or distributed (``spark.range(n)`` + ``mapInPandas``) with
bit-identical results. This mirrors how the reference treats its input as
an externally-given immutable edge file (reference: core/graph.hpp:358-364
reads a binary edge list whose content is fixed ahead of time).

Link structure: directed power-law graph; out-degree ~ Zipf(a=2.1) clipped
to [1, 50] with ~10% dangling pages (zero out-links — exercises the
reference's drop-dangling-mass PageRank semantics, toolkits/pagerank.cpp:
36-44, 77-97); ~1% self-loops; ~2% links to external URLs not in the pages
table (materialized as vertices); duplicate links possible (the reference
does NOT dedupe parallel edges — core/graph.hpp loader counts every
tuple); hrefs include root-relative (``/p/3``), path-relative (``3``),
dot-segment (``../p/3``), protocol-relative (``//siteS.example/p/3``),
``#fragment`` and ``?query`` variants to pin the full extractor
resolution (VERDICT r4 #3 — real Common-Crawl HTML is majority-relative
links), and ~6% of pages carry a trailing ``mailto:`` / ``javascript:``
anchor that the extractor must DROP (appended last so golden link
positions are unaffected).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

PAGES_PER_SITE = 20
MAX_OUT = 50
ZIPF_A = 2.1  # tail exponent = ZIPF_A - 1
DANGLING_FRAC = 0.10
SELF_FRAC = 0.01
EXT_FRAC = 0.02  # drawn after SELF_FRAC: kind u in [0.01, 0.03)
N_EXT_SITES = 37
REL_HREF_FRAC = 0.30
PROTO_REL_FRAC = 0.08  # internal absolute targets written as //host/path
FRAG_FRAC = 0.05
QUERY_FRAC = 0.05
NOISE_ANCHOR_FRAC = 0.06  # pages with a trailing mailto:/javascript: link
EPOCH_2025 = pd.Timestamp("2025-01-01T00:00:00")

_U64 = np.uint64


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64."""
    x = x.astype(_U64, copy=True)
    x += _U64(0x9E3779B97F4A7C15)
    x ^= x >> _U64(30)
    x *= _U64(0xBF58476D1CE4E5B9)
    x ^= x >> _U64(27)
    x *= _U64(0x94D049BB133111EB)
    x ^= x >> _U64(31)
    return x


def _key(idx: np.ndarray, salt: int, seed: int) -> np.ndarray:
    return _mix64(idx.astype(_U64) * _U64(0x9E3779B97F4A7C15) + _U64(salt * 0x100000001B3 + seed))


def _u01(h: np.ndarray) -> np.ndarray:
    return (h >> _U64(11)).astype(np.float64) / float(1 << 53)


def page_url(idx: np.ndarray) -> np.ndarray:
    site = pd.Series(idx // PAGES_PER_SITE).astype(str)
    k = pd.Series(idx % PAGES_PER_SITE).astype(str)
    return ("https://site" + site + ".example/p/" + k).values


def out_degrees(idx: np.ndarray, seed: int) -> np.ndarray:
    """Per-page out-link count: 0 for ~10% dangling, else Zipf(2.1)∈[1,50]."""
    dangling = _u01(_key(idx, 1, seed)) < DANGLING_FRAC
    u = _u01(_key(idx, 2, seed))
    u = np.maximum(u, 1e-12)
    deg = np.clip(np.floor(u ** (-1.0 / (ZIPF_A - 1.0))), 1, MAX_OUT).astype(np.int64)
    return np.where(dangling, 0, deg)


def _links_flat(idx: np.ndarray, n_pages: int, seed: int):
    """Flat per-link arrays for the given page indices.

    Returns (src_idx, link_j, dst_url, href, quote_kind) — dst_url is the
    canonical normalized target; href is the literal attribute embedded in
    the HTML (may be root-relative or carry #fragment/?query noise);
    quote_kind ∈ {0: double-quoted, 1: single-quoted, 2: unquoted} pins
    the extractor against all three real-world href forms (VERDICT r3
    missing #2).
    """
    deg = out_degrees(idx, seed)
    src = np.repeat(idx, deg)
    total = int(deg.sum())
    if total == 0:
        e = np.array([], dtype=np.int64)
        s = np.array([], dtype="U1")
        return e, e, s, s, e
    # link ordinal j within its page, vectorized
    ends = deg.cumsum()
    starts = ends - deg
    j = np.arange(total, dtype=np.int64) - np.repeat(starts, deg)

    lk = _mix64(src.astype(_U64) * _U64(0x9E3779B97F4A7C15) + j.astype(_U64) + _U64(seed * 7919))
    kind = _u01(_mix64(lk + _U64(101)))
    # preferential attachment toward low page indices: floor(n * v^2)
    v = _u01(_mix64(lk + _U64(202)))
    tgt = np.minimum((n_pages * v * v).astype(np.int64), n_pages - 1)
    tgt = np.where(kind < SELF_FRAC, src, tgt)
    is_ext = (kind >= SELF_FRAC) & (kind < SELF_FRAC + EXT_FRAC)

    ext_site = pd.Series((lk % _U64(N_EXT_SITES)).astype(np.int64)).astype(str)
    ext_path = pd.Series(((lk >> _U64(13)) % _U64(11)).astype(np.int64)).astype(str)
    ext_url = ("https://ext" + ext_site + ".example/x/" + ext_path).values
    int_url = page_url(tgt)
    dst_url = np.where(is_ext, ext_url, int_url)

    # literal href: same-site internal targets may be RELATIVE in any of
    # the three real-world forms (root-relative, path-relative from the
    # page's /p/ directory, dot-segment); other internal targets may be
    # protocol-relative — the golden dst_url is identical in every case,
    # which is exactly what pins the extractor's resolution arithmetic
    same_site = (~is_ext) & (tgt // PAGES_PER_SITE == src // PAGES_PER_SITE)
    rel = same_site & (_u01(_mix64(lk + _U64(303))) < REL_HREF_FRAC)
    kstr = pd.Series(tgt % PAGES_PER_SITE).astype(str)
    rform = (_mix64(lk + _U64(606)) % _U64(3)).astype(np.int64)
    rel_href = np.where(
        rform == 0,
        ("/p/" + kstr).values,  # root-relative
        np.where(
            rform == 1,
            kstr.values,  # path-relative: merges onto the /p/ directory
            ("../p/" + kstr).values,  # dot-segment
        ),
    )
    prot = (
        (~is_ext) & ~rel & (_u01(_mix64(lk + _U64(707))) < PROTO_REL_FRAC)
    )
    prot_href = pd.Series(dst_url).str.replace("^https:", "", regex=True).values
    href = np.where(rel, rel_href, np.where(prot, prot_href, dst_url))
    noise = _u01(_mix64(lk + _U64(404)))
    frag = (~is_ext) & (noise < FRAG_FRAC)
    query = (~is_ext) & (noise >= FRAG_FRAC) & (noise < FRAG_FRAC + QUERY_FRAC)
    hs = pd.Series(href)
    hs = hs.where(~frag, hs + "#sec1")
    hs = hs.where(~query, hs + "?utm=1")
    qk = (_mix64(lk + _U64(505)) % _U64(3)).astype(np.int64)
    return src, j, dst_url, hs.values, qk


def gen_pages_pandas(n_pages: int, seed: int = 42, idx: np.ndarray | None = None) -> pd.DataFrame:
    """Generate pages rows for the given page indices (default: all)."""
    if idx is None:
        idx = np.arange(n_pages, dtype=np.int64)
    idx = np.asarray(idx, dtype=np.int64)
    urls = page_url(idx)
    site = idx // PAGES_PER_SITE

    title = "Page " + pd.Series(idx).astype(str) + " of site " + pd.Series(site).astype(str)
    h1 = _key(idx, 10, seed)
    h2 = _key(idx, 11, seed)
    para = (
        "Lorem ipsum dolor page "
        + pd.Series(idx).astype(str)
        + " token"
        + pd.Series((h1 % _U64(97)).astype(np.int64)).astype(str)
        + " token"
        + pd.Series((h2 % _U64(89)).astype(np.int64)).astype(str)
        + " sit amet."
    )

    src, j, dst_url, href, qk = _links_flat(idx, n_pages, seed)
    anchors = pd.DataFrame({"src": src, "j": j, "href": href, "qk": qk})
    h = anchors["href"]
    a_open = pd.Series(
        np.where(
            anchors["qk"] == 0,
            '<a href="' + h + '">',
            np.where(
                anchors["qk"] == 1,
                "<a href='" + h + "'>",
                # unquoted: legal here because fixture hrefs never contain
                # whitespace/quotes; terminated by the '>' that follows
                "<a href=" + h + ">",
            ),
        )
    )
    anchors["a_html"] = (
        a_open + "anchor " + anchors["j"].astype(str) + "</a> "
    )
    anchors["a_text"] = "anchor " + anchors["j"].astype(str)
    per_page_html = anchors.groupby("src")["a_html"].agg("".join)
    per_page_text = anchors.groupby("src")["a_text"].agg(" ".join)
    a_html = pd.Series(idx).map(per_page_html).fillna("").values
    a_text = pd.Series(idx).map(per_page_text).fillna("").values

    # trailing scheme-noise anchor (mailto:/javascript:) on ~6% of pages —
    # the extractor must DROP these (no vertex, no link_pos); appended
    # LAST so golden positions are untouched, but their anchor text IS
    # part of the page text (the text recomputation must stay
    # byte-identical)
    nu = _u01(_key(idx, 13, seed))
    has_noise = nu < NOISE_ANCHOR_FRAC
    is_mail = nu < NOISE_ANCHOR_FRAC / 2
    site_s = pd.Series(site).astype(str)
    noise_html = np.where(
        is_mail,
        ("<a href=mailto:ops@site" + site_s + ".example>mail</a>").values,
        '<a href="javascript:void(0)">js</a>',
    )
    noise_html = np.where(has_noise, noise_html, "")
    noise_text = np.where(has_noise, np.where(is_mail, "mail", "js"), "")
    a_html = a_html + noise_html

    html = (
        "<html><head><title>"
        + title
        + "</title></head><body><p>"
        + para
        + "</p>"
        + a_html
        + "</body></html>"
    )
    text = title + " " + para
    text = np.where(a_text == "", text, text + " " + a_text)
    text = np.where(noise_text == "", text, text + " " + noise_text)

    lu = _u01(_key(idx, 12, seed))
    lang = np.where(lu < 0.90, "en", np.where(lu < 0.95, "de", "fr"))

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": EPOCH_2025 + pd.to_timedelta(idx, unit="s"),
            "html": [t.encode("utf-8") for t in html],
            "text": text,
            "lang": lang,
        }
    )


def golden_edges_pandas(n_pages: int, seed: int = 42) -> pd.DataFrame:
    """The exact (src_url, dst_url, j) multiset embedded in the HTML."""
    idx = np.arange(n_pages, dtype=np.int64)
    src, j, dst_url, _href, _qk = _links_flat(idx, n_pages, seed)
    return pd.DataFrame({"src_url": page_url(src), "dst_url": dst_url, "j": j})


def gen_pages_df(spark, n_pages: int, seed: int = 42, partitions: int | None = None):
    """Distributed generation: spark.range → mapInPandas, bit-identical to
    ``gen_pages_pandas`` because content is a pure function of page index."""
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield gen_pages_pandas(n_pages, seed, idx=pdf["id"].values)

    return spark.range(0, n_pages, numPartitions=partitions).mapInPandas(gen, schema)
