"""Deterministic synthetic Common-Crawl-style web-pages table.

Schema (BASELINE.json ``input_hint``):
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Generation rules follow FIXTURES.md §F1:
  * ~50 synthetic domains drawn Zipf-skewed (intentional skew — the
    salting/AQE path must defuse it),
  * warc_ts = 2026-01-01T00:00:00Z + jitter, ~5% of rows out of order
    by more than a typical watermark delta (late-data tests),
  * html = seeded template with <head> RSS link, <body> with <p>/<a>
    tags and mixed \r\n / \n newlines,
  * text = the reference extraction (riko/modules/fetchpage.py:45-53 +
    riko/parsers.py:113-174 semantics, vendored in riko_spark.textref)
    applied to html — ground truth for the byte-identity invariant.

Everything is seeded (numpy default_rng) — same (seed, n) always yields
the same bytes.  Output parquet is split across multiple files so Spark
reads it with real parallelism.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from riko_spark.textref import extract_text

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_WORDS = (
    "spark stream pipe filter web page crawl data index token value "
    "query graph node batch window join union count sort merge feed "
    "title link item row shuffle salt skew scale text hash slice"
).split()

_LANGS = np.array(["en", "de", "fr", "es"])
_LANG_W = np.array([0.55, 0.2, 0.15, 0.1])

BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _zipf_weights(k: int, s: float = 1.2) -> np.ndarray:
    w = 1.0 / np.arange(1, k + 1) ** s
    return w / w.sum()


def generate_pages(
    n: int, seed: int = 42, late_frac: float = 0.05, offset: int = 0
) -> pa.Table:
    """Generate ``n`` deterministic page rows as a pyarrow Table.

    ``offset`` shifts the row index used in urls/bodies so multi-file
    datasets keep urls globally unique (F1 requirement).
    """
    rng = np.random.default_rng(seed)
    n_domains = 50
    domains = np.array([f"site{i:02d}.example.com" for i in range(n_domains)])
    dom_idx = rng.choice(n_domains, size=n, p=_zipf_weights(n_domains))

    # event time: mostly increasing with jitter; ~late_frac rows pushed
    # far backwards (out-of-order beyond a typical watermark delta)
    step_s = rng.integers(1, 20, size=n).cumsum()
    jitter = rng.integers(0, 10, size=n)
    offsets = step_s + jitter
    late = rng.random(n) < late_frac
    offsets = np.where(late, np.maximum(offsets - 3600, 0), offsets)

    langs = rng.choice(len(_LANGS), size=n, p=_LANG_W)
    word_idx = rng.integers(0, len(_WORDS), size=(n, 12))

    urls, tss, htmls, texts, lang_out = [], [], [], [], []
    for k in range(n):
        i = offset + k
        w = [_WORDS[j] for j in word_idx[k]]
        slug = f"{w[0]}-{w[1]}-{i}"
        url = f"https://{domains[dom_idx[k]]}/{w[2]}/{slug}"
        title = f"{w[3].title()} {w[4]} {w[5]}"
        feed = f"https://{domains[dom_idx[k]]}/feed-{i % 7}.xml"
        body = (
            f"<p>{' '.join(w[0:4])} &amp; {' '.join(w[4:7])}</p>\r\n"
            f"<p>{' '.join(w[7:10])}</p>\n"
            f'<a href="https://{domains[(dom_idx[k] + 1) % n_domains]}/x">{w[10]}</a>\n'
            f"<p>{w[11]} end-{i}</p>"
        )
        html = (
            "<html><head>"
            f"<title>{title}</title>"
            f'<link rel="alternate" type="application/rss+xml" href="{feed}"/>'
            f"</head><body>{body}</body></html>"
        ).encode("utf-8")
        urls.append(url)
        tss.append(BASE_TS + timedelta(seconds=int(offsets[k])))
        htmls.append(html)
        texts.append(extract_text(html)[0])
        lang_out.append(_LANGS[langs[k]])

    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us", tz="UTC")),
            pa.array(htmls, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(lang_out, pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


def write_pages(path: str, n: int, seed: int = 42, files: int | None = None) -> str:
    """Write n generated page rows as a multi-file parquet dataset."""
    os.makedirs(path, exist_ok=True)
    # enough files that a 32-core scan parallelizes and a file-stream
    # source yields multiple micro-batches
    files = files or max(8, min(64, n // 3_125 or 8))
    per = (n + files - 1) // files
    done = 0
    for f in range(files):
        take = min(per, n - done)
        if take <= 0:
            break
        # per-file seed derived deterministically from (seed, f);
        # offset keeps urls globally unique across files
        tbl = generate_pages(take, seed=seed * 1_000 + f, offset=done)
        pq.write_table(tbl, os.path.join(path, f"part-{f:04d}.parquet"))
        done += take
    return path


def pages_fixture(n: int = 2_000, seed: int = 42, root: str | None = None) -> str:
    """Generate-once cached pages dataset for tests/bench."""
    root = root or os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".fixtures")
    path = os.path.join(root, f"pages_n{n}_s{seed}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        write_pages(path, n, seed)
        open(marker, "w").close()
    return path
