"""HTML extraction — the reference's core document operators.

The reference parses Wikipedia HTML with BeautifulSoup inside row-at-a-time
Python UDFs: ``extract_categories`` (ETL/tasks/categorizer.py:89-101),
``extract_last_edited_date`` (categorizer.py:103-122), ``extract_text``
(ETL/tasks/converter.py:35-44). Two engine paths here:

1. **Expression path** (default, hot path): regexp-based column expressions —
   JVM-side, codegen'd, and exactly mirrorable in ANSI SQL so the DuckDB
   oracle can check them. For the well-formed page structure the reference
   targets (div#mw-normal-catlinks, li#footer-info-lastmod) the regexes are
   semantics-equivalent to the BS4 walk.
2. **UDF path**: an Arrow-batched pandas UDF using the stdlib
   ``html.parser`` — a real structural parse for messy HTML, kept off the
   hot path per SURVEY.md §2.10 policy (UDFs only where parsing is genuinely
   non-relational).

Malformed-HTML divergence class (VERDICT r3 missing-#4, hardened + pinned
r5). The reference parses with ``BeautifulSoup(html, "html.parser")`` —
i.e. bs4's TREE BUILDER over the SAME stdlib tokenizer used here — so
tokenization (entities, CDATA script handling, bare ``<``) agrees by
construction; what can differ is tree-shape recovery. Status per case,
each pinned by tests/test_functions.py::TestPathologicalHtml:

HARDENED (now BS4-equivalent, previously divergent):
- attributes/order on the catlinks div or its anchors (real Wikipedia:
  ``<div id=.. class=..>``, ``<a href=.. title=..>``) — both paths now
  match by id/tag regardless of other attributes, like ``soup.find``;
- nested ``<div>``s inside catlinks — the UDF tracks div depth, so inner
  closes no longer end the category scope early (bs4 subtree semantics);
- only the FIRST ``<ul>`` inside catlinks yields categories
  (categorizer.py:97-98 ``find("ul")``), not every anchor in the div;
- anchor text split by inline markup (``<a>Cat<b>1</b></a>``) is joined
  per anchor like ``a.get_text(strip=True)``, not one entry per fragment;
- entity references in category names decode in the UDF path
  (``convert_charrefs`` = bs4 behavior).

DECLARED DIVERGENT (expression path only — regexes cannot balance tags;
the UDF path is the BS4-faithful fallback for such corpora):
- the expr path's catlinks scope ends at the first ``</div>``, so
  categories inside a NESTED div are truncated where bs4 keeps them;
- the expr path returns raw entity text (``&amp;`` stays ``&amp;``) and
  collects anchors from the whole div, not just the first ``<ul>``;
- unclosed ``<a>`` runs (``<li><a>X<li><a>Y``): bs4's treebuilder nests
  each later element inside the unclosed anchor, so ``get_text`` on the
  OUTER anchor returns the concatenation of everything after it while
  inner anchors repeat their own text; both engine paths here instead
  close an anchor at the next ``<a>``/``</ul>`` and report each category
  once — deliberately non-bug-for-bug (the bs4 shape double-counts).

``synth_html`` builds a deterministic Wikipedia-shaped page from the
``documents`` fixture columns so both paths (and the SQL oracle) can be
exercised on driver data; the same construction exists as a SQL fragment
(``SYNTH_HTML_SQL``) so oracle queries operate on byte-identical input.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MONTHS = [
    "January",
    "February",
    "March",
    "April",
    "May",
    "June",
    "July",
    "August",
    "September",
    "October",
    "November",
    "December",
]

# ------------------------------------------------------------ synthesis

_MONTHS_SQL = "[" + ", ".join(f"'{m}'" for m in MONTHS) + "]"

# DuckDB SQL fragment computing the same HTML string as ``synth_html``.
SYNTH_HTML_SQL = (
    "concat("
    "'<html><head><title>Doc ', CAST(doc_id AS VARCHAR), '</title>', "
    "'<script>var x = 1;</script><style>.cat { color: red; }</style></head>', "
    "'<body><div id=\"mw-normal-catlinks\"><ul>', "
    "'<li><a>Lang_', lang, '</a></li>', "
    "'<li><a>Source_', source, '</a></li>', "
    "'<li><a>Size_', CAST(n_chars // 100 AS VARCHAR), '</a></li>', "
    "'</ul></div><p>', text, '</p>', "
    "'<li id=\"footer-info-lastmod\"> This page was last edited on ', "
    f"CAST(1 + doc_id % 28 AS VARCHAR), ' ', {_MONTHS_SQL}[CAST(doc_id % 12 AS INTEGER) + 1], "
    "' ', CAST(2020 + doc_id % 5 AS VARCHAR), ', at 10:00 (UTC).</li></body></html>'"
    ")"
)


def synth_html(
    doc_id: Column, lang: Column, source: Column, text: Column, n_chars: Column
) -> Column:
    """Deterministic Wikipedia-shaped HTML page from documents columns.

    Mirrors the page structures the reference parses: category links under
    ``div#mw-normal-catlinks > ul > li > a`` (categorizer.py:92-99) and the
    last-modified footer ``li#footer-info-lastmod`` (categorizer.py:110-116).
    """
    months = F.array(*[F.lit(m) for m in MONTHS])
    day = (F.lit(1) + doc_id % 28).cast("int").cast("string")
    month = F.element_at(months, (doc_id % 12).cast("int") + 1)
    year = (F.lit(2020) + doc_id % 5).cast("int").cast("string")
    return F.concat(
        F.lit("<html><head><title>Doc "),
        doc_id.cast("string"),
        F.lit("</title>"),
        F.lit("<script>var x = 1;</script><style>.cat { color: red; }</style></head>"),
        F.lit('<body><div id="mw-normal-catlinks"><ul>'),
        F.lit("<li><a>Lang_"),
        lang,
        F.lit("</a></li>"),
        F.lit("<li><a>Source_"),
        source,
        F.lit("</a></li>"),
        F.lit("<li><a>Size_"),
        F.floor(n_chars / 100).cast("string"),
        F.lit("</a></li>"),
        F.lit("</ul></div><p>"),
        text,
        F.lit("</p>"),
        F.lit('<li id="footer-info-lastmod"> This page was last edited on '),
        day,
        F.lit(" "),
        month,
        F.lit(" "),
        year,
        F.lit(", at 10:00 (UTC).</li></body></html>"),
    )


# ------------------------------------------------------- expression path

# Attribute-tolerant (r5): real Wikipedia writes
# `<div id="mw-normal-catlinks" class="mw-normal-catlinks">` and anchors
# carry href/title — match by id/tag like soup.find, not by exact byte shape.
_CATLINKS_RE = r'<div\b[^>]*\bid="mw-normal-catlinks"[^>]*>.*?</div>'
_ANCHOR_RE = r"<a\b[^>]*>([^<]*)</a>"
_LASTMOD_RE = r"last edited on (\d{1,2} [A-Za-z]+ \d{4})"


def extract_categories_expr(html: Column) -> Column:
    """Category names from the catlinks div, as array<string>; [] when the
    div is absent. Parity: categorizer.py:89-101 (BS4 find + collect <a>
    texts, [] fallback at :95-96)."""
    div = F.regexp_extract(html, f"(?s)({_CATLINKS_RE})", 1)
    # trim mirrors a.get_text(strip=True) (categorizer.py:98); the lambda
    # MUST be unary — transform feeds (element, index) to a binary callable
    # and F.trim's second parameter is the trim-character set
    return F.transform(
        F.regexp_extract_all(div, F.lit(_ANCHOR_RE), 1), lambda c: F.trim(c)
    )


def extract_last_edited_expr(html: Column) -> Column:
    """Last-edited date from the footer, null when absent/unparseable.
    Parity: categorizer.py:103-122 (strip prefix/'(UTC)', strptime
    '%d %B %Y', None on failure → Spark try-semantics return null)."""
    raw = F.regexp_extract(html, _LASTMOD_RE, 1)
    return F.to_date(F.when(raw != "", raw), "d MMMM yyyy")


def extract_text_expr(html: Column) -> Column:
    """Visible text: drop script/style/head blocks, strip tags, collapse
    whitespace. Parity: converter.py:35-44 (BS4 decompose of
    script/style/meta/head/title/noscript + get_text(separator=' ',
    strip=True))."""
    no_head = F.regexp_replace(html, r"(?s)<head>.*?</head>", " ")
    no_script = F.regexp_replace(no_head, r"(?s)<script[^>]*>.*?</script>", " ")
    no_style = F.regexp_replace(no_script, r"(?s)<style[^>]*>.*?</style>", " ")
    no_tags = F.regexp_replace(no_style, r"<[^>]+>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


# SQL twins of the expression path (DuckDB dialect; 's' = dotall, 'g' = all).
EXTRACT_CATEGORIES_SQL = (
    "list_transform("
    f"regexp_extract_all(regexp_extract(html, '(?s)({_CATLINKS_RE})', 1), '{_ANCHOR_RE}', 1), "
    "c -> trim(c))"
)
EXTRACT_LAST_EDITED_SQL = (
    f"CAST(strptime(nullif(regexp_extract(html, '{_LASTMOD_RE}', 1), ''), '%-d %B %Y') AS DATE)"
)
def _clean_extract_text_sql() -> str:
    inner = (
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace(html, "
        "'(?s)<head>.*?</head>', ' ', 'g'), "
        "'(?s)<script[^>]*>.*?</script>', ' ', 'g'), "
        "'(?s)<style[^>]*>.*?</style>', ' ', 'g'), "
        "'<[^>]+>', ' ', 'g')"
    )
    return f"trim(regexp_replace({inner}, '\\s+', ' ', 'g'))"


EXTRACT_TEXT_SQL = _clean_extract_text_sql()


def extract_links_expr(html: Column, base_url: Column) -> Column:
    """All <a href> targets, absolutized against the page URL, deduped.

    Parity: find_html_links (WikipediaCrawler/fetcher/app/main.py:116-123) —
    BS4 href walk + urljoin + set-dedup, as native expressions: href
    extraction via regexp_extract_all, urljoin approximated for the two
    forms the crawler meets (absolute http(s) URLs and root-relative paths).
    """
    hrefs = F.regexp_extract_all(html, F.lit(r'href="([^"]+)"'), 1)
    base_root = F.regexp_extract(base_url, r"^([a-zA-Z]+://[^/]+)", 1)
    resolved = F.transform(
        hrefs,
        lambda h: F.when(h.rlike("^[a-zA-Z]+://"), h).otherwise(F.concat(base_root, h)),
    )
    return F.array_distinct(resolved)


# ------------------------------------------------------------- UDF path


class _WikiHTMLParser(HTMLParser):
    """Structural parse collecting the three extractions in one pass.

    BS4-parity notes (categorizer.py:89-101 runs
    ``BeautifulSoup(html, "html.parser")`` — the same stdlib tokenizer
    driving this class, so divergence can only come from tree recovery):
    - the catlinks scope tracks ``<div>`` DEPTH, so a nested div inside
      ``#mw-normal-catlinks`` no longer ends the scope at its inner close
      (bs4 subtree semantics);
    - categories come from the FIRST ``<ul>`` in that scope only —
      ``cat_links_div.find("ul")`` — not from every anchor in the div;
    - each anchor's text fragments are buffered and joined like
      ``a.get_text(strip=True)``, so ``<a>Cat<b>1</b></a>`` is one
      category "Cat1", not two fragments;
    - an anchor left unclosed is flushed at the next ``<a>`` start or the
      ul's end — see the module docstring for why this deliberately does
      not reproduce bs4's double-counting nest shape.
    """

    _SKIP = {"script", "style", "meta", "head", "title", "noscript"}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.texts: list[str] = []
        self.categories: list[str] = []
        self.lastmod: str | None = None
        self._skip_depth = 0
        self._catlinks_depth = 0  # div-nesting depth inside the catlinks div
        self._cat_ul = 0  # 0: ul not seen, 1: inside first ul, 2: done
        self._cat_ul_depth = 0  # ul-nesting depth inside that first ul
        self._cat_buf: list[str] | None = None  # current anchor's fragments
        self._in_lastmod = False

    def _flush_anchor(self) -> None:
        if self._cat_buf is not None:
            # get_text(strip=True): strip each fragment, join with ''
            self.categories.append("".join(s.strip() for s in self._cat_buf))
            self._cat_buf = None

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        a = dict(attrs)
        if tag in self._SKIP:
            self._skip_depth += 1
        if tag == "div":
            if self._catlinks_depth > 0:
                self._catlinks_depth += 1
            elif a.get("id") == "mw-normal-catlinks":
                self._catlinks_depth = 1
        if self._catlinks_depth > 0 and tag == "ul" and self._cat_ul == 0:
            self._cat_ul = 1
            self._cat_ul_depth = 1
        elif self._cat_ul == 1 and tag == "ul":
            # bs4's ul.find_all("a") is recursive: a nested inner </ul> must
            # not end the scope, only the opening ul's own end tag does
            self._cat_ul_depth += 1
        if self._cat_ul == 1 and tag == "a":
            self._flush_anchor()
            self._cat_buf = []
        if tag == "li" and a.get("id") == "footer-info-lastmod":
            self._in_lastmod = True

    def handle_endtag(self, tag: str) -> None:
        if tag in self._SKIP and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag == "div" and self._catlinks_depth > 0:
            self._catlinks_depth -= 1
            if self._catlinks_depth == 0 and self._cat_ul == 1:
                self._flush_anchor()
                self._cat_ul = 2
        if tag == "ul" and self._cat_ul == 1:
            self._cat_ul_depth -= 1
            if self._cat_ul_depth == 0:
                self._flush_anchor()
                self._cat_ul = 2
        if tag == "a":
            self._flush_anchor()
        if tag == "li" and self._in_lastmod:
            self._in_lastmod = False

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data.strip():
            self.texts.append(data.strip())
        if self._cat_buf is not None:
            self._cat_buf.append(data)
        if self._in_lastmod:
            self.lastmod = (self.lastmod or "") + data


def _parse_page(html: str | None) -> tuple[list[str], str | None, str]:
    if not html:
        return [], None, ""
    p = _WikiHTMLParser()
    p.feed(html)
    p._flush_anchor()  # an anchor left open at EOF still yields its text
    lastmod_date = None
    if p.lastmod:
        import re

        m = re.search(r"last edited on (\d{1,2} [A-Za-z]+ \d{4})", p.lastmod)
        if m:
            lastmod_date = m.group(1)
    return p.categories, lastmod_date, " ".join(p.texts)


PAGE_SCHEMA = T.StructType(
    [
        T.StructField("categories", T.ArrayType(T.StringType())),
        T.StructField("last_edited_raw", T.StringType()),
        T.StructField("extracted_text", T.StringType()),
    ]
)


@F.pandas_udf(PAGE_SCHEMA)
def parse_page_udf(html: pd.Series) -> pd.DataFrame:
    """Arrow-batched structural HTML parse → (categories, last_edited_raw,
    extracted_text). One pass replaces the reference's three separate BS4
    UDFs (categorizer.py:126-128, converter.py:49) — one Python round-trip
    instead of three."""
    rows = [_parse_page(h) for h in html]
    return pd.DataFrame(
        {
            "categories": [r[0] for r in rows],
            "last_edited_raw": [r[1] for r in rows],
            "extracted_text": [r[2] for r in rows],
        }
    )
