"""Tests for HTML stripping / text normalization (functions/text.py), URL
parsing (functions/urls.py), and the cleanup relational operators
(operators/cleanup.py): paragraph dedup, per-domain caps, blocklists."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.functions.text import (
    normalize_text_expr,
    normalize_ws_expr,
    strip_control_chars_expr,
    strip_html_expr,
)
from pylluminator_spark.functions.urls import (
    normalize_url_expr,
    registered_domain_expr,
    url_domain_expr,
    url_host_expr,
    url_path_expr,
    url_port_expr,
    url_query_expr,
    url_scheme_expr,
)
from pylluminator_spark.operators.cleanup import (
    blocklist_filter,
    cap_per_domain,
    dedup_paragraphs,
    split_paragraphs,
)


def _one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0]["v"]


# --------------------------------------------------------------------------
# HTML stripping / normalization
# --------------------------------------------------------------------------

class TestStripHtml:
    def test_tags_become_spaces(self, spark):
        got = _one(spark, strip_html_expr(F.lit("<p>hello</p><p>world</p>")))
        assert got == "hello world"

    def test_script_and_style_blocks_dropped_entirely(self, spark):
        html = (
            "<html><head><style>.x{color:red}</style>"
            "<script type='text/javascript'>var a=1;\nalert(a)</script>"
            "</head><body>keep me</body></html>"
        )
        assert _one(spark, strip_html_expr(F.lit(html))) == "keep me"

    def test_script_case_insensitive_multiline(self, spark):
        html = "a<SCRIPT>\nmulti\nline\n</SCRIPT>b"
        assert _one(spark, strip_html_expr(F.lit(html))) == "a b"

    def test_comments_dropped(self, spark):
        assert _one(spark, strip_html_expr(F.lit("x<!-- hidden\ntext -->y"))) == "x y"

    def test_entities_decoded(self, spark):
        got = _one(
            spark,
            strip_html_expr(F.lit("a&nbsp;&lt;b&gt;&amp;&quot;c&quot;&#39;d&#39;")),
        )
        assert got == 'a <b>&"c"\'d\''

    def test_double_escaped_entity_stays_literal(self, spark):
        # '&amp;lt;' is the LITERAL text '&lt;' — must not decode twice to '<'
        assert _one(spark, strip_html_expr(F.lit("&amp;lt;"))) == "&lt;"

    def test_attributes_and_selfclosing(self, spark):
        html = '<a href="http://x.com" class="b">link</a><br/>next'
        assert _one(spark, strip_html_expr(F.lit(html))) == "link next"

    def test_plain_text_unchanged(self, spark):
        assert _one(spark, strip_html_expr(F.lit("no markup  here"))) == "no markup here"


class TestNormalizeText:
    def test_whitespace_collapse_and_trim(self, spark):
        assert _one(spark, normalize_ws_expr(F.lit("  a\t b\n\nc "))) == "a b c"

    def test_control_chars_removed(self, spark):
        assert _one(spark, strip_control_chars_expr(F.lit("a\x00b\x1fc\x7fd"))) == "abcd"

    def test_tab_newline_survive_control_strip(self, spark):
        assert _one(spark, strip_control_chars_expr(F.lit("a\tb\nc"))) == "a\tb\nc"

    def test_punctuation_folded(self, spark):
        s = "‘q’ “w” – — e…"
        assert _one(spark, normalize_text_expr(F.lit(s))) == "'q' \"w\" - - e..."

    def test_nbsp_folds_to_space(self, spark):
        assert _one(spark, normalize_text_expr(F.lit("a b"))) == "a b"

    def test_lowercase_option(self, spark):
        assert _one(spark, normalize_text_expr(F.lit("AbC"), lowercase=True)) == "abc"


# --------------------------------------------------------------------------
# URL parsing / normalization
# --------------------------------------------------------------------------

class TestUrlParts:
    URL = "HTTPS://User:pw@Sub.Example.CO.UK:8443/A/b%20c/?q=1&utm_source=x#frag"

    def test_scheme(self, spark):
        assert _one(spark, url_scheme_expr(F.lit(self.URL))) == "https"

    def test_host_lowercased_no_userinfo_no_port(self, spark):
        assert _one(spark, url_host_expr(F.lit(self.URL))) == "sub.example.co.uk"

    def test_port(self, spark):
        assert _one(spark, url_port_expr(F.lit("http://h:8080/x"))) == 8080
        assert _one(spark, url_port_expr(F.lit("http://h/x"))) is None

    def test_path_defaults_to_root(self, spark):
        assert _one(spark, url_path_expr(F.lit(self.URL))) == "/A/b%20c/"
        assert _one(spark, url_path_expr(F.lit("http://h"))) == "/"
        assert _one(spark, url_path_expr(F.lit("http://h?q=1"))) == "/"

    def test_query(self, spark):
        assert _one(spark, url_query_expr(F.lit(self.URL))) == "q=1&utm_source=x"

    def test_registered_domain_simple(self, spark):
        assert _one(spark, registered_domain_expr(F.lit("a.b.example.com"))) == "example.com"
        assert _one(spark, registered_domain_expr(F.lit("example.com"))) == "example.com"

    def test_registered_domain_multilabel_suffix(self, spark):
        assert (
            _one(spark, registered_domain_expr(F.lit("news.bbc.co.uk"))) == "bbc.co.uk"
        )
        # bare suffix host stays itself (n < 3 guard)
        assert _one(spark, registered_domain_expr(F.lit("co.uk"))) == "co.uk"

    def test_url_domain(self, spark):
        assert _one(spark, url_domain_expr(F.lit(self.URL))) == "example.co.uk"


class TestNormalizeUrl:
    @pytest.mark.parametrize(
        "raw,want",
        [
            # host lowercased, scheme lowercased, fragment dropped
            ("HTTP://Example.COM/Path#frag", "http://example.com/Path"),
            # tracking params stripped, real params kept
            (
                "https://e.com/p?utm_source=tw&q=1&utm_medium=x",
                "https://e.com/p?q=1",
            ),
            # MID-query tracking param: the '&&' left behind must collapse
            # to '&', never become a second '?' (ADVICE r4 regression)
            (
                "http://ex.com/p?b=2&utm_a=1&c=3",
                "http://ex.com/p?b=2&c=3",
            ),
            (
                "http://ex.com/p?b=2&utm_a=1&gclid=x&c=3",
                "http://ex.com/p?b=2&c=3",
            ),
            # all params tracking -> no dangling '?'
            ("https://e.com/p?utm_source=a&gclid=b", "https://e.com/p"),
            # default ports dropped, explicit non-default kept
            ("https://e.com:443/x", "https://e.com/x"),
            ("http://e.com:80/x", "http://e.com/x"),
            ("http://e.com:8080/x", "http://e.com:8080/x"),
            # trailing slash trimmed on non-root path, root kept
            ("http://e.com/a/b/", "http://e.com/a/b"),
            ("http://e.com/", "http://e.com/"),
            # path case preserved
            ("http://E.com/CaseSensitive", "http://e.com/CaseSensitive"),
        ],
    )
    def test_cases(self, spark, raw, want):
        assert _one(spark, normalize_url_expr(F.lit(raw))) == want


# --------------------------------------------------------------------------
# Paragraph dedup
# --------------------------------------------------------------------------

PARA_DOCS = [
    (1, "intro one\n\nSHARED BOILERPLATE\n\nbody one"),
    (2, "SHARED BOILERPLATE\n\nbody two"),
    (3, "body three\n\n\n\nSHARED BOILERPLATE"),
    (4, "   \n\n  "),            # whitespace-only -> empty doc
    (5, "unique only"),
]


class TestDedupParagraphs:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(PARA_DOCS, ["doc_id", "text"])

    def test_split_preserves_positions_and_drops_blanks(self, spark, docs):
        rows = (
            split_paragraphs(docs)
            .filter(F.col("doc_id") == 3)
            .orderBy("para_idx")
            .collect()
        )
        assert [(r["para_idx"], r["para"]) for r in rows] == [
            (0, "body three"),
            (1, "SHARED BOILERPLATE"),
        ]

    def test_first_occurrence_kept_rest_dropped(self, spark, docs):
        out = {r["doc_id"]: r for r in dedup_paragraphs(docs).collect()}
        assert out[1]["clean_text"] == "intro one\n\nSHARED BOILERPLATE\n\nbody one"
        assert out[1]["n_paras_dropped"] == 0
        assert out[2]["clean_text"] == "body two"
        assert out[2]["n_paras_dropped"] == 1
        assert out[3]["clean_text"] == "body three"
        assert out[3]["n_paras_dropped"] == 1

    def test_empty_doc_survives(self, spark, docs):
        out = {r["doc_id"]: r for r in dedup_paragraphs(docs).collect()}
        assert out[4]["clean_text"] == ""
        assert out[4]["n_paras_kept"] == 0
        assert out[4]["n_paras_dropped"] == 0

    def test_min_chars_exempts_short_paragraphs(self, spark):
        docs = spark.createDataFrame(
            [(1, "Intro\n\nlong paragraph body"), (2, "Intro\n\nlong paragraph body")],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in dedup_paragraphs(docs, min_chars=10).collect()}
        # 'Intro' (5 chars) exempt -> kept in both; long body deduped
        assert out[1]["clean_text"] == "Intro\n\nlong paragraph body"
        assert out[2]["clean_text"] == "Intro"
        assert out[2]["n_paras_dropped"] == 1

    def test_counts_sum(self, spark, docs):
        out = dedup_paragraphs(docs)
        total = out.agg(
            F.sum("n_paras_kept").alias("k"), F.sum("n_paras_dropped").alias("d")
        ).collect()[0]
        n_paras = split_paragraphs(docs).count()
        assert total["k"] + total["d"] == n_paras


# --------------------------------------------------------------------------
# Domain cap / blocklist
# --------------------------------------------------------------------------

class TestDomainOps:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [(i, f"d{i % 3}.com") for i in range(30)]
        return spark.createDataFrame(rows, ["doc_id", "domain"])

    def test_cap_per_domain_counts(self, corpus):
        out = cap_per_domain(corpus, cap=4)
        counts = {
            r["domain"]: r["n"]
            for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()
        }
        assert counts == {"d0.com": 4, "d1.com": 4, "d2.com": 4}

    def test_cap_deterministic(self, corpus):
        a = sorted(r["doc_id"] for r in cap_per_domain(corpus, cap=4).collect())
        b = sorted(r["doc_id"] for r in cap_per_domain(corpus, cap=4).collect())
        assert a == b

    def test_cap_explicit_order(self, corpus):
        out = cap_per_domain(corpus, cap=1, order_by=[F.col("doc_id").desc()])
        assert sorted(r["doc_id"] for r in out.collect()) == [27, 28, 29]

    def test_blocklist_list(self, corpus):
        out = blocklist_filter(corpus, ["d1.com"])
        assert out.count() == 20
        assert out.filter(F.col("domain") == "d1.com").count() == 0

    def test_blocklist_dataframe_broadcast(self, spark, corpus):
        bl = spark.createDataFrame([("d0.com",), ("d2.com",)], ["bad"])
        out = blocklist_filter(corpus, bl)
        assert sorted(r["domain"] for r in out.collect()) == ["d1.com"] * 10
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
