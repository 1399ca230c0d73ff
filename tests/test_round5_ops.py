"""Round-5 operators: linear classifier (known-value weights/margins),
unicode normalization (vs a python reference), integer PageRank (vs an
exact python replica, dangling mass, conservation), cluster-aware
splits (no straddling), sequence examples, join fanout pre-flight,
winsorization (known clamps + ANSI safety)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.classify import (
    score_documents,
    train_token_weights,
)
from db_cdc_poc_spark.operators.graph import derive_scale, pagerank
from db_cdc_poc_spark.operators.joins import join_fanout_estimate
from db_cdc_poc_spark.operators.sampling import (
    cluster_aware_split,
    split_assign,
)
from db_cdc_poc_spark.operators.sessionize import next_event_examples
from db_cdc_poc_spark.operators.stats import winsorize
from db_cdc_poc_spark.operators.text import normalize_docs, normalize_text


# ---------------------------------------------------------------------------
# classify
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_train_token_weights_known_values(spark):
    # 2 positive docs, 2 negative docs
    df = _docs(
        spark,
        [
            (1, "good good clean", "en"),
            (2, "good prose", "en"),
            (3, "spam junk", "xx"),
            (4, "spam good", "xx"),
        ],
    )
    w = {
        r.token: r
        for r in train_token_weights(
            df, F.col("lang") == "en", min_doc_freq=1
        ).collect()
    }
    # 'good': df_pos=2/2, df_neg=1/2 -> 1_000_000 - 500_000
    assert (w["good"].df_pos, w["good"].df_neg) == (2, 1)
    assert w["good"].weight_ppm == 500_000
    # 'spam': 0/2 pos, 2/2 neg -> -1_000_000
    assert w["spam"].weight_ppm == -1_000_000
    # duplicate token inside one doc counts once (distinct per doc)
    assert w["good"].df_pos == 2


def test_score_documents_margins_and_oov(spark):
    train = _docs(
        spark,
        [(1, "good", "en"), (2, "spam", "xx")],
    )
    w = train_token_weights(train, F.col("lang") == "en", min_doc_freq=1)
    score = _docs(
        spark,
        [
            (10, "good", "en"),          # +1e6
            (11, "spam spam", "xx"),     # -1e6 (distinct)
            (12, "unseen tokens", "xx"), # all OOV -> 0 hits, margin 0
            (13, "good spam", "xx"),     # cancels to 0 -> pred False
        ],
    )
    got = {r.doc_id: r for r in score_documents(score, w).collect()}
    assert (got[10].margin_ppm, got[10].pred) == (1_000_000, True)
    assert (got[11].margin_ppm, got[11].pred) == (-1_000_000, False)
    assert (got[12].n_hits, got[12].margin_ppm, got[12].pred) == (0, 0, False)
    assert (got[13].margin_ppm, got[13].pred) == (0, False)


def test_score_documents_bias_shifts_margin(spark):
    train = _docs(spark, [(1, "good", "en"), (2, "bad", "xx")])
    w = train_token_weights(train, F.col("lang") == "en", min_doc_freq=1)
    got = score_documents(
        _docs(spark, [(5, "zzz", "xx")]), w, bias_ppm=7
    ).collect()[0]
    assert (got.margin_ppm, got.pred) == (7, True)


# ---------------------------------------------------------------------------
# normalize_text
# ---------------------------------------------------------------------------


def _py_normalize(s: str, lowercase: bool = False) -> str:
    fold = str.maketrans("“”‘’–—− 　", "\"\"''---  ")
    s = s.translate(fold)
    s = re.sub("[​‌‍﻿\x00-\x08\x0e-\x1f\x7f]", "", s)
    s = re.sub("[ \t\r\n\f\x0b]+", " ", s).strip()
    return s.lower() if lowercase else s


@pytest.mark.parametrize(
    "raw",
    [
        "plain text stays put",
        "curly “quotes” and ‘more’ here",
        "dashes – — − all fold",
        "nbsp and　ideographic",
        "zero​width‌‍junk﻿",
        "ctrl\x01chars\x07and\x7fdel",
        "  runs \t of\n\nwhitespace\r\n  ",
        "",
        "​ \t",  # normalizes to empty
    ],
)
def test_normalize_text_matches_python_reference(spark, raw):
    df = spark.createDataFrame([(1, raw)], "doc_id long, text string")
    got = df.select(normalize_text("text").alias("n")).collect()[0].n
    assert got == _py_normalize(raw)


def test_normalize_docs_fingerprint_and_changed(spark):
    import hashlib

    df = spark.createDataFrame(
        [(1, "a  b"), (2, "a b")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in normalize_docs(df).collect()}
    assert got[1].changed is True and got[2].changed is False
    assert got[1].norm_text == "a b" == got[2].norm_text
    assert (
        got[1].norm_fingerprint
        == hashlib.md5(b"a b").hexdigest()
        == got[2].norm_fingerprint
    )
    assert got[1].n_chars_norm == 3


def test_normalize_text_lowercase_flag(spark):
    df = spark.createDataFrame([(1, "MiXeD Case")], "doc_id long, text string")
    got = df.select(normalize_text("text", lowercase=True).alias("n")).collect()
    assert got[0].n == "mixed case"


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------


def _py_pagerank(edges, iterations, damping_ppm, scale=None):
    """Exact python replica of the integer contract."""
    es = sorted(set(edges))
    nodes = sorted({s for s, _ in es} | {d for _, d in es})
    n = len(nodes)
    if scale is None:
        scale = derive_scale(n)
    outdeg: dict = {}
    for s, _ in es:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (scale * (1_000_000 - damping_ppm)) // 1_000_000
    r = {v: scale for v in nodes}
    for _ in range(iterations):
        nxt = {v: base for v in nodes}
        d_tot = sum(r[v] for v in nodes if v not in outdeg)
        ds = ((d_tot * damping_ppm) // 1_000_000) // n
        for v in nodes:
            nxt[v] += ds
        for s, d in es:
            nxt[d] += ((r[s] * damping_ppm) // 1_000_000) // outdeg[s]
        r = nxt
    return r


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_matches_python_replica(spark):
    # asymmetric graph with a dangling node (4) and a hub (1)
    edges = [(1, 2), (1, 3), (2, 1), (3, 1), (3, 4), (5, 1), (5, 4)]
    got = {
        r.node: r.rank
        for r in pagerank(_edges_df(spark, edges), iterations=4).collect()
    }
    assert got == _py_pagerank(edges, 4, 850_000)


def test_pagerank_cycle_is_uniform_and_mass_conserved(spark):
    # 3-cycle: perfectly symmetric -> all ranks equal, and mass decays
    # only by floor losses (< 2 units per node per iteration: one per
    # integral division in base + contribution)
    edges = [(1, 2), (2, 3), (3, 1)]
    iters, scale = 3, derive_scale(3)
    got = pagerank(_edges_df(spark, edges), iterations=iters).collect()
    ranks = {r.rank for r in got}
    assert len(ranks) == 1
    rank = ranks.pop()
    assert scale - 2 * iters <= rank <= scale


def test_pagerank_dangling_mass_redistributes(spark):
    # star into a sink: without dangling handling the sink's mass
    # would leave the system; with it, total mass stays within floor
    # losses of N*scale
    edges = [(1, 4), (2, 4), (3, 4)]
    got = pagerank(_edges_df(spark, edges), iterations=5).collect()
    n, scale = 4, derive_scale(4)
    total = sum(r.rank for r in got)
    assert total <= n * scale
    # floor losses are < 1 unit per division; generous lower bound
    assert total > n * scale - 5 * (n + len(edges) + 2)
    ranks = {r.node: r.rank for r in got}
    assert ranks[4] > ranks[1] == ranks[2] == ranks[3]


def test_pagerank_rejects_unsafe_scale(spark):
    with pytest.raises(ValueError, match="overflow"):
        pagerank(_edges_df(spark, [(1, 2)]), iterations=1, scale=1 << 62)


# ---------------------------------------------------------------------------
# cluster_aware_split
# ---------------------------------------------------------------------------


def test_cluster_aware_split_never_straddles(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 101)], "doc_id long, text string"
    )
    # three clusters: {1,2,3}, {10,11}, {50,60} via explicit pairs
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (50, 60)], "id_a long, id_b long"
    )
    out = cluster_aware_split(
        docs, pairs, "doc_id", {"train": 0.5, "val": 0.25, "test": 0.25},
        salt="s",
    )
    rows = {r.doc_id: r.split for r in out.collect()}
    assert len(rows) == 100
    assert rows[1] == rows[2] == rows[3]
    assert rows[10] == rows[11]
    assert rows[50] == rows[60]


def test_cluster_aware_split_singletons_match_plain_split(spark):
    # with no pairs at all, the assignment law degenerates to
    # split_assign on the id itself
    docs = spark.createDataFrame(
        [(i, "t") for i in range(200)], "doc_id long, text string"
    )
    empty = spark.createDataFrame([], "id_a long, id_b long")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {
        r.doc_id: r.split
        for r in cluster_aware_split(docs, empty, "doc_id", w, salt="x").collect()
    }
    want = {
        r.doc_id: r.split
        for r in split_assign(docs, "doc_id", w, salt="x").collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# next_event_examples
# ---------------------------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_next_event_examples_known_sequence(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, tok)
        for i, tok in enumerate(["a", "b", "c", "d", "e"])
    ]
    got = sorted(
        next_event_examples(_events(spark, rows), context=3).collect(),
        key=lambda r: r.event_id,
    )
    # first 3 events have no full context
    assert [(r.context_text, r.target) for r in got] == [
        ("a b c", "d"),
        ("b c d", "e"),
    ]
    assert got[0].user_id == 1 and got[0].event_id == 3


def test_next_event_examples_per_user_isolation(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u in (1, 2):
        rows += [
            (u * 10 + i, t0 + dt.timedelta(minutes=i), u, f"u{u}t{i}")
            for i in range(4)
        ]
    got = next_event_examples(_events(spark, rows), context=3).collect()
    # one full-context example per user, never mixing users' tokens
    assert len(got) == 2
    for r in got:
        assert all(tok.startswith(f"u{r.user_id}") for tok in r.context_text.split())


def test_next_event_examples_rejects_bad_context(spark):
    with pytest.raises(ValueError, match="context"):
        next_event_examples(_events(spark, []), context=0)


# ---------------------------------------------------------------------------
# join_fanout_estimate
# ---------------------------------------------------------------------------


def test_join_fanout_estimate_exact(spark):
    left = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2 + [("c",)] * 1, "k string"
    )
    right = spark.createDataFrame([("a",)] * 4 + [("b",)] * 5, "k string")
    got = join_fanout_estimate(left, right, ["k"], top_k=1).collect()[0]
    # a: 3*4=12, b: 2*5=10; c unmatched
    assert got.n_matched_keys == 2
    assert got.total_out_rows == 22
    assert got.max_key_out_rows == 12
    assert got.max_key_share_ppm == 1_000_000 * 12 // 22
    assert got.top1_share_ppm == 1_000_000 * 12 // 22
    # cross-check against the actual join
    assert left.join(right, "k").count() == got.total_out_rows


# ---------------------------------------------------------------------------
# winsorize
# ---------------------------------------------------------------------------


def test_winsorize_known_clamps(spark):
    rows = [("g", v) for v in [0, 10, 20, 30, 40, 50, 60, 70, 80, 1000]]
    df = spark.createDataFrame(rows, "g string, v long")
    out = winsorize(df, ["g"], F.col("v"), p_lo=0.1, p_hi=0.9).collect()
    # exact percentiles over 10 points: index p*(n-1) -> p10 lands at
    # 0.9 between 0 and 10 (= 9.0), p90 at 8.1 between 80 and 1000
    # (= 80 + 0.1 * 920 = 172.0)
    lo = sorted(r.v_wins for r in out)[0]
    hi = sorted(r.v_wins for r in out)[-1]
    assert lo == pytest.approx(9.0)
    assert hi == pytest.approx(172.0)
    capped = {r.v: r["capped"] for r in out}
    assert capped[0] is True and capped[1000] is True
    assert capped[40] is False
    assert len(out) == len(rows)  # cap, don't drop


def test_winsorize_single_row_group_is_identity(spark):
    df = spark.createDataFrame([("solo", 42)], "g string, v long")
    got = winsorize(df, ["g"], F.col("v")).collect()[0]
    assert got.v_wins == 42.0
    assert got["capped"] is False


def test_winsorize_rejects_bad_bounds(spark):
    df = spark.createDataFrame([("g", 1)], "g string, v long")
    with pytest.raises(ValueError, match="p_lo"):
        winsorize(df, ["g"], F.col("v"), p_lo=0.9, p_hi=0.1)


# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------


def _bm25_py(docs, terms, k1=1.2, b=0.75):
    import math

    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {
        t: sum(1 for v in toks.values() if t in v) for t in terms
    }
    out = {}
    for i, v in toks.items():
        e5 = 0
        matched = 0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or dfreq[t] == 0:
                continue
            matched += 1
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            part = (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            e5 += round(idf * part * 100000)
        if matched:
            out[i] = (matched, e5 / 100000)
    return out


def test_bm25_matches_python_reference(spark):
    from db_cdc_poc_spark.operators.text import bm25_topk

    rows = [
        (1, "spark shuffles data fast"),
        (2, "spark spark spark everywhere spark"),
        (3, "nothing relevant here at all whatsoever in this one"),
        (4, "data moves through the engine"),
        (5, "fast data fast spark"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["n_terms_matched"], r["score"])
        for r in bm25_topk(df, ["spark", "data"], top_k=10).collect()
    }
    want = _bm25_py(rows, ["spark", "data"])
    assert got == want


def test_bm25_rare_term_outscores_common(spark):
    from db_cdc_poc_spark.operators.text import bm25_topk

    # 'rare' in 1 of 10 docs, 'common' in all 10: the rare-term doc
    # must rank first for the query [rare, common]
    rows = [(i, "common filler words " + ("rare" if i == 7 else "x"))
            for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = bm25_topk(df, ["rare", "common"], top_k=3).collect()
    assert top[0]["id"] == 7


def test_bm25_topk_plan_has_no_global_sort(spark):
    from db_cdc_poc_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [(i, "a b c spark") for i in range(50)], "doc_id long, text string"
    )
    plan = bm25_topk(df, ["spark"], top_k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# LSH recall report
# ---------------------------------------------------------------------------


def test_lsh_recall_bounds_and_hits(spark):
    from db_cdc_poc_spark.operators.dedup import minhash_recall_report

    # 30 unique docs + 3 planted exact-duplicate pairs: identical docs
    # share every band, so recall over exact pairs that ARE identical
    # must be 100%; unique filler docs add candidate noise at most.
    base = [
        (i, f"unique doc number {i} with filler words w{i} x{i} y{i} z{i}")
        for i in range(30)
    ]
    dups = [(100 + j, "this exact duplicate text repeats verbatim every time")
            for j in range(3)]
    df = spark.createDataFrame(base + dups, "doc_id long, text string")
    row = minhash_recall_report(df, threshold=0.9).collect()[0]
    # the 3 identical docs form C(3,2)=3 exact pairs, all candidates
    assert row["n_exact"] == 3
    assert row["n_hits"] == 3
    assert row["recall_ppm"] == 1_000_000
    assert row["n_candidates"] >= 3
    assert 0 <= row["precision_ppm"] <= 1_000_000


def test_lsh_recall_empty_exact_set_is_null_not_error(spark):
    from db_cdc_poc_spark.operators.dedup import minhash_recall_report

    df = spark.createDataFrame(
        [(i, f"all different {i} tokens here p{i} q{i} r{i}") for i in range(8)],
        "doc_id long, text string",
    )
    row = minhash_recall_report(df, threshold=0.99).collect()[0]
    assert row["n_exact"] == 0
    assert row["recall_ppm"] is None


# ---------------------------------------------------------------------------
# script profile
# ---------------------------------------------------------------------------


def test_script_profile_counts_and_dominant(spark):
    from db_cdc_poc_spark.operators.text import script_profile

    df = spark.createDataFrame(
        [
            (1, "hello мир 123"),       # 5 latin, 3 cyrillic, 3 digit, 2 space
            (2, "日本語テキスト"),        # 7 cjk (3 kanji + 4 katakana)
            (3, ""),                    # empty -> NULL dominant, NULL ppm
            (4, "αβγ abc"),             # tie 3 greek / 3 latin -> later wins
        ],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in script_profile(df).collect()}
    assert rows[1]["n_latin"] == 5 and rows[1]["n_cyrillic"] == 3
    assert rows[1]["n_digit"] == 3 and rows[1]["n_other"] == 2
    assert rows[1]["dominant_script"] == "latin"
    assert rows[2]["n_cjk"] == 7 and rows[2]["dominant_script"] == "cjk"
    assert rows[3]["n_chars"] == 0
    assert rows[3]["dominant_script"] is None
    assert rows[3]["ppm_latin"] is None
    # documented tie rule: later list entry wins (greek index 2 > latin 0)
    assert rows[4]["dominant_script"] == "greek"
    assert rows[1]["ppm_latin"] == 5 * 1000000 // 13


# ---------------------------------------------------------------------------
# last-touch attribution
# ---------------------------------------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


def test_attribution_latest_touch_wins_and_window_expires(spark):
    import datetime as dt

    from db_cdc_poc_spark.operators.sessionize import last_touch_attribution

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: click, view, purchase -> attributed to the view (latest)
        (1, 1, "click", t0),
        (2, 1, "view", t0 + dt.timedelta(hours=1)),
        (3, 1, "purchase", t0 + dt.timedelta(hours=2)),
        # user 2: click 8 days before purchase -> outside 7d window
        (4, 2, "click", t0),
        (5, 2, "purchase", t0 + dt.timedelta(days=8)),
        # user 3: purchase with no touches at all
        (6, 3, "purchase", t0),
        # user 1 second purchase still attributes to the same view
        (7, 1, "purchase", t0 + dt.timedelta(hours=3)),
    ]
    out = {
        r["event_id"]: r
        for r in last_touch_attribution(
            _ev(spark, rows), "purchase", ("click", "view")
        ).collect()
    }
    assert len(out) == 4
    assert out[3]["touch_event_id"] == 2 and out[3]["touch_type"] == "view"
    assert out[3]["age_us"] == 3600 * 1_000_000
    assert out[5]["touch_event_id"] is None and out[5]["age_us"] is None
    assert out[6]["touch_event_id"] is None
    assert out[7]["touch_event_id"] == 2


def test_attribution_same_timestamp_tiebreak_by_id(spark):
    import datetime as dt

    from db_cdc_poc_spark.operators.sessionize import last_touch_attribution

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, "click", t0),
        (2, 1, "purchase", t0),  # same ts, higher id -> click counts
        (9, 2, "purchase", t0),  # same ts, touch id higher -> not seen
        (10, 2, "click", t0),
    ]
    out = {
        r["event_id"]: r
        for r in last_touch_attribution(
            _ev(spark, rows), "purchase", ("click",)
        ).collect()
    }
    assert out[2]["touch_event_id"] == 1
    assert out[9]["touch_event_id"] is None


# ---------------------------------------------------------------------------
# golden records
# ---------------------------------------------------------------------------


def test_golden_records_survivorship_rules(spark):
    from db_cdc_poc_spark.operators.joins import golden_records

    df = spark.createDataFrame(
        [
            # cluster 1: latest non-null name is at priority 2; balance
            # only present at priority 0; segment null everywhere
            (1, 0, "Ann", 100, None),
            (1, 1, "Anne", None, None),
            (1, 2, "ANNE", None, None),
            # cluster 2: single record
            (2, 0, "Bob", 55, "RETAIL"),
        ],
        "cluster_id long, rec_priority int, name string, bal long, seg string",
    )
    out = {
        r["cluster_id"]: r
        for r in golden_records(
            df,
            "cluster_id",
            {
                "name": ("max_by", "name"),
                "bal": ("max_by", "bal"),
                "seg": ("max_by", "seg"),
                "n": ("count", "cluster_id"),
                "bal_sum": ("sum", "bal"),
            },
            priority_col="rec_priority",
        ).collect()
    }
    assert out[1]["name"] == "ANNE"      # highest priority with non-null
    assert out[1]["bal"] == 100          # nulls never win
    assert out[1]["seg"] is None         # all null -> null
    assert out[1]["n"] == 3 and out[1]["bal_sum"] == 100
    assert out[2]["name"] == "Bob" and out[2]["bal"] == 55


def test_golden_records_requires_priority_for_max_by(spark):
    from db_cdc_poc_spark.operators.joins import golden_records

    df = spark.createDataFrame([(1, "x")], "cluster_id long, name string")
    with pytest.raises(ValueError, match="priority_col"):
        golden_records(df, "cluster_id", {"name": ("max_by", "name")})


def test_lsh_recall_rejects_partial_bands(spark):
    from db_cdc_poc_spark.operators.dedup import minhash_recall_report

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divide evenly"):
        minhash_recall_report(df, num_hashes=10, bands=4)


def test_bm25_duplicate_query_terms_count_once(spark):
    from db_cdc_poc_spark.operators.text import bm25_topk

    rows = [(1, "spark engine"), (2, "other words entirely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = bm25_topk(df, ["spark"], top_k=5).collect()
    twice = bm25_topk(df, ["spark", "spark", "SPARK"], top_k=5).collect()
    assert [r.asDict() for r in once] == [r.asDict() for r in twice]
