"""Independent pure-Python/numpy reference implementations for the
round-7 operators. The oracle parity suite proves Spark == DuckDB; a
shared misreading of the METRIC would pass it on both sides. These
tests recompute each result a third way, from the raw parquet, with
none of the SQL/DataFrame machinery."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE
from video_streamer_spark.queries import QUERIES


def _docs():
    t = pq.read_table(f"{SF_SMOKE}/documents.parquet")
    return t.to_pydict()


def test_x201_covariance_matches_numpy_reference(spark):
    """The quantized exact covariance must agree with np.cov (biased,
    n-denominator) within quantization error: elements are floored to
    1e-6 and the output to 1e-6, so 3e-6 absolute slack covers both."""
    emb = pq.read_table(f"{SF_SMOKE}/embeddings.parquet").to_pydict()
    x = np.array([list(v) for v in emb["embedding"]], dtype=np.float64)
    xq = np.floor(x * 1e6) / 1e6  # the operator's quantization
    ref = np.cov(xq, rowvar=False, bias=True)
    got = {
        (r["i"], r["j"]): r["covariance"]
        for r in QUERIES["x201_embedding_covariance"](
            spark, SF_SMOKE
        ).collect()
    }
    d = x.shape[1]
    assert len(got) == d * (d + 1) // 2
    for (i, j), cov in got.items():
        assert abs(cov - ref[i - 1, j - 1]) < 3e-6, (i, j)


def test_x200_spans_match_python_reference(spark):
    """Verbatim spans recomputed with a direct python algorithm: same
    8-gram inventory, same df<=5 guard, same diagonal-run merge."""
    from collections import defaultdict

    docs = _docs()
    grams = defaultdict(list)  # gram -> [(doc, pos)]
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split(" ")
        for p in range(len(toks) - 7):
            grams[tuple(toks[p : p + 8])].append((doc_id, p + 1))
    pair_matches = defaultdict(set)  # (a,b) -> {(pa,pb)}
    for occ in grams.values():
        if not 2 <= len({d for d, _ in occ}) <= 5:
            continue
        for da, pa in occ:
            for db, pb in occ:
                if da < db:
                    pair_matches[(da, db)].add((pa, pb))
    expect = {}
    for (a, b), ms in pair_matches.items():
        spans = []
        by_diag = defaultdict(list)
        for pa, pb in ms:
            by_diag[pa - pb].append(pa)
        for pas in by_diag.values():
            pas.sort()
            run_start = prev = pas[0]
            for p in pas[1:]:
                if p != prev + 1:
                    spans.append(prev - run_start + 8)
                    run_start = p
                prev = p
            spans.append(prev - run_start + 8)
        if max(spans) >= 12:
            expect[(a, b)] = (len(spans), max(spans), sum(spans))
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["n_spans"],
            r["max_span_tokens"],
            r["shared_tokens"],
        )
        for r in QUERIES["x200_verbatim_span_dedup"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == expect
    assert expect, "reference found no spans — fixture regressed"


def test_x208_bcubed_matches_python_reference(spark):
    """B-cubed recomputed item-by-item (the definition), vs the
    cell-aggregated quantized form."""
    import hashlib
    from collections import Counter, defaultdict

    docs = _docs()
    c_of = {}
    g_of = {}
    src_of = {}
    for doc_id, text, src in zip(
        docs["doc_id"], docs["text"], docs["source"]
    ):
        c_of[doc_id] = hashlib.md5(text[:40].encode()).hexdigest()
        g_of[doc_id] = hashlib.md5(text.encode()).hexdigest()
        src_of[doc_id] = src
    c_size = Counter(c_of.values())
    g_size = Counter(g_of.values())
    cg_size = Counter((c_of[i], g_of[i]) for i in c_of)
    per_src = defaultdict(list)
    for i in c_of:
        n_cg = cg_size[(c_of[i], g_of[i])]
        per_src[src_of[i]].append(
            (n_cg / c_size[c_of[i]], n_cg / g_size[g_of[i]])
        )
    got = {
        r["source"]: (r["n_docs"], r["bcubed_precision"], r["bcubed_recall"])
        for r in QUERIES["x208_bcubed_cluster_eval"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got) == set(per_src)
    for src, pairs in per_src.items():
        n, p, r = got[src]
        assert n == len(pairs)
        # the engine quantizes each CELL term to 1e-6 before averaging;
        # items of a cell share the term, so worst-case drift stays
        # under 1e-6 + float noise
        assert abs(p - sum(x for x, _ in pairs) / len(pairs)) < 2e-6
        assert abs(r - sum(y for _, y in pairs) / len(pairs)) < 2e-6


def test_x202_cusum_matches_python_reference(spark):
    """CUSUM changepoint recomputed directly from the events parquet."""
    from collections import Counter, defaultdict

    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pydict()
    daily = Counter()
    for ts, et in zip(t["ts"], t["event_type"]):
        daily[(et, str(ts)[:10])] += 1
    by_type = defaultdict(list)
    for (et, day), c in daily.items():
        by_type[et].append((day, c))
    expect = {}
    for et, rows in by_type.items():
        rows.sort()
        n_days = len(rows)
        total = sum(c for _, c in rows)
        cusum, best = 0, None
        for day, c in rows:
            cusum += n_days * c - total
            key = (abs(cusum), day)
            if best is None or (
                key[0] > best[0][0]
                or (key[0] == best[0][0] and day < best[0][1])
            ):
                best = (key, day, cusum)
        expect[et] = (best[1], best[2], n_days)
    got = {
        r["event_type"]: (r["change_day"], r["cusum_scaled"], r["n_days"])
        for r in QUERIES["x202_cusum_changepoint"](spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_x207_pruning_advisor_matches_python_reference(spark):
    """Zone-map pruning fractions recomputed with plain numpy."""
    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pydict()
    ids = np.array(t["event_id"])
    vals = np.array(t["value"], dtype=np.float64)
    preds = {"narrow": (100.0, 110.0), "medium": (100.0, 200.0),
             "wide": (50.0, 400.0)}

    def zones(order):
        v = vals[order]
        out = []
        for s in range(0, len(v), 500):
            chunk = v[s : s + 500]
            out.append((chunk.min(), chunk.max()))
        return out

    layouts = {
        "current": zones(np.argsort(ids, kind="stable")),
        "sorted": zones(np.lexsort((ids, vals))),
    }
    got = {
        (r["layout"], r["pred"]): (r["n_groups"], r["n_scanned"])
        for r in QUERIES["x207_pruning_advisor"](spark, SF_SMOKE).collect()
    }
    for layout, zs in layouts.items():
        for pred, (lo, hi) in preds.items():
            scanned = sum(1 for zlo, zhi in zs if zhi >= lo and zlo <= hi)
            assert got[(layout, pred)] == (len(zs), scanned), (layout, pred)
    # the sorted layout must never scan MORE than the current one
    for pred in preds:
        assert (
            got[("sorted", pred)][1] <= got[("current", pred)][1]
        ), pred


def test_x200_no_position_cap_and_short_doc_safety(spark, tmp_path):
    """Two regressions pinned: (a) the DuckDB oracle used to enumerate
    gram positions only up to 4000, silently diverging from Spark on
    long documents — a shared span at positions ~4050 must be found by
    BOTH sides; (b) documents with <= 7 tokens used to reach
    sequence(1, 0) = [1, 0] and slice(arr, 0, 8), which THROWS — they
    must now contribute nothing and crash nothing."""
    import duckdb
    import pyarrow as pa

    a_toks = [f"a{i}" for i in range(4120)]
    b_toks = [f"b{i}" for i in range(4120)]
    b_toks[4040:4060] = a_toks[4040:4060]  # shared 20-token span
    docs = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                " ".join(a_toks),
                " ".join(b_toks),
                "",  # 1 empty "token"
                "a b c",
                "t1 t2 t3 t4 t5 t6 t7",  # exactly 7: no 8-gram
                "u1 u2 u3 u4 u5 u6 u7 u8",  # one gram, df=1 -> dropped
            ],
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    from video_streamer_spark.queries import ORACLES

    got = sorted(
        tuple(r)
        for r in QUERIES["x200_verbatim_span_dedup"](
            spark, str(tmp_path)
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    oracle = sorted(
        tuple(r)
        for r in con.execute(
            ORACLES["x200_verbatim_span_dedup"]
        ).fetchall()
    )
    con.close()
    # span of 20 tokens starting at position 4041: 13 grams, one island
    assert got == [(1, 2, 1, 20, 20)]
    assert oracle == got
