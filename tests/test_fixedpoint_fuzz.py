"""Property fuzz for the fixed-point / portable-replay family (r11
session 2): the oracle sweeps prove Spark == DuckDB on the CORPUS
tables; these properties prove the same determinism claims on
hypothesis-generated adversarial inputs — short/empty docs,
repeated-character words (overlapping-merge edge cases), dangling
graph nodes, oversized packing items — against pure-python third
engines. The DuckDB-only properties retarget the registered ORACLE
STRINGS themselves at synthetic tables, so the SQL text (not just the
Spark side) is what gets fuzzed.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

#: r15: the fuzz soaks are long-running drills — excluded from the
#: default (driver-budget) run; see pytest.ini. Run with -m "".
pytestmark = pytest.mark.slow
from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# DuckDB-only oracle fuzz (fast — generous example counts)
# ---------------------------------------------------------------------------

#: Alphabet biased toward the fixed BPE merge table so merges actually
#: fire, plus outsiders and a quote to exercise escaping-adjacent code.
_WORD_ALPHABET = "thea nirsocquwyblxz"


def _mk_docs(texts):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    return con


_words = st.text(alphabet=_WORD_ALPHABET.replace(" ", ""), min_size=1, max_size=9)
_texts = st.lists(
    st.lists(_words, min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=6,
)


@settings(max_examples=60, deadline=None)
@given(texts=_texts)
def test_bpe_encode_oracle_fuzz(texts):
    """The registered tokenize_bpe_docs ORACLE equals the python
    encoder (bpe_encode + doc assembly) on random corpora — including
    empty docs, 1-char words, and repeated-character words where the
    greedy first-position rule and non-overlap interact."""
    from mobility_etl_spark.queries.tokenize import (
        BPE_MERGES,
        _bpe_encode_oracle,
        bpe_encode,
    )

    ranks = {pair: i for i, pair in enumerate(BPE_MERGES)}
    con = _mk_docs(texts)
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(_bpe_encode_oracle()).fetchall()
    }
    for did, text in enumerate(texts):
        words = text.split(" ") if text else []
        subs: list[str] = []
        for w in words:
            subs.extend(bpe_encode(w, ranks))
        assert got[did] == (len(words), len(subs), " ".join(subs[:8])), (
            did,
            text,
        )


@settings(max_examples=40, deadline=None)
@given(texts=_texts)
def test_bpe_train_oracle_fuzz(texts):
    """The registered tokenizer_train_bpe ORACLE equals the Sennrich
    reference trainer on random corpora (windowed argmax tie-breaks,
    gaps-and-islands non-overlap merge on repeated-char runs)."""
    from collections import Counter

    from mobility_etl_spark.queries.tokenize import (
        _BPE_TRAIN_N,
        _BPE_TRAIN_ORACLE,
        learn_bpe_reference,
    )

    wc: Counter = Counter()
    for text in texts:
        for w in text.lower().split(" ") if text else []:
            if w:
                wc[w] += 1
    want = [tuple(m) for m in learn_bpe_reference(dict(wc), _BPE_TRAIN_N)]
    con = _mk_docs(texts)
    got = [tuple(r) for r in con.execute(_BPE_TRAIN_ORACLE).fetchall()]
    assert got == want, (texts, got, want)


def _python_bfd(doc_sizes, cap, groups, stride):
    """Pure-python replay of pack_sequences' BFD (bisect semantics)
    with the portable md5 group salt — mirrors operators/packing.py."""
    import bisect
    from collections import defaultdict

    by_grp = defaultdict(list)
    for did, sz in doc_sizes:
        g = int(hashlib.md5(str(did).encode()).hexdigest()[:15], 16) % groups
        by_grp[g].append((did, sz))
    stats = {}
    for g, rows in by_grp.items():
        rows.sort(key=lambda r: (-r[1], r[0]))
        rem, rem_bin, nb = [], [], 0
        for did, sz in rows:
            if sz > cap:
                b, ov = nb, True
                nb += 1
            else:
                ov = False
                i = bisect.bisect_left(rem, sz)
                if i < len(rem):
                    b, nr = rem_bin.pop(i), rem.pop(i) - sz
                else:
                    b, nr = nb, cap - sz
                    nb += 1
                j = bisect.bisect_left(rem, nr)
                rem.insert(j, nr)
                rem_bin.insert(j, b)
            key = (g, g * stride + b)
            s = stats.setdefault(key, [0, 0, False])
            s[0] += 1
            s[1] += sz
            s[2] = s[2] or ov
    return {
        (g, bid): (n, f, ov) for (g, bid), (n, f, ov) in stats.items()
    }


@settings(max_examples=40, deadline=None)
@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=700), min_size=1, max_size=40
    )
)
def test_pack_oracle_fuzz(sizes):
    """The registered pack_sequences_docs ORACLE (BFD bisect-state
    recursion) equals a pure-python bisect replay on random size
    mixes, including oversized (> 512) solo-bin items."""
    from mobility_etl_spark.queries.corpus_prep import (
        _PACK_CAP,
        _PACK_GROUPS,
        _PACK_ORACLE,
        _PACK_STRIDE,
    )

    # synthesize documents whose token counts are exactly `sizes`
    texts = ["w" + " w" * (sz - 1) for sz in sizes]
    con = _mk_docs(texts)
    got = {
        (r[0], r[1]): (r[2], r[3], r[5])
        for r in con.execute(_PACK_ORACLE).fetchall()
    }
    want = _python_bfd(
        list(enumerate(sizes)), _PACK_CAP, _PACK_GROUPS, _PACK_STRIDE
    )
    assert got == want, (sizes, got, want)


# ---------------------------------------------------------------------------
# Spark-side fixed-point fuzz (fewer examples — one job per example)
# ---------------------------------------------------------------------------

_nodes = [f"n{i}" for i in range(6)]
_edges = st.lists(
    st.tuples(st.sampled_from(_nodes), st.sampled_from(_nodes)),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(edges=_edges)
def test_pagerank_fixedpoint_fuzz(spark, edges):
    """Integer PageRank is bit-identical to the sequential replay on
    random directed multigraphs — self-loops, dangling nodes, parallel
    edges (deduped) included."""
    from tests.test_graph import _python_pagerank_fixedpoint

    from mobility_etl_spark.operators.pagerank import pagerank_fixedpoint

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r.node: r.rank_fp
        for r in pagerank_fixedpoint(df, iters=3, checkpoint_every=2).collect()
    }
    assert got == _python_pagerank_fixedpoint(edges, 3, 10**12), edges


def _python_kmeans_fp(vecs, k, iters, quant=10**6):
    def truncdiv(s, n):
        q = abs(s) // n
        return q if s >= 0 else -q

    V = [[math.floor(x * quant) for x in v] for _, v in sorted(vecs)]
    d = len(V[0])
    cents = [list(V[j]) for j in range(k)]

    def assign(cs):
        out = []
        for v in V:
            key = min(
                sum((a - b) * (a - b) for a, b in zip(v, c)) * k + j
                for j, c in enumerate(cs)
            )
            out.append(key % k)
        return out

    for _ in range(iters):
        a = assign(cents)
        new = []
        for j in range(k):
            mem = [v for v, cid in zip(V, a) if cid == j]
            if not mem:
                new.append([0] * d)
                continue
            new.append(
                [
                    truncdiv(sum(m[i] for m in mem), len(mem))
                    for i in range(d)
                ]
            )
        cents = new
    return assign(cents), cents


@settings(max_examples=8, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.floats(
                min_value=-5, max_value=5, allow_nan=False, width=32
            ),
            st.floats(
                min_value=-5, max_value=5, allow_nan=False, width=32
            ),
        ),
        min_size=4,
        max_size=14,
    )
)
def test_kmeans_fixedpoint_fuzz(spark, data):
    """Integer Lloyd's equals the sequential replay on random small
    point sets — coincident seeds, empty clusters, negative
    components, argmin ties included."""
    from mobility_etl_spark.operators.linalg import kmeans_fixedpoint

    k = 3
    rows = [(i, [float(a), float(b)]) for i, (a, b) in enumerate(data)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, cents = kmeans_fixedpoint(df, k=k, iters=2)
    got = {r.key: r.cluster_id for r in assigned.collect()}
    want_assign, want_cents = _python_kmeans_fp(
        [(i, v) for i, v in rows], k, 2
    )
    assert got == {i: want_assign[i] for i in range(len(rows))}, rows
    assert cents == want_cents, rows
