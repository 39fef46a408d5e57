"""Property-based tests (hypothesis) for the numeric-parity kernels and
the net-flow invariants — the correctness machinery everything else
stands on."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------- quanta ---
# Python-side models of plans/parity.py recipes (same IEEE ops).


def py_quanta(x: float, d: int) -> int:
    return math.floor(x * float(10**d) + 0.5)


def py_fround(x: float, d: int) -> float:
    s = float(10**d)
    return math.floor(x * s + 0.5) / s


@given(
    st.decimals(
        min_value=-(10**9), max_value=10**9, places=2, allow_nan=False
    ),
)
def test_quanta_recovers_two_decimal_values_exactly(dec):
    """quanta(x, 2) of a double storing a 2-decimal value recovers the
    exact scaled integer (the float noise is far below 0.5 quanta)."""
    x = float(dec)
    assert py_quanta(x, 2) == int(dec.scaleb(2))


@given(
    st.lists(
        st.decimals(min_value=0, max_value=10**6, places=4, allow_nan=False),
        min_size=1,
        max_size=200,
    )
)
def test_quanta_sum_is_order_independent(vals):
    """Σ quanta is identical under any permutation — the property that
    makes results partition- and engine-independent (plain float sums
    are not)."""
    xs = [float(v) for v in vals]
    fwd = sum(py_quanta(x, 4) for x in xs)
    rev = sum(py_quanta(x, 4) for x in reversed(xs))
    assert fwd == rev
    # and it equals the exact decimal sum scaled
    assert fwd == int(sum(v.scaleb(4) for v in vals))


@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_fround_idempotent(x):
    once = py_fround(x, 6)
    assert py_fround(once, 6) == once


# --------------------------------------------------------------- netflow ---


@given(
    st.dictionaries(
        st.tuples(st.sampled_from("abcd"), st.sampled_from("xyz")),
        st.tuples(
            st.integers(min_value=0, max_value=10**12),
            st.integers(min_value=0, max_value=10**12),
        ),
        min_size=0,
        max_size=12,
    )
)
@settings(deadline=None, max_examples=25)
def test_netflow_invariants_python_model(flows):
    """Model of domain/netflow.transacted semantics: net = produced −
    consumed, zeros dropped. Invariants: (1) no zero rows; (2) value
    conservation: Σnet = Σproduced − Σconsumed; (3) keys ⊆ union of
    input keys."""
    consumed = {k: v[0] for k, v in flows.items() if v[0] > 0}
    produced = {k: v[1] for k, v in flows.items() if v[1] > 0}
    net = {}
    for k in set(consumed) | set(produced):
        d = produced.get(k, 0) - consumed.get(k, 0)
        if d != 0:
            net[k] = d
    assert all(v != 0 for v in net.values())
    assert sum(net.values()) == sum(produced.values()) - sum(consumed.values())
    assert set(net) <= set(consumed) | set(produced)


def test_netflow_spark_matches_python_model(spark):
    """One Spark execution of the same invariant check on generated
    data (the pure model above runs hundreds of cases; Spark runs one
    representative to pin the implementation to the model)."""
    import random

    from pyspark.sql import functions as F

    from blockchain_data_engineering_spark.domain.netflow import transacted

    rng = random.Random(1)
    rows_in, rows_out = [], []
    for i in range(200):
        tx, addr, unit = f"t{i % 7}", f"a{rng.randrange(5)}", f"u{rng.randrange(3)}"
        if rng.random() < 0.7:
            rows_in.append((tx, addr, unit, rng.randrange(0, 100)))
        if rng.random() < 0.7:
            rows_out.append((tx, addr, unit, rng.randrange(0, 100)))
    schema = "tx_hash STRING, address STRING, unit STRING, quantity LONG"
    iu = spark.createDataFrame(rows_in, schema)
    ou = spark.createDataFrame(rows_out, schema)
    got = transacted(iu, ou).collect()

    consumed: dict = {}
    produced: dict = {}
    for t, a, u, q in rows_in:
        consumed[(t, a, u)] = consumed.get((t, a, u), 0) + q
    for t, a, u, q in rows_out:
        produced[(t, a, u)] = produced.get((t, a, u), 0) + q
    want = {}
    for k in set(consumed) | set(produced):
        d = produced.get(k, 0) - consumed.get(k, 0)
        if d != 0:
            want[k] = d
    assert {(r.tx_hash, r.address, r.unit): r.value for r in got} == want


# ------------------------------------------------- duplicated spans ---

_WORDS = ("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=40),
        min_size=2,
        max_size=8,
    ),
    n=st.integers(min_value=3, max_value=6),
)
@settings(max_examples=12, deadline=None)
def test_duplicated_spans_invariants_python_model(docs, n):
    """Pure-python twin of operators.dedup.duplicated_spans: spans per
    doc must be disjoint, non-adjacent, ordered, within bounds, and
    cover exactly the positions of cross-doc-duplicated n-grams."""
    grams: dict[int, list[tuple[int, tuple[str, ...]]]] = {}
    for di, toks in enumerate(docs):
        grams[di] = [
            (p, tuple(toks[p : p + n])) for p in range(len(toks) - n + 1)
        ]
    from collections import defaultdict

    where = defaultdict(set)
    for di, lst in grams.items():
        for _, g in lst:
            where[g].add(di)
    dup = {g for g, ds in where.items() if len(ds) >= 2}
    for di, toks in enumerate(docs):
        hits = sorted(p for p, g in grams[di] if g in dup)
        # islands merge
        spans = []
        for p in hits:
            e = p + n - 1
            if spans and p <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], e))
            else:
                spans.append((p, e))
        # invariants
        for i, (s, e) in enumerate(spans):
            assert 0 <= s <= e < len(toks)
            if i:
                assert s > spans[i - 1][1] + 1  # disjoint AND non-adjacent
        covered = set()
        for s, e in spans:
            covered |= set(range(s, e + 1))
        for p in hits:
            assert set(range(p, p + n)) <= covered


def test_duplicated_spans_spark_matches_python_model(spark):
    """The Spark operator must agree with the python model on a fixed
    adversarial corpus (overlap, adjacency, triple-doc sharing)."""
    import itertools

    from blockchain_data_engineering_spark.operators.dedup import (
        duplicated_spans,
    )

    corpus = [
        "aa bb cc dd ee ff gg hh aa bb cc dd".split(),
        "xx aa bb cc dd ee ff gg hh yy".split(),
        "aa bb cc dd ee ff gg hh aa bb cc dd ee".split(),
        "zz " * 12,
    ]
    corpus[3] = corpus[3].split()
    n = 4
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(df, n=n).collect()
    }
    # python model
    grams = {
        di: [(p, tuple(t[p : p + n])) for p in range(len(t) - n + 1)]
        for di, t in enumerate(corpus)
    }
    from collections import defaultdict

    where = defaultdict(set)
    for di, lst in grams.items():
        for _, g in lst:
            where[g].add(di)
    dup = {g for g, ds in where.items() if len(ds) >= 2}
    expect = set()
    for di, t in enumerate(corpus):
        hits = sorted(p for p, g in grams[di] if g in dup)
        spans = []
        for p in hits:
            e = p + n - 1
            if spans and p <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], e))
            else:
                spans.append((p, e))
        expect |= {(di, s, e) for s, e in spans}
    assert got == expect


# ------------------------------------------------------ pack invariants ---


def test_pack_sequences_conservation(spark):
    """Every doc's packed placement must tile the shard stream: within
    a shard, start offsets are a running sum of token counts in the
    deterministic (md5, id) order, with no gaps or overlaps."""
    from blockchain_data_engineering_spark.operators.text import pack_sequences

    rows = [(i, " ".join(["w"] * (3 + i % 7)), f"s{i % 3}") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = pack_sequences(df, seq_len=16).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["source"], []).append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r["start_offset"])
        cursor = 0
        for r in docs:
            assert r["start_offset"] == cursor, (shard, r)
            assert r["pack_id"] == cursor // 16
            last_tok = cursor + r["n_tokens"] - 1
            assert r["n_packs"] == last_tok // 16 - cursor // 16 + 1
            cursor += r["n_tokens"]


# --------------------------------------------------------------- ws ---
@given(
    msgs=st.lists(
        st.text(min_size=0, max_size=300), min_size=1, max_size=8
    ),
)
@settings(deadline=None, max_examples=30)
def test_ws_framing_roundtrips_arbitrary_text(msgs):
    """RFC-6455 framing property: any sequence of unicode messages sent
    client→server and echoed server→client arrives intact and in order
    (masking, length encodings, and utf-8 handled by the layer)."""
    import socket

    from blockchain_data_engineering_spark.streaming.ws import (
        WebSocketConnection,
    )

    a, b = socket.socketpair()
    try:
        client = WebSocketConnection(a, mask=True)
        server = WebSocketConnection(b, mask=False)
        for m in msgs:
            client.send_text(m)
            got = server.recv_text()
            assert got == m
            server.send_text(got)
            assert client.recv_text() == m
    finally:
        a.close()
        b.close()


@given(size=st.integers(min_value=0, max_value=70_000))
@settings(deadline=None, max_examples=12)
def test_ws_length_encoding_boundaries(size):
    """Payload length crosses the 7-bit (126) and 16-bit (65536)
    encoding boundaries without corruption."""
    import socket

    from blockchain_data_engineering_spark.streaming.ws import (
        WebSocketConnection,
    )

    a, b = socket.socketpair()
    try:
        client = WebSocketConnection(a, mask=True)
        server = WebSocketConnection(b, mask=False)
        payload = "x" * size
        client.send_text(payload)
        assert server.recv_text() == payload
    finally:
        a.close()
        b.close()


# ----------------------------------------------------------- upsert ---
def test_upsert_parquet_matches_dict_model(spark, tmp_path):
    """S11 semantics against an executable model: a sequence of random
    batches through upsert_parquet must leave exactly the table a
    Python dict with ON CONFLICT semantics predicts — new batch beats
    existing on the same key, intra-batch duplicates resolved by
    order_cols (ts desc = latest wins), including on the
    table-creating first batch."""
    import random

    from pyspark.sql import functions as F

    from blockchain_data_engineering_spark.sources import upsert_parquet

    rng = random.Random(2024)
    for scenario in range(4):
        path = "file://" + str(tmp_path / f"tbl{scenario}")
        model: dict[int, tuple[int, int]] = {}
        for _ in range(rng.randint(1, 3)):
            batch = [
                (rng.randint(0, 4), rng.randint(0, 9), rng.randint(0, 99))
                for _ in range(rng.randint(1, 6))
            ]
            df = spark.createDataFrame(batch, "k LONG, ts LONG, v LONG")
            upsert_parquet(df, path, ["k"], order_cols=[F.col("ts").desc()])
            # model: within the batch the highest ts wins (ties: the
            # row_number tie-break is unspecified between equal ts, so
            # avoid asserting v on ts-ties — regenerate instead)
            per_key: dict[int, tuple[int, int]] = {}
            for k, ts, v in batch:
                cur = per_key.get(k)
                if cur is None or ts > cur[0]:
                    per_key[k] = (ts, v)
                elif ts == cur[0] and v != cur[1]:
                    per_key[k] = (ts, None)  # ambiguous winner
            model.update(per_key)
        got = {
            r["k"]: (r["ts"], r["v"])
            for r in spark.read.parquet(path).collect()
        }
        assert set(got) == set(model)
        for k, (ts, v) in model.items():
            assert got[k][0] == ts, (scenario, k)
            if v is not None:
                assert got[k][1] == v, (scenario, k)
