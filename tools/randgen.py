"""Seeded randomized fixture generator for the differential lane.

The driver's parquet fixtures are FIXED — every oracle row in
CORRECTNESS_r*.json is evidence on the same bytes, so a query could in
principle be right-on-the-fixture and wrong-in-general (fixture
overfit). This module generates schema-compatible random variants of
the ten tables — same columns, same parquet types, same value DOMAINS
(so derived views and working-point constants still bind) — but with
adversarial distributions the fixed fixtures don't exercise:

- **Zipf-skewed keys** (users, customers, parts: a few keys carry most
  rows, the 1000-executor shuffle reality);
- **NULLs** in nullable measure/attribute columns (acctbal, totalprice,
  event value/props, document text) at ~3%;
- **empty groups** (a region no nation points at, a language and
  an event type that never occur, a customer with no orders);
- **unicode text** (CJK / accented latin / emoji tokens mixed into the
  ASCII vocab — chosen to be case-stable so Java and DuckDB string
  functions agree; no ß/İ/ı/ς which case-fold differently);
- **planted duplicates and near-duplicates** (exact text copies,
  small-perturbation copies, high-cosine embedding pairs) so the dedup
  and decon families return non-trivial sets.

Determinism: everything derives from ``numpy.random.default_rng(seed)``
— the same seed writes byte-identical tables, so a failing seed is a
reproducible bug report, committable in DIFFERENTIAL_r*.json.

Used by tests/test_differential.py (the pytest lane) and
tools/run_differential.py (the committed-artifact runner).
"""

from __future__ import annotations

import datetime as _dt
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: Row counts: big enough that groups/joins/windows have structure,
#: small enough that a full family sweep stays in test-suite budget.
N_CUSTOMER = 200
N_SUPPLIER = 50
N_PART = 100
N_ORDERS = 800
N_LINEITEM = 3000
N_EVENTS = 4000
N_DOCS = 300
N_EMB = 200
EMB_DIM = 64

#: Case-stable unicode vocabulary (tokens survive upper/lower round
#: trips identically in Java and DuckDB — no Turkish i, sharp s, or
#: final sigma, whose case rules differ by engine/locale).
_ASCII_WORDS = (
    "key agg row scan slow fast table value part hash merge batch window "
    "spark order data column join small line customer query big filter the a"
).split()
_UNICODE_WORDS = [
    "数据",  # CJK
    "查询",
    "データ",
    "списки",  # cyrillic
    "café",  # accented latin
    "naïve",
    "🚀",  # emoji
    "χ²",  # greek letter + superscript
    "مرحبا",  # RTL arabic
]
_VOCAB = _ASCII_WORDS + _UNICODE_WORDS

_EVENT_TYPES = ["signup", "view", "click", "purchase", "error"]
_LANGS = ["en", "de", "zh", "fr", "es"]  # 'es' is planted as EMPTY
_SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _zipf_keys(rng: np.random.Generator, n: int, k_max: int) -> np.ndarray:
    """n keys in [0, k_max) with Zipf(1.3) mass — a handful of hot keys."""
    z = rng.zipf(1.3, size=n)
    return ((z - 1) % k_max).astype(np.int64)


def _null_mask(rng: np.random.Generator, n: int, frac: float = 0.03):
    return rng.random(n) < frac


def _ts_array(days_base: str, sec_offsets: np.ndarray) -> pa.Array:
    base = _dt.datetime.fromisoformat(days_base)
    epoch = _dt.datetime(1970, 1, 1)
    base_us = int((base - epoch).total_seconds()) * 1_000_000
    return pa.array(base_us + sec_offsets.astype(np.int64) * 1_000_000).cast(
        pa.timestamp("us")
    )


def _strings(vals, mask=None) -> pa.Array:
    if mask is not None:
        vals = [None if m else v for v, m in zip(vals, mask)]
    return pa.array(vals, type=pa.string())


def _doubles(vals: np.ndarray, mask=None) -> pa.Array:
    out = pa.array(vals.astype(np.float64))
    if mask is not None:
        out = pa.array(
            [None if m else float(v) for v, m in zip(vals, mask)],
            type=pa.float64(),
        )
    return out


def generate(out_dir: str, seed: int) -> str:
    """Write the ten randomized tables under ``out_dir``; returns out_dir."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))

    # region / nation — region 4 gets NO nations (empty-group join side)
    write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), type=pa.int32()),
                "r_name": _strings(_REGIONS),
            }
        ),
    )
    n_region = ((np.arange(25) * 7) % 4).astype(np.int32)  # never 4
    write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), type=pa.int32()),
                "n_name": _strings([f"NATION_{i}" for i in range(25)]),
                "n_regionkey": pa.array(n_region, type=pa.int32()),
            }
        ),
    )

    # customer — skewed nations, ~3% null acctbal, unicode names
    cn = _zipf_keys(rng, N_CUSTOMER, 20)  # nations 20..24 customer-less
    acct = rng.normal(1000, 3000, N_CUSTOMER).round(2)
    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(N_CUSTOMER), type=pa.int64()),
                "c_name": _strings(
                    [
                        f"cust_{i}_{_VOCAB[int(v)]}"
                        for i, v in enumerate(rng.integers(0, len(_VOCAB), N_CUSTOMER))
                    ]
                ),
                "c_nationkey": pa.array(cn.astype(np.int32), type=pa.int32()),
                "c_acctbal": _doubles(acct, _null_mask(rng, N_CUSTOMER)),
                "c_mktsegment": _strings(
                    [_SEGMENTS[int(i)] for i in _zipf_keys(rng, N_CUSTOMER, 5)]
                ),
            }
        ),
    )

    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(N_SUPPLIER), type=pa.int64()),
                "s_name": _strings([f"supp_{i}" for i in range(N_SUPPLIER)]),
                "s_nationkey": pa.array(
                    _zipf_keys(rng, N_SUPPLIER, 25).astype(np.int32), type=pa.int32()
                ),
                "s_acctbal": _doubles(
                    rng.normal(500, 2000, N_SUPPLIER).round(2),
                    _null_mask(rng, N_SUPPLIER),
                ),
            }
        ),
    )

    types = ["ECONOMY", "SMALL", "STANDARD", "LARGE", "PROMO"]
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(N_PART), type=pa.int64()),
                "p_name": _strings(
                    [
                        " ".join(
                            _VOCAB[j] for j in rng.integers(0, len(_VOCAB), 3)
                        )
                        for _ in range(N_PART)
                    ]
                ),
                "p_brand": _strings(
                    [f"Brand#{int(b)}" for b in rng.integers(1, 26, N_PART)]
                ),
                "p_type": _strings(
                    [types[int(t)] for t in _zipf_keys(rng, N_PART, 5)]
                ),
                "p_size": pa.array(
                    rng.integers(1, 51, N_PART).astype(np.int32), type=pa.int32()
                ),
                "p_retailprice": _doubles(rng.uniform(100, 2000, N_PART).round(2)),
            }
        ),
    )

    # orders — skewed custkeys incl. DANGLING (> max custkey: FK breaks on
    # purpose), dates inside the real fixtures' 1995-2001 span so the
    # tpch literal predicates still carve non-trivial subsets
    ok = np.arange(N_ORDERS, dtype=np.int64)
    ocust = _zipf_keys(rng, N_ORDERS, N_CUSTOMER + 30)
    odate_s = rng.integers(0, 6 * 365 * 86400, N_ORDERS)
    write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(ok, type=pa.int64()),
                "o_custkey": pa.array(ocust, type=pa.int64()),
                "o_orderstatus": _strings(
                    [["F", "O", "P"][int(i)] for i in _zipf_keys(rng, N_ORDERS, 3)]
                ),
                "o_totalprice": _doubles(
                    rng.uniform(1000, 400000, N_ORDERS).round(2),
                    _null_mask(rng, N_ORDERS),
                ),
                "o_orderdate": _ts_array("1995-01-01", odate_s),
                "o_orderpriority": _strings(
                    [_PRIORITIES[int(i)] for i in _zipf_keys(rng, N_ORDERS, 5)]
                ),
            }
        ),
    )

    lk = _zipf_keys(rng, N_LINEITEM, N_ORDERS + 50)  # some dangling orderkeys
    ship_s = rng.integers(0, int(6.8 * 365) * 86400, N_LINEITEM)
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(lk, type=pa.int64()),
                "l_partkey": pa.array(
                    _zipf_keys(rng, N_LINEITEM, N_PART + 20), type=pa.int64()
                ),
                "l_suppkey": pa.array(
                    _zipf_keys(rng, N_LINEITEM, N_SUPPLIER + 10), type=pa.int64()
                ),
                "l_linenumber": pa.array(
                    (rng.integers(1, 8, N_LINEITEM)).astype(np.int32),
                    type=pa.int32(),
                ),
                "l_quantity": _doubles(rng.integers(1, 51, N_LINEITEM).astype(float)),
                "l_extendedprice": _doubles(
                    rng.uniform(900, 100000, N_LINEITEM).round(2)
                ),
                "l_discount": _doubles(
                    (rng.integers(0, 11, N_LINEITEM) / 100.0)
                ),
                "l_tax": _doubles((rng.integers(0, 9, N_LINEITEM) / 100.0)),
                "l_returnflag": _strings(
                    [["R", "A", "N"][int(i)] for i in _zipf_keys(rng, N_LINEITEM, 3)]
                ),
                "l_linestatus": _strings(
                    [["O", "F"][int(i)] for i in rng.integers(0, 2, N_LINEITEM)]
                ),
                "l_shipdate": _ts_array("1995-01-02", ship_s),
            }
        ),
    )

    # events — 30-day span (the derived auction lifetimes assume it),
    # unique event_id, Zipf users, bursty timestamps (hot seconds), ~3%
    # null value/props; event_type 'error' kept rare, none null (the
    # derived-view WHEREs would hide them from only SOME queries)
    eid = np.arange(N_EVENTS, dtype=np.int64)
    ets = np.sort(
        np.concatenate(
            [
                rng.integers(0, 30 * 86400, N_EVENTS - 400),
                rng.integers(86400, 86400 + 600, 400),  # one hot burst
            ]
        )
    )
    ev_type = [
        _EVENT_TYPES[int(i)]
        for i in np.clip(_zipf_keys(rng, N_EVENTS, 6), 0, 4)
    ]
    props_mask = _null_mask(rng, N_EVENTS)
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "ts": _ts_array("2024-01-01", ets),
                "user_id": pa.array(_zipf_keys(rng, N_EVENTS, 300), type=pa.int64()),
                "event_type": _strings(ev_type),
                "value": _doubles(
                    rng.uniform(0.01, 490, N_EVENTS).round(4),
                    _null_mask(rng, N_EVENTS),
                ),
                "props": _strings(
                    [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, N_EVENTS)],
                    props_mask,
                ),
            }
        ),
    )

    # documents — unicode vocab, exact dups, near-dups, empty and null
    # texts, a planted empty language ('es' never occurs)
    texts: list[str | None] = []
    base_docs = []
    for _ in range(N_DOCS):
        n_words = int(rng.integers(5, 120))
        base_docs.append(
            " ".join(_VOCAB[int(j)] for j in rng.integers(0, len(_VOCAB), n_words))
        )
    for i in range(N_DOCS):
        r = rng.random()
        if i > 20 and r < 0.08:  # exact duplicate of an earlier doc
            texts.append(texts[int(rng.integers(0, i))])
        elif i > 20 and r < 0.16:  # near-duplicate: perturb a few words
            src = texts[int(rng.integers(0, i))]
            if src:
                words = src.split()
                for _ in range(min(2, len(words))):
                    words[int(rng.integers(0, len(words)))] = _VOCAB[
                        int(rng.integers(0, len(_VOCAB)))
                    ]
                texts.append(" ".join(words))
            else:
                texts.append(base_docs[i])
        elif r < 0.18:
            texts.append("")  # empty text
        elif r < 0.20:
            texts.append(None)  # null text
        else:
            texts.append(base_docs[i])
    lang = [
        _LANGS[int(i)] if _LANGS[int(i)] != "es" else "en"
        for i in _zipf_keys(rng, N_DOCS, 5)
    ]
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(N_DOCS), type=pa.int64()),
                "text": _strings(texts),
                "lang": _strings(lang),
                "source": _strings(
                    [f"src{int(s)}" for s in _zipf_keys(rng, N_DOCS, 20)]
                ),
                "n_chars": pa.array(
                    [len(t) if t is not None else None for t in texts],
                    type=pa.int64(),
                ),
            }
        ),
    )

    # embeddings — unit-ish gaussian vectors; planted high-cosine pairs
    # (i, i+100) for i in 0..9 and mid-cosine pairs for the decon band
    vecs = rng.normal(0, 1, (N_EMB, EMB_DIM))
    for i in range(10):
        vecs[i + 100] = vecs[i] + rng.normal(0, 0.05, EMB_DIM)  # cos ≈ 0.99
    for i in range(10, 20):
        vecs[i + 100] = 0.45 * vecs[i] + rng.normal(0, 0.9, EMB_DIM)  # mid band
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(N_EMB), type=pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32) for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array(
                    rng.integers(0, 10, N_EMB).astype(np.int32), type=pa.int32()
                ),
            }
        ),
    )
    return out_dir


def generate_degenerate(out_dir: str) -> str:
    """The DEGENERATE fixture: the smallest tables that still have the
    ten schemas — empty fact tables, singleton dimensions, a zero
    embedding, a single-event group, NULL/empty text. Fixed content (no
    seed): these are boundary VALUES, not distributions. First sweep
    (r12) crashed 9 entries and value-diverged 3 more — single-row
    groups (sample variance /0), zero-norm vectors (Spark ANSI
    DIVIDE_BY_ZERO vs DuckDB list_cosine_similarity = -1.0), empty
    corpora (IVF centroid sample empty → array_max(array()) analysis
    error), zero-char language shares (0/0), and Spark PIVOT's
    NULL-for-absent-cell vs conditional aggregation's 0. At 100 TB an
    empty shard or one corrupt row is a certainty, and the crash class
    kills the whole job."""
    os.makedirs(out_dir, exist_ok=True)

    def w(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))

    s, i32, i64, f64 = pa.string(), pa.int32(), pa.int64(), pa.float64()
    ts = pa.timestamp("us")
    w("region", pa.table({"r_regionkey": pa.array([0], i32), "r_name": pa.array(["ASIA"], s)}))
    w("nation", pa.table({"n_nationkey": pa.array([0], i32), "n_name": pa.array(["N0"], s), "n_regionkey": pa.array([0], i32)}))
    w("customer", pa.table({"c_custkey": pa.array([], i64), "c_name": pa.array([], s), "c_nationkey": pa.array([], i32), "c_acctbal": pa.array([], f64), "c_mktsegment": pa.array([], s)}))
    w("supplier", pa.table({"s_suppkey": pa.array([0], i64), "s_name": pa.array(["s"], s), "s_nationkey": pa.array([0], i32), "s_acctbal": pa.array([None], f64)}))
    w("part", pa.table({"p_partkey": pa.array([0], i64), "p_name": pa.array(["p"], s), "p_brand": pa.array(["Brand#1"], s), "p_type": pa.array(["ECONOMY"], s), "p_size": pa.array([1], i32), "p_retailprice": pa.array([1.0], f64)}))
    w("orders", pa.table({"o_orderkey": pa.array([], i64), "o_custkey": pa.array([], i64), "o_orderstatus": pa.array([], s), "o_totalprice": pa.array([], f64), "o_orderdate": pa.array([], ts), "o_orderpriority": pa.array([], s)}))
    w("lineitem", pa.table({"l_orderkey": pa.array([], i64), "l_partkey": pa.array([], i64), "l_suppkey": pa.array([], i64), "l_linenumber": pa.array([], i32), "l_quantity": pa.array([], f64), "l_extendedprice": pa.array([], f64), "l_discount": pa.array([], f64), "l_tax": pa.array([], f64), "l_returnflag": pa.array([], s), "l_linestatus": pa.array([], s), "l_shipdate": pa.array([], ts)}))
    w("events", pa.table({"event_id": pa.array([0, 1], i64), "ts": pa.array([0, 1_000_000], ts), "user_id": pa.array([1, 1], i64), "event_type": pa.array(["signup", "click"], s), "value": pa.array([1.0, None], f64), "props": pa.array(['{"k": 1}', None], s)}))
    w("documents", pa.table({"doc_id": pa.array([0, 1], i64), "text": pa.array(["", None], s), "lang": pa.array(["en", "en"], s), "source": pa.array(["src0", "src0"], s), "n_chars": pa.array([0, None], i64)}))
    w("embeddings", pa.table({"vec_id": pa.array([0, 1], i64), "embedding": pa.array([[0.0] * EMB_DIM, [1.0] + [0.0] * (EMB_DIM - 1)], pa.list_(pa.float32())), "label": pa.array([0, 1], i32)}))
    return out_dir
