"""Property-based tests (hypothesis) for the operator library —
semantic invariants on randomized inputs, complementing the
fixture-oracle gate. Few examples per property (each example runs a
Spark job); deadline disabled accordingly."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gostream_spark.operators import keep_first, tumbling_windowed
from gostream_spark.operators.ranking import topk_per_group

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),     # key
        st.integers(min_value=0, max_value=100),   # ord
        st.integers(min_value=0, max_value=1000),  # payload
    ),
    min_size=1,
    max_size=40,
)


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_keep_first_is_min_per_key(spark, rows):
    df = spark.createDataFrame(rows, "k INT, o INT, v INT")
    out = keep_first(df, keys=["k"], order_by=["o", "v"]).collect()
    got = {r.k: (r.o, r.v) for r in out}
    want = {}
    for k, o, v in rows:
        if k not in want or (o, v) < want[k]:
            want[k] = (o, v)
    assert len(out) == len(want)
    assert got == want


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_keep_first_is_idempotent(spark, rows):
    df = spark.createDataFrame(rows, "k INT, o INT, v INT")
    once = keep_first(df, keys=["k"], order_by=["o", "v"])
    twice = keep_first(once, keys=["k"], order_by=["o", "v"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_topk_per_group_is_true_topk(spark, rows):
    df = spark.createDataFrame(rows, "k INT, o INT, v INT")
    out = topk_per_group(
        df, 3, partition_by=["k"], order_by=[F.col("o").desc(), F.col("v").desc()]
    ).collect()
    by_key: dict[int, list[tuple[int, int]]] = {}
    for k, o, v in rows:
        by_key.setdefault(k, []).append((o, v))
    for k, vals in by_key.items():
        want = sorted(vals, reverse=True)[:3]
        got = sorted(((r.o, r.v) for r in out if r.k == k), reverse=True)
        assert got == want


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),        # user/key
        st.integers(min_value=0, max_value=10_000),   # ts offset seconds
        st.booleans(),                                 # is_probe (else build)
    ),
    min_size=1,
    max_size=30,
)


@given(evs=events_strategy)
@settings(**_SETTINGS)
def test_asof_join_attaches_latest_earlier_build(spark, evs):
    from gostream_spark.operators import asof_join

    base = datetime(2024, 1, 1)
    # microsecond-unique timestamps: the operator's tie behavior at
    # identical (ts) is deterministic but intentionally unspecified
    rows = [
        (i, k, base + timedelta(seconds=s, microseconds=i), "p" if probe else "b")
        for i, (k, s, probe) in enumerate(evs)
    ]
    df = spark.createDataFrame(rows, "event_id INT, k INT, ts TIMESTAMP, typ STRING")
    out = asof_join(
        df,
        key="k",
        ts="ts",
        probe_filter=F.col("typ") == "p",
        build_filter=F.col("typ") == "b",
        carry=["event_id", "ts"],
    ).collect()
    by_id = {r[0]: r for r in rows}
    for r in out:
        assert r.typ == "p"
        if r.asof_event_id is None:
            # no build row at-or-before this probe for the same key
            assert not any(
                rr[1] == r.k and rr[3] == "b" and rr[2] <= r.ts for rr in rows
            )
        else:
            build = by_id[r.asof_event_id]
            assert build[3] == "b" and build[1] == r.k
            assert build[2] <= r.ts
            # latest: no other build row strictly between
            assert not any(
                rr[1] == r.k and rr[3] == "b" and build[2] < rr[2] <= r.ts
                for rr in rows
            )


@given(
    offsets=st.lists(
        st.integers(min_value=0, max_value=72 * 3600 - 1), min_size=1, max_size=40
    )
)
@settings(**_SETTINGS)
def test_tumbling_windows_partition_rows(spark, offsets):
    """Every row lands in exactly one epoch-aligned hourly bucket:
    counts sum to the input size and each bucket matches the floor of
    its members' timestamps."""
    base = datetime(2024, 1, 1)
    rows = [(i, base + timedelta(seconds=s)) for i, s in enumerate(offsets)]
    df = spark.createDataFrame(rows, "id INT, ts TIMESTAMP")
    out = tumbling_windowed(
        df, "ts", "1 hour", aggs=(F.count(F.lit(1)).alias("cnt"),)
    ).collect()
    assert sum(r.cnt for r in out) == len(rows)
    want: dict[datetime, int] = {}
    for _, s in enumerate(offsets):
        start = base + timedelta(hours=s // 3600)
        want[start] = want.get(start, 0) + 1
    got = {r.w.start: r.cnt for r in out}
    assert got == want
    for r in out:
        assert (r.w.end - r.w.start) == timedelta(hours=1)


docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["alpha", "bravo", "charlie", "delta", "echo", "fox"]),
        min_size=3,
        max_size=10,
    ).map(" ".join),
    min_size=2,
    max_size=12,
)


@given(texts=docs_strategy)
@settings(**_SETTINGS)
def test_minhash_bands_collide_for_exact_duplicates(spark, texts):
    """LSH candidate guarantee: documents with identical text have
    identical MinHash signatures, hence identical hashes in EVERY
    band — an exact duplicate can never escape candidate generation.
    (The converse — distinct docs rarely colliding — is statistical,
    not asserted.)"""
    from gostream_spark.queries.llm_similarity import _minhash_md5_sig

    # Force at least one duplicate pair.
    texts = texts + [texts[0]]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )
    toks = F.split("text", " ")
    n = F.size(toks)
    shingles = F.array_distinct(
        F.zip_with(
            F.slice(toks, 1, n - 2),
            F.zip_with(
                F.slice(toks, 2, n - 2), F.slice(toks, 3, n - 2),
                lambda x, y: F.concat(x, F.lit(" "), y),
            ),
            lambda x, yz: F.concat(x, F.lit(" "), yz),
        )
    )
    sig = df.select("doc_id", "text", shingles.alias("sh")).select(
        "doc_id",
        "text",
        *[
            F.md5(
                F.concat(
                    _minhash_md5_sig(F.col("sh"), 2 * b),
                    _minhash_md5_sig(F.col("sh"), 2 * b + 1),
                )
            ).alias(f"band{b}")
            for b in range(4)
        ],
    )
    rows = sig.collect()
    by_text = {}
    for r in rows:
        bands = (r.band0, r.band1, r.band2, r.band3)
        by_text.setdefault(r.text, set()).add(bands)
    # identical text -> identical band tuple, for every text
    assert all(len(v) == 1 for v in by_text.values())
