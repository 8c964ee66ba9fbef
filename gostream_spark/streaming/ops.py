"""Streaming operators (SURVEY.md §2.7 T1/T4/T5/T6, §2.5 J9).

Each returns a streaming DataFrame; drive with
``runner.run_available_now``. Window/dedup semantics are the shared
``gostream_spark.operators`` expressions, so the batch oracles certify
them; what's added here is the streaming-only machinery: watermarks
(T4 — bound state and drop late rows), stream-static joins, and
arbitrary per-key state via applyInPandasWithState (T6 — the
reference's stateful bolt).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gostream_spark.operators import tumbling_windowed


def windowed_counts(
    events: DataFrame, duration: str = "1 day", watermark: str = "1 hour"
) -> DataFrame:
    """T1+T4: watermarked tumbling-window counts per event type. The
    watermark bounds window state: buckets older than
    max(event_time) - watermark are finalized and evicted — without it
    a 100 TB/day stream would hold every bucket forever."""
    with_wm = events.withWatermark("ts", watermark)
    return tumbling_windowed(
        with_wm,
        "ts",
        duration,
        keys=("event_type",),
        aggs=(F.count(F.lit(1)).alias("event_cnt"),),
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
    unbounded_state: bool = False,
) -> DataFrame:
    """T5: streaming dedup — keeps the first arrival per key.

    STATE GUARD (measured r11, API-enforced r12): with
    ``dropDuplicates(keys)`` Spark only expires dedup state when an
    EVENT-TIME column is among the keys — with pure id keys the
    seen-key state grows monotonically with distinct keys forever.
    The decade probe measured exactly that: state rows 100k → 2M
    across a 20-shard replay, never evicted, while the watermark here
    only gates LATE input rows. Because that failure mode is silent
    until an executor OOMs weeks into a production run, this helper
    REFUSES the unbounded form unless the caller passes
    ``unbounded_state=True`` (correct when the key space itself is
    bounded, e.g. replay-window dedup over a keyed retention set).
    For watermark-BOUNDED state instead: include ``ts_col`` in
    ``keys`` (exact-duplicate semantics — state rows evict with the
    watermark), or use ``dropDuplicatesWithinWatermark`` (the
    registered ``streaming_dedup_within_watermark`` twin; measured
    plateau ~100k vs the plain form's 1M-and-climbing on the same
    replay) when duplicates arrive within a bounded horizon."""
    if ts_col not in keys and not unbounded_state:
        raise ValueError(
            f"dedup_stream(keys={keys!r}) without the event-time column "
            f"{ts_col!r} among the keys accumulates seen-key state "
            "FOREVER (watermark evicts nothing; measured 1M-rows-"
            "monotone on the decade replay). Either add the event-time "
            "column to keys, use dropDuplicatesWithinWatermark for "
            "bounded-horizon duplicates, or pass unbounded_state=True "
            "to assert the key space itself is bounded."
        )
    return events.withWatermark(ts_col, watermark).dropDuplicates(keys)


def enrich_stream(events: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """J9: stream-static join — the static dim is broadcast to every
    micro-batch (stateless; no join state accumulates)."""
    return events.join(F.broadcast(dim), on, how)


_STATE_SCHEMA = StructType([StructField("cnt", LongType())])
_OUT_SCHEMA = StructType(
    [StructField("user_id", LongType()), StructField("n_events", LongType())]
)


def _count_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (cnt,) = state.get if state.exists else (0,)
    for pdf in pdfs:
        cnt += len(pdf)
    state.update((cnt,))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [cnt]})


def running_count_stateful(events: DataFrame) -> DataFrame:
    """T6: arbitrary per-key state — a running event count per user
    via ``applyInPandasWithState`` (the stateful bolt: user code, Arrow
    batches in, explicit state handle with optional timeouts). Emits
    the updated count for each key touched in each micro-batch; state
    lives in the executor-local state store keyed by user.

    Spark 4's newer ``transformWithStateInPandas`` (timers, TTL,
    composite state) is the intended upgrade, but its Python driver
    worker requires ``google.protobuf``, which this environment lacks
    (verified: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE
    ImportError; gate re-checked absent each round through r16 (2026-08-17))
    — on a cluster image with protobuf, swap this
    function's body for a StatefulProcessor with the same state
    schema; the operator contract is unchanged."""
    return events.groupBy("user_id").applyInPandasWithState(
        _count_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SET_STATE_SCHEMA = StructType([StructField("seen", StringType())])
_SET_OUT_SCHEMA = StructType(
    [StructField("user_id", LongType()), StructField("n_distinct_types", LongType())]
)


def _distinct_types_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # Set-valued state serialized as a sorted comma-joined string —
    # fixed schema, explicit growth (bounded by the event-type
    # vocabulary, not the event count).
    seen = set(state.get[0].split(",")) - {""} if state.exists else set()
    for pdf in pdfs:
        seen.update(pdf["event_type"].tolist())
    state.update((",".join(sorted(seen)),))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_distinct_types": [len(seen)]}
    )


def distinct_types_stateful(events: DataFrame) -> DataFrame:
    """T6 second shape: SET-valued per-key state (which event types
    has each user produced) via ``applyInPandasWithState`` — the
    dedup-within-key bolt. State size is bounded by the type
    vocabulary; the update-mode emission per micro-batch carries the
    running distinct count. Same protobuf-gated
    ``transformWithStateInPandas`` upgrade path as
    ``running_count_stateful``."""
    return events.groupBy("user_id").applyInPandasWithState(
        _distinct_types_fn,
        outputStructType=_SET_OUT_SCHEMA,
        stateStructType=_SET_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_EWMA_STATE_SCHEMA = StructType(
    [StructField("ewma", DoubleType()), StructField("n", LongType())]
)
_EWMA_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ewma", DoubleType()),
    ]
)


def _ewma_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    ewma, n = state.get if state.exists else (0.0, 0)
    # A group larger than arrow.maxRecordsPerBatch arrives as MULTIPLE
    # chunks in arbitrary shuffle order; an order-sensitive fold must
    # materialize the whole group and sort ONCE (group-at-a-time memory
    # is already the per-key state model's assumption).
    chunks = list(pdfs)
    if chunks:
        pdf = pd.concat(chunks)
        for v in pdf.sort_values(["ts", "event_id"])["value"].tolist():
            ewma = v if n == 0 else 0.5 * v + 0.5 * ewma
            n += 1
    state.update((ewma, n))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "ewma": [ewma]})


def ewma_stateful(events: DataFrame) -> DataFrame:
    """T6 third shape: NUMERIC recurrence state — a per-user running
    EWMA (half-decay) folded event by event inside
    ``applyInPandasWithState``. Unlike the count/set states, the value
    depends on fold ORDER, so the update materializes the group's
    Arrow chunks and sorts once by event time (chunk arrival order is
    arbitrary); every operation is an exact IEEE scaling (x0.5), so
    the result is bit-reproducible against any engine running the
    same fold. Same protobuf-gated ``transformWithStateInPandas``
    upgrade path as the other stateful ops."""
    return events.groupBy("user_id").applyInPandasWithState(
        _ewma_fn,
        outputStructType=_EWMA_OUT_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_TRANS_STATE_SCHEMA = StructType([StructField("last_type", StringType())])
_TRANS_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("prev_type", StringType()),
        StructField("next_type", StringType()),
        StructField("n", LongType()),
    ]
)


def _transition_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last_type = state.get[0] if state.exists and state.get[0] else None
    pairs: dict[tuple, int] = {}
    # Materialize + sort once across ALL chunks: multi-chunk groups
    # arrive in arbitrary order, and the prev->next pairing is
    # order-sensitive (same discipline as _ewma_fn).
    chunks = list(pdfs)
    if chunks:
        pdf = pd.concat(chunks)
        for t in pdf.sort_values(["ts", "event_id"])["event_type"].tolist():
            if last_type is not None:
                pairs[(last_type, t)] = pairs.get((last_type, t), 0) + 1
            last_type = t
    state.update((last_type if last_type is not None else "",))
    if pairs:
        ks = sorted(pairs)
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(ks),
                "prev_type": [p for p, _ in ks],
                "next_type": [n for _, n in ks],
                "n": [pairs[k] for k in ks],
            }
        )


def transition_counts_stateful(events: DataFrame) -> DataFrame:
    """T6 fourth shape: state that EMITS DERIVED EVENTS — the per-user
    last-event-type carries across micro-batches, and each batch emits
    the (prev → next) transition pairs it completes, including the
    pair that straddles the batch boundary (the case per-batch lag()
    cannot see). Downstream sums the partial counts; the batch oracle
    is the global lag()-derived transition matrix."""
    return events.groupBy("user_id").applyInPandasWithState(
        _transition_fn,
        outputStructType=_TRANS_OUT_SCHEMA,
        stateStructType=_TRANS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_TIMEOUT_STATE_SCHEMA = StructType([StructField("cnt", LongType())])
_TIMEOUT_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("closed", StringType()),
    ]
)


def _make_session_timeout_fn(timeout_ms: int):
    def _session_timeout_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (cnt,) = state.get
            state.remove()  # eviction: no re-arm, state is gone
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [cnt], "closed": ["timeout"]}
            )
            return
        (cnt,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            cnt += len(pdf)
        state.update((cnt,))
        # Activity re-arms the idle timer; the key is closed only
        # after timeout_ms of silence.
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [cnt], "closed": ["open"]}
        )

    return _session_timeout_fn


def session_timeout_stateful(events: DataFrame, timeout_ms: int = 500) -> DataFrame:
    """T6 with TIMERS: per-key counts whose state is CLOSED by a
    processing-time timeout — the idle-session eviction pattern
    (Storm's tick-driven state expiry). A key idle for ``timeout_ms``
    of processing time gets the timed-out callback: it emits a final
    'timeout' record and removes its state, which is how unbounded
    keyspaces stay bounded without watermark-eligible event time.
    (`transformWithStateInPandas` adds per-timer registration; this is
    the timeout form `applyInPandasWithState` supports in this
    environment — no protobuf needed.)

    MUST be driven by a processing-time trigger
    (``runner.run_until``), NOT ``availableNow``: under
    ProcessingTimeTimeout, FlatMapGroupsWithStateExec reports
    ``shouldRunAnotherBatch=True`` unconditionally (it cannot prove no
    timer will fire), so an availableNow run never reaches its stop
    condition and livelocks on no-data micro-batches. Timer-evicted
    pipelines are open-ended by construction; bound them by observed
    output, not input exhaustion."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_session_timeout_fn(timeout_ms),
        outputStructType=_TIMEOUT_OUT_SCHEMA,
        stateStructType=_TIMEOUT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


_CW_N = 5
_CW_STATE_SCHEMA = StructType(
    [StructField("win_no", LongType()), StructField("buf", StringType())]
)
_CW_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("win_no", LongType()),
        StructField("n_events", LongType()),
        StructField("win_start", StringType()),
        StructField("win_end", StringType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _count_window_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # Buffer = the <N pending events, serialized "ts_micro,cents"
    # pairs; win_no = completed windows so far. Incoming rows are
    # materialized and sorted ONCE per group (multi-chunk groups
    # arrive in arbitrary order — same discipline as _ewma_fn).
    win_no, buf = (state.get if state.exists else (0, ""))
    pending = [p for p in buf.split(";") if p]
    pdf = pd.concat(list(pdfs))
    pdf = pdf.sort_values(["ts", "event_id"])
    for _, row in pdf.iterrows():
        ts_micro = int(row["ts"].value // 1_000)
        cents = 0 if pd.isna(row["value"]) else int(round(row["value"] * 100))
        pending.append(f"{ts_micro},{cents}")
    out = []
    while len(pending) >= _CW_N:
        window, pending = pending[:_CW_N], pending[_CW_N:]
        ts_list = [int(p.split(",")[0]) for p in window]
        cent_sum = sum(int(p.split(",")[1]) for p in window)
        out.append(
            {
                "user_id": key[0],
                "win_no": win_no,
                "n_events": _CW_N,
                "win_start": pd.Timestamp(ts_list[0] * 1_000).strftime(
                    "%Y-%m-%d %H:%M:%S"
                ),
                "win_end": pd.Timestamp(ts_list[-1] * 1_000).strftime(
                    "%Y-%m-%d %H:%M:%S"
                ),
                "sum_value": round(cent_sum / 100.0, 2),
            }
        )
        win_no += 1
    state.update((win_no, ";".join(pending)))
    if out:
        yield pd.DataFrame(out)


def count_window_stateful(events: DataFrame) -> DataFrame:
    """T6 fifth shape: COUNT-based (tuple) windows — the Storm-style
    'every N tuples per key' window Structured Streaming has no
    built-in for. Per-key state buffers the <N pending events and a
    window counter; each full window of 5 emits once with its span
    and exact cent-sum, the remainder rides in state. State is O(N)
    per key by construction — the buffer can never exceed N-1
    events. Emission order inside a batch is deterministic because
    rows are sorted (ts, event_id) before folding; the batch twin
    `count_window_stats` certifies the semantics via exact oracle."""
    return events.select("user_id", "ts", "event_id", "value").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _count_window_fn,
        outputStructType=_CW_OUT_SCHEMA,
        stateStructType=_CW_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- T6 sixth shape: Space-Saving heavy-hitter sketch in state ----------

_SS_CAPACITY = 400  # >= 2/phi -> no false negatives at phi = 1/200
_SS_PHI_INV = 200
_SS_STATE_SCHEMA = StructType(
    [StructField("n_tokens", LongType()), StructField("summary", StringType())]
)
_SS_OUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("token", StringType()),
        StructField("est_cnt", LongType()),
        StructField("n_tokens", LongType()),
    ]
)


def _space_saving_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # Summary serialized as a JSON object {token: count}: JSON string
    # escaping is collision-proof for ARBITRARY token bytes (control
    # chars, quotes, non-ASCII), unlike any ad-hoc separator scheme —
    # a whitespace-split token may legally contain \x1e/\x1f.
    n, summary = state.get if state.exists else (0, "")
    counters: dict[str, int] = json.loads(summary) if summary else {}
    # No cross-chunk sort needed: Space-Saving's guarantees (no false
    # negatives above N/m, overestimate <= min-counter <= N/m) hold
    # for ANY arrival order — this fold is order-insensitive in its
    # contract, unlike the EWMA/transition folds above.
    for pdf in pdfs:
        # dropna: a null text row contributes no tokens (str.split on
        # NaN yields NaN, which would crash the inner iteration).
        for toks in pdf["text"].dropna().str.split(" "):
            for tok in toks:
                n += 1
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < _SS_CAPACITY:
                    counters[tok] = 1
                else:
                    # Evict the min counter (deterministic tie-break);
                    # the newcomer inherits its count + 1, preserving
                    # the overestimate invariant.
                    t_min = min(counters, key=lambda t: (counters[t], t))
                    c_min = counters.pop(t_min)
                    counters[tok] = c_min + 1
    state.update((n, json.dumps(counters, ensure_ascii=False)))
    thresh = -(-n // _SS_PHI_INV)  # ceil(n / 200)
    hh = sorted(
        (t, c) for t, c in counters.items() if c >= thresh
    )
    # ALWAYS emit a sentinel row (token NULL, est 0) so every
    # micro-batch's running n_tokens reaches the sink even when no
    # counter clears ceil(n/200) (near-uniform distributions with
    # n >> capacity leave every counter ~n/400 < threshold). Without
    # it the final summary for such a key would be empty or stale and
    # the downstream stream_total_ok verdict would flip to 0 on a
    # legal input. Tokens are str.split products (never NULL), so the
    # NULL token cannot collide with a candidate; est_cnt=0 passes the
    # overestimate bound vacuously (0 <= true_c + N/m).
    yield pd.DataFrame(
        {
            "source": [key[0]] * (len(hh) + 1),
            "token": [t for t, _ in hh] + [None],
            "est_cnt": [c for _, c in hh] + [0],
            "n_tokens": [n] * (len(hh) + 1),
        }
    )


def space_saving_stateful(docs: DataFrame) -> DataFrame:
    """T6 sixth shape: a SKETCH held in per-key state — Space-Saving
    (Metwally et al. 2005) heavy-hitter summaries per document source,
    the streaming twin of the batch two-pass
    ``queries.heavy_hitters.heavy_hitter_tokens``.

    State per key is a bounded m=400-counter summary plus the running
    token total — O(m) forever, however much text streams through,
    which is the whole point: continuous top-talker tracking over an
    unbounded stream with constant memory. Each micro-batch folds its
    documents' tokens into the summary and emits the key's current
    candidates at the phi = 0.5% threshold; with capacity m >= 2/phi
    the summary provably contains every true phi-heavy hitter
    (overestimates bounded by N/m), which the rows-only guarantee
    test asserts against exact batch counts."""
    return docs.select("source", "text").groupBy("source").applyInPandasWithState(
        _space_saving_fn,
        outputStructType=_SS_OUT_SCHEMA,
        stateStructType=_SS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- T6 seventh shape: EVENT-time (watermark-driven) session close ------

_ET_GAP_MS = 30 * 60 * 1000
_ET_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("cnt", LongType()),
    ]
)
_ET_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", StringType()),
        StructField("session_end", StringType()),
        StructField("event_cnt", LongType()),
    ]
)


def _fmt_ms(ms: int) -> str:
    import datetime as _dt

    return _dt.datetime.fromtimestamp(ms / 1000.0, tz=_dt.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def _event_session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    def row(st: int, last: int, cnt: int) -> dict:
        return {
            "user_id": key[0],
            "session_start": _fmt_ms(st),
            "session_end": _fmt_ms(last + _ET_GAP_MS),
            "event_cnt": cnt,
        }

    if state.hasTimedOut:
        st, last, cnt = state.get
        state.remove()  # watermark passed last+gap: the session closes
        yield pd.DataFrame([row(st, last, cnt)])
        return

    chunks = list(pdfs)
    pdf = pd.concat(chunks)
    # Order-sensitive fold: materialize + sort ONCE per group (the
    # multi-chunk lesson pinned for the EWMA/transition folds).
    ts_ms = (
        pdf.sort_values(["ts", "event_id"])["ts"].astype("int64") // 1_000_000
    ).tolist()
    st_last_cnt = state.get if state.exists else None
    st, last, cnt = st_last_cnt if st_last_cnt else (None, None, 0)
    out = []
    for t in ts_ms:
        if st is None:
            st, last, cnt = t, t, 1
        elif t - last >= _ET_GAP_MS:
            out.append(row(st, last, cnt))  # in-batch gap close
            st, last, cnt = t, t, 1
        else:
            last, cnt = t, cnt + 1
    state.update((st, last, cnt))
    # Arm the event-time timer: fire when the WATERMARK (not wall
    # clock) passes the session's inactivity horizon.
    state.setTimeoutTimestamp(last + _ET_GAP_MS)
    if out:
        yield pd.DataFrame(out)


def event_session_stateful(events: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """T6 seventh shape: EventTimeTimeout — sessions closed by the
    WATERMARK, completing the GroupStateTimeout matrix (NoTimeout /
    ProcessingTimeTimeout / EventTimeTimeout). Per-user state holds
    the open session (start, last, count); a gap inside a batch
    closes in-line, and the armed ``setTimeoutTimestamp(last + gap)``
    timer closes idle sessions when the watermark passes that
    horizon — deterministic replay-stable closure, unlike the
    wall-clock ProcessingTime variant. Under availableNow the final
    no-data micro-batch (watermark advanced to max event time) fires
    all timers whose horizon the watermark passed, so the emitted set
    equals the batch sessionization minus each user's still-open tail
    session — an exact, SQL-expressible contract."""
    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _event_session_fn,
            outputStructType=_ET_OUT_SCHEMA,
            stateStructType=_ET_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


_LINDLEY_STATE_SCHEMA = StructType(
    [
        StructField("balance", LongType()),
        StructField("max_balance", LongType()),
        StructField("n_clamped", LongType()),
        StructField("n", LongType()),
    ]
)
_LINDLEY_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("final_balance", LongType()),
        StructField("max_balance", LongType()),
        StructField("n_clamped", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _lindley_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    bal, mx, clamps, n = state.get if state.exists else (0, 0, 0, 0)
    chunks = list(pdfs)
    if chunks:
        # order-sensitive fold: materialize the group, sort ONCE
        pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
        for d in pdf["delta"].tolist():
            nxt = bal + int(d)
            if nxt < 0:
                nxt, clamps = 0, clamps + 1
            bal = nxt
            mx = max(mx, bal)
            n += 1
    state.update((bal, mx, clamps, n))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "final_balance": [bal],
            "max_balance": [mx],
            "n_clamped": [clamps],
            "n_events": [n],
        }
    )


def lindley_stateful(events_with_delta: DataFrame) -> DataFrame:
    """T6 fifth shape: the floor-clamped running balance
    b_t = max(0, b_{t-1} + delta_t) folded LITERALLY in per-key state
    — the sequential recurrence the batch twin
    (``inventory_lindley_balance``) replaces with its closed-form
    window algebra. Input must carry (user_id, ts, event_id, delta);
    all arithmetic is exact Python ints over BIGINT cents, so the
    streaming fold and the batch closed form agree bit for bit — the
    two are oracle-checked against the SAME DuckDB SQL. Same
    protobuf-gated ``transformWithStateInPandas`` upgrade path as the
    sibling stateful ops."""
    return events_with_delta.groupBy("user_id").applyInPandasWithState(
        _lindley_fn,
        outputStructType=_LINDLEY_OUT_SCHEMA,
        stateStructType=_LINDLEY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- T6 seventh shape: duration-capped sessions in state ----------------

_CS_GAP_US = 1_800 * 1_000_000
_CS_LEN_US = 7_200 * 1_000_000
_CS_STATE_SCHEMA = StructType(
    [
        StructField("anchor_us", LongType()),
        StructField("prev_us", LongType()),
        StructField("session_no", LongType()),
        StructField("cur_start_us", LongType()),
        StructField("cur_count", LongType()),
    ]
)
_CS_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_no", LongType()),
        StructField("n_events", LongType()),
        StructField("session_start", StringType()),
        StructField("session_end", StringType()),
    ]
)


def _capped_session_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Sequential capped-session recurrence held in per-key state:
    a session CLOSES (and emits) when the next event's gap exceeds
    30 min or the span from the session anchor would exceed the 2 h
    cap. The open session rides in state across micro-batches; it
    never emits (matching the exact oracle, which drops each user's
    last session). Integer-microsecond math throughout."""

    def fmt(us: int) -> str:
        return pd.Timestamp(us, unit="us").strftime("%Y-%m-%d %H:%M:%S")

    if state.exists:
        anchor, prev, sess_no, cur_start, cur_count = state.get
    else:
        anchor = prev = cur_start = None
        sess_no, cur_count = 0, 0
    out = []
    # Order-sensitive fold: materialize ALL Arrow chunks and sort once
    # (chunk arrival order is arbitrary — same discipline as _ewma_fn).
    chunks = list(pdfs)
    if chunks:
        pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
        for us in pdf["ts"].astype("datetime64[us]").astype("int64"):
            if (
                anchor is None
                or us - prev > _CS_GAP_US
                or us - anchor > _CS_LEN_US
            ):
                if anchor is not None:
                    out.append(
                        (key[0], sess_no, cur_count, fmt(cur_start), fmt(prev))
                    )
                sess_no += 1
                anchor = us
                cur_start = us
                cur_count = 0
            cur_count += 1
            prev = us
    state.update((anchor, prev, sess_no, cur_start, cur_count))
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "session_no",
                "n_events",
                "session_start",
                "session_end",
            ],
        )


def capped_session_stateful(events: DataFrame) -> DataFrame:
    """T6 seventh shape: the duration-capped session rule
    (gap OR max-length split — not window-expressible; see the batch
    twin `queries.event_time.session_window_capped`) as per-key
    streaming state. State is five integers per user — O(1) forever —
    and each micro-batch folds its events into the open session,
    emitting only sessions it CLOSED."""
    return events.select("user_id", "ts", "event_id").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _capped_session_state_fn,
        outputStructType=_CS_OUT_SCHEMA,
        stateStructType=_CS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
