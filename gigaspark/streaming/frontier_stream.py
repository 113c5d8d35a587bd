"""Structured-Streaming frontier: the spider loop as a continuous job
(SURVEY §2.9 ST1 stretch — Gigablast's ``SpiderLoop`` reactor [U][H]
re-expressed as ``readStream → stateless prep → stateful politeness →
writeStream``).

Per micro-batch:
  * stateless stage (identical code to the batch path): canonicalize →
    hash → url-filter when-chain → robots gate — all Column exprs +
    one Arrow pandas UDF;
  * stateful stage: ``groupBy(firstip).applyInPandasWithState`` with
    per-host state (politeness clock ``next_ok_ms`` + pending queue +
    seen keys).  Each batch drains up to ``max_spiders_per_ip`` eligible
    URLs per host in (priority desc, added asc, hop asc, hash asc)
    order — the A1/Doledb semantics — and advances the host clock by
    fetch + max(same_ip_wait, crawl_delay).

Respider (J1/W4 parity with the batch loop): with ``respider=True``
every fired URL RE-ENTERS its host's queue at ``gen+1`` with
``added = due = slot_end + spider_freq_ms`` — wait, pinned exactly as
the batch engine does it: ``added_ms = spidered_ms`` and ``due_ms =
spidered_ms + spider_freq_ms`` (backoff multiplier 1; the
EDOCUNCHANGED doubling is batch-only for now, documented).  Host time
advances to ``max(next_ok, min pending due)`` — for a single host this
is EXACTLY the batch scheduler's general clock rule (oracle step 7'),
so stream↔batch parity holds including re-spiders
(tests/test_stream_batch_parity.py).  Pinned deviation: the batch loop
RE-EVALUATES the url-filter chain at each re-entry (is_indexed /
percentchangedperday rules); the streaming state function carries the
row's assigned (priority, freq) unchanged, which is exact for
rule-stable universes (single default rule) and documented as the
streaming subset.

Implementation note: PySpark 4.1 also offers
``transformWithStateInPandas`` (ValueState/ListState handles), but its
state server requires protobuf, which this sandbox does not ship —
verified by a live repro (ImportError: google.protobuf).  The
``applyInPandasWithState`` GroupState path is Arrow-native and runs
everywhere; the per-host state tuple packs the queue into numpy-backed
arrays (no per-row Python object churn in state I/O).

Scale notes: state is keyed by firstip — the exact sharding Gigablast
uses (``Hostdb::getShardNum`` on the Spiderdb key's firstIp [U][H]), so
one host's politeness decisions are always local to one executor.  The
pending queue per host is bounded by ``max_pending`` with
lowest-priority overflow dropped (backpressure — a deliberate,
documented deviation from the unbounded batch frontier).

The batch scheduler (operators/frontier.py) remains the golden-order
engine; this streaming variant trades exact global-round ordering for
continuous operation while preserving the invariants tested in
tests/test_streaming.py: politeness gaps, per-host priority order, and
exactly-once URL emission per generation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "firstip int, urlhash48 long, url string, priority int, hopcount int,"
    " added_ms long, scheduled_time_ms long, batch_seq int, gen int"
)

# per-host state: clock + parallel arrays for the pending queue + seen set
STATE_SCHEMA = (
    "next_ok_ms bigint, p_hash array<bigint>, p_url array<string>,"
    " p_prio array<int>, p_hop array<int>, p_added array<bigint>,"
    " p_wait array<bigint>, p_k array<int>, p_delay array<bigint>,"
    " p_gen array<int>, p_due array<bigint>, p_freq array<bigint>,"
    " seen array<bigint>"
)

_PEND_FIELDS = ("p_hash", "p_url", "p_prio", "p_hop", "p_added",
                "p_wait", "p_k", "p_delay", "p_gen", "p_due", "p_freq")

# pend tuple layout
_H, _URL, _PRIO, _HOP, _ADDED, _WAIT, _K, _DELAY, _GEN, _DUE, _FREQ = range(11)


def make_drain_fn(fetch_ms: int = 100, max_pending: int = 100_000,
                  respider: bool = False):
    """Build the per-host stateful drain function (closure over config).

    Input rows need (urlhash48, url, priority, hopcount, added_ms,
    same_ip_wait_ms, max_spiders_per_ip, crawl_delay_ms) and, when
    ``respider`` is on, ``spider_freq_ms``."""

    def drain(key, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        firstip = int(key[0])
        if state.exists:
            st = state.get
            next_ok = st[0]
            pend = [tuple(col[i] for col in st[1:12])
                    for i in range(len(st[1]))]
            seen = set(st[12])
        else:
            next_ok, pend, seen = 0, [], set()

        pend_keys = {p[_H] for p in pend}
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                h = int(row.urlhash48)
                if h in seen or h in pend_keys:
                    continue
                pend_keys.add(h)
                freq = int(getattr(row, "spider_freq_ms", 0)) if respider else 0
                pend.append((h, row.url, int(row.priority), int(row.hopcount),
                             int(row.added_ms), int(row.same_ip_wait_ms),
                             int(row.max_spiders_per_ip),
                             int(row.crawl_delay_ms), 0, 0, freq))

        # A1 drain order: (priority desc, added asc, hop asc, hash asc)
        pend.sort(key=lambda p: (-p[_PRIO], p[_ADDED], p[_HOP], p[_H]))
        if len(pend) > max_pending:          # bounded-queue backpressure
            pend = pend[:max_pending]

        out = []
        if pend:
            # host clock = max(next_ok, min pending due) — the batch
            # scheduler's general clock rule (oracle step 7') restricted
            # to this host; due≡0 when respider is off reduces it to the
            # old fast path
            t = max(int(next_ok), 0, min(p[_DUE] for p in pend))
            elig = [p for p in pend if p[_DUE] <= t]
            if elig:
                k = max(1, elig[0][_K])
                fired = elig[:k]
                fired_set = set(map(id, fired))
                pend = [p for p in pend if id(p) not in fired_set]
                for i, p in enumerate(fired):
                    out.append((firstip, p[_H], p[_URL], p[_PRIO], p[_HOP],
                                p[_ADDED], t, i, p[_GEN]))
                    seen.add(p[_H])
                    spidered = t + fetch_ms
                    if respider:
                        # gen-versioned re-entry (J1/W4): added=spidered,
                        # due=spidered+freq, same assignment carried
                        pend.append((p[_H], p[_URL], p[_PRIO], p[_HOP],
                                     spidered, p[_WAIT], p[_K], p[_DELAY],
                                     p[_GEN] + 1, spidered + p[_FREQ],
                                     p[_FREQ]))
                    t += fetch_ms + max(p[_WAIT], p[_DELAY])
                next_ok = t

        cols = (list(zip(*pend)) if pend
                else [[] for _ in _PEND_FIELDS])
        state.update((int(next_ok),
                      *[list(c) for c in cols],
                      sorted(seen)))
        yield pd.DataFrame(
            out, columns=["firstip", "urlhash48", "url", "priority",
                          "hopcount", "added_ms", "scheduled_time_ms",
                          "batch_seq", "gen"])

    return drain


def streaming_schedule(prepped: DataFrame, fetch_ms: int = 100,
                       max_pending: int = 100_000,
                       respider: bool = False) -> DataFrame:
    """prepped: a STREAMING DF with columns (firstip, urlhash48, url,
    priority, hopcount, added_ms, same_ip_wait_ms, max_spiders_per_ip,
    crawl_delay_ms[, spider_freq_ms]) — i.e. the stateless stage's
    output.  Returns the continuously-drained schedule."""
    return (
        prepped.groupBy("firstip")
        .applyInPandasWithState(
            make_drain_fn(fetch_ms, max_pending, respider),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
