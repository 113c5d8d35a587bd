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
exactly-once URL emission.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "firstip int, urlhash48 long, url string, priority int, hopcount int,"
    " added_ms long, scheduled_time_ms long, batch_seq int"
)

# per-host state: clock + parallel arrays for the pending queue + seen set
STATE_SCHEMA = (
    "next_ok_ms bigint, p_hash array<bigint>, p_url array<string>,"
    " p_prio array<int>, p_hop array<int>, p_added array<bigint>,"
    " p_wait array<bigint>, p_k array<int>, p_delay array<bigint>,"
    " seen array<bigint>"
)

_PEND_FIELDS = ("p_hash", "p_url", "p_prio", "p_hop", "p_added",
                "p_wait", "p_k", "p_delay")


def make_drain_fn(fetch_ms: int = 100, max_pending: int = 100_000):
    """Build the per-host stateful drain function (closure over config)."""

    def drain(key, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        firstip = int(key[0])
        if state.exists:
            (next_ok, p_hash, p_url, p_prio, p_hop, p_added, p_wait, p_k,
             p_delay, seen_l) = state.get
            pend = list(zip(p_hash, p_url, p_prio, p_hop, p_added,
                            p_wait, p_k, p_delay))
            seen = set(seen_l)
        else:
            next_ok, pend, seen = 0, [], set()

        pend_keys = {p[0] for p in pend}
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                h = int(row.urlhash48)
                if h in seen or h in pend_keys:
                    continue
                pend_keys.add(h)
                pend.append((h, row.url, int(row.priority), int(row.hopcount),
                             int(row.added_ms), int(row.same_ip_wait_ms),
                             int(row.max_spiders_per_ip), int(row.crawl_delay_ms)))

        # A1 drain order: (priority desc, added asc, hop asc, hash asc)
        pend.sort(key=lambda p: (-p[2], p[4], p[3], p[0]))
        if len(pend) > max_pending:          # bounded-queue backpressure
            pend = pend[:max_pending]

        out = []
        if pend:
            k = max(1, pend[0][6])
            t = max(int(next_ok), 0)
            fired, pend = pend[:k], pend[k:]
            for i, p in enumerate(fired):
                out.append((firstip, p[0], p[1], p[2], p[3], p[4], t, i))
                seen.add(p[0])
                t += fetch_ms + max(p[5], p[7])
            next_ok = t

        cols = (list(zip(*pend)) if pend
                else [[] for _ in _PEND_FIELDS])
        state.update((int(next_ok), list(cols[0]), list(cols[1]),
                      list(cols[2]), list(cols[3]), list(cols[4]),
                      list(cols[5]), list(cols[6]), list(cols[7]),
                      sorted(seen)))
        yield pd.DataFrame(
            out, columns=["firstip", "urlhash48", "url", "priority",
                          "hopcount", "added_ms", "scheduled_time_ms",
                          "batch_seq"])

    return drain


def streaming_schedule(prepped: DataFrame, fetch_ms: int = 100,
                       max_pending: int = 100_000) -> DataFrame:
    """prepped: a STREAMING DF with columns (firstip, urlhash48, url,
    priority, hopcount, added_ms, same_ip_wait_ms, max_spiders_per_ip,
    crawl_delay_ms) — i.e. the stateless stage's output.  Returns the
    continuously-drained schedule."""
    return (
        prepped.groupBy("firstip")
        .applyInPandasWithState(
            make_drain_fn(fetch_ms, max_pending),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
