"""Single-threaded pure-Python crawl-order oracle (SURVEY §5.2.1).

The executable spec standing in for the absent C++ reference (the
checkout at /root/reference is EMPTY — SURVEY §0): implements the PINNED
Spiderdb-derived semantics of SURVEY §3.1 exactly, and the Spark engine
(gigaspark.operators.frontier) must reproduce its emitted crawl order and
URL-seen set bit-for-bit.  Shares the canonicalizer / hashes / filter
and robots backends with the engine so both sides evaluate identical
rules; what THIS file independently defines is the scheduling semantics:

  round semantics (virtual clock T, start 0):
    1. pending = frontier URLs not yet fetched; host next_ok defaults 0
    2. winners: per host with next_ok ≤ T, top-``k_host`` pending URLs by
       (priority desc, added_ms asc, hopcount asc, urlhash48 asc), where
       k_host = max_spiders_per_ip of that host's top-ranked URL
       (Gigablast maxSpidersPerIp analogue: slots chosen before this
       round's discoveries become visible)
    3. slot times: slot 0 at T; slot i at slot_{i-1} + fetch_ms +
       max(same_ip_wait(slot_{i-1}), crawl_delay(host));
       next_ok = last_slot + fetch_ms + max(wait_last, crawl_delay)
    4. emission order within a round: (scheduled_time_ms asc, priority
       desc, added_ms asc, urlhash48 asc); rounds concatenate
    5. outlinks of ALL fetched URLs (harvest_links rules only) enqueue at
       round end with added_ms = own slot time + fetch_ms, hop+1
    6. enqueue: canonicalize → batch-dedup on (firstip, urlhash48)
       keeping (min hop, min added, min url, any is_seed) → url_filters
       first-match (drop priority<0 / force_delete) → robots longest-
       match (drop disallowed) → drop keys already accepted (seen set);
       dropped URLs do NOT enter seen (re-discovery re-evaluates);
       first-accepted-wins (no cross-round hopcount coalescing — pinned
       deviation from Gigablast's re-add min [M], SURVEY §7.4.6)
    7. clock: T ← max(T, min over pending rows of max(next_ok[ip],
       due_ms)); due_ms ≡ 0 when respider is off, reducing to the round-1
       rule (min over pending hosts of next_ok)

  respider mode (``respider=True`` — Spider.cpp::scanSpiderdb pairing
  request⋈latest-reply + getUrlFilterNum re-eval [U][H], SURVEY §3.1):
    8. every fetch writes an implicit reply at spidered_ms = slot + fetch
       and the URL re-enters the frontier at gen+1 with
       due_ms = spidered_ms + int(spider_freq_days * 86_400_000.0), where
       the filter row is RE-EVALUATED with is_indexed=true and
       percentchangedperday = urlhash48 % 101 (pinned deterministic
       change signal); re-eval priority<0 or force_delete → retired.
       Robots are NOT re-checked (pinned: discovery-time gate only).
       Re-entry uses added_ms = spidered_ms for A1 ordering; the seen set
       is untouched (key already present).
    2'. winner candidates exclude rows with due_ms > T.

  error-retry mode (``err_mod > 0`` — SpiderReply::m_errCode + errorcount
  retry loop, hastmperror/errorcount filter predicates [U][M]):
    9. a fetch FAILS iff urlhash48 % err_mod == 0 (pinned deterministic
       "tmperror" signal).  Failed fetches occupy their slot (the HTTP
       round-trip happened) but harvest no links and take no respider
       success path; instead the URL re-enters at gen+1 with
       errorcount+1, added_ms = spidered_ms, due_ms = spidered_ms +
       retry_wait_ms, filter row RE-EVALUATED with the new errorcount
       (rules like ``errorcount>=3`` → -3 give up; ``hastmperror``
       matches any retry row).  Robots not re-checked.

  site-quota mode (``site_quota > 0`` — Tagdb sitepages quota,
  XmlDoc quota check [U][L]; site pinned to firstip):
    10. at round START, every pending row of a host whose SUCCESSFUL
        emission count has reached the quota is retired (metric
        quota_dropped).  Error emissions do not count toward quota.

  redirect mode (``redirects.parquet`` fixture present —
  XmlDoc::getRedirUrl / Msg13 redirect following [U][M]; pinned to a
  deterministic src_url→dst_url map instead of live HTTP):
    11. a SUCCESSFUL fetch whose canonical URL appears in the redirect
        map is a redirect reply: it occupies its slot (the HTTP
        round-trip happened) but harvests no links, takes no respider
        path, and does NOT count toward site quota (nothing was
        indexed).  The TARGET enqueues at round end through the normal
        pipeline (canonicalize → filters → robots → seen-dedup) with
        hopcount UNCHANGED (Gigablast treats the target as the same
        doc), added_ms = spidered_ms, is_seed inherited.  Chains
        resolve across rounds; loops terminate via the seen set (the
        target of the closing hop is already seen → dup_seen).  Error
        precedence: the err_mod failure signal wins — a failed
        round-trip never observes a redirect.

  content-dedup mode (``content_map.parquet`` fixture present —
  XmlDoc's EDOCDUP content-hash check at index time, getIsDup /
  m_contentHash32 dup-docid lookup [U][M]; pinned to a deterministic
  url→content_hash map, URLs absent from the map hash to their own
  urlhash48 i.e. unique content):
    12. a SUCCESSFUL, non-redirect fetch whose content hash was already
        INDEXED by a DIFFERENT url (hash owner ≠ this urlhash48) is a
        dup reply: it occupies its slot but harvests no links, takes no
        respider path, and does not count toward site quota (nothing
        was indexed).  The FIRST fetch of each content hash — in global
        emission order — indexes normally and becomes the hash's owner;
        a respider re-fetch by the owner itself is NOT a dup (Gigablast
        dups are cross-docid only).  Precedence: error > redirect > dup
        — a failed or redirected round-trip never observes content.

  unchanged-backoff mode (``unchanged_backoff=True``, requires respider
  — XmlDoc EDOCUNCHANGED: a re-download whose content hash matches the
  stored doc skips reindexing and stretches the next spider time
  [U][M]; change signal pinned deterministic):
    13. every successful indexed re-fetch observes a pinned change
        signal: UNCHANGED iff gen > 0 and (urlhash48 + gen) % 3 == 0
        (a first fetch, gen 0, is always "changed" — the doc is new).
        The re-entry carries an interval multiplier ``backoff``:
        unchanged → backoff = min(prev*2, backoff_cap); changed →
        backoff = 1.  due_ms = spidered + int(spider_freq_days *
        MS_PER_DAY) * backoff.  Errors and redirects never touch the
        carried backoff.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow.parquet as pq

from gigaspark.functions.urls import (
    canonicalize_url, py_firstip, py_host, py_path, py_urlhash48,
)
from gigaspark.operators.robots import RobotsOracle
from gigaspark.operators.url_filters import Rule, eval_rules_py, rules_from_rows

FETCH_MS = 100


@dataclass
class Req:
    url: str
    host: str
    path: str
    firstip: int
    urlhash48: int
    hopcount: int
    added_ms: int
    is_seed: bool
    priority: int = 0
    same_ip_wait_ms: int = 0
    harvest_links: bool = True
    max_spiders_per_ip: int = 1
    ufn: int = -1
    gen: int = 0
    due_ms: int = 0
    errorcount: int = 0
    backoff: int = 1


@dataclass
class Emit:
    seq: int
    urlhash48: int
    url: str
    firstip: int
    priority: int
    scheduled_time_ms: int
    hopcount: int
    rnd: int


@dataclass
class SimResult:
    emitted: list[Emit]
    seen: dict[tuple[int, int], tuple[int, int]]  # key → (min_hopcount, round_enqueued)
    metrics: list[dict] = field(default_factory=list)


def _load(fix_dir: str, name: str) -> list[dict]:
    return pq.read_table(os.path.join(fix_dir, f"{name}.parquet")).to_pylist()


MS_PER_DAY = 86_400_000


class OracleSim:
    def __init__(self, fix_dir: str, fetch_ms: int = FETCH_MS,
                 respider: bool = False, err_mod: int = 0,
                 retry_wait_ms: int = 60_000, site_quota: int = 0,
                 unchanged_backoff: bool = False, backoff_cap: int = 32):
        self.fetch_ms = fetch_ms
        self.respider = respider
        self.err_mod = err_mod
        self.retry_wait_ms = retry_wait_ms
        self.site_quota = site_quota
        self.unchanged_backoff = unchanged_backoff
        self.backoff_cap = backoff_cap
        self.site_emitted: dict[int, int] = {}
        self.seeds = _load(fix_dir, "seeds")
        self.link_graph = {r["src_url"]: r["dst_urls"] for r in _load(fix_dir, "link_graph")}
        self.robots = RobotsOracle(_load(fix_dir, "robots"))
        self.rules: list[Rule] = rules_from_rows(_load(fix_dir, "url_filters"))
        # step 11 — optional deterministic redirect map (src canonical)
        rpath = os.path.join(fix_dir, "redirects.parquet")
        self.redirects: dict[str, str] | None = (
            {r["src_url"]: r["dst_url"] for r in _load(fix_dir, "redirects")}
            if os.path.exists(rpath) else None)
        # step 12 — optional deterministic content-hash map (url canonical)
        cpath = os.path.join(fix_dir, "content_map.parquet")
        self.content_map: dict[str, int] | None = (
            {r["url"]: int(r["content_hash"]) for r in _load(fix_dir, "content_map")}
            if os.path.exists(cpath) else None)
        self.indexed_ch: dict[int, int] = {}  # content_hash → owner urlhash48
        # steps 8'/13' — optional PER-GENERATION content hashes (url,
        # gen, content_hash): the change signals become content-driven
        # (SpiderReply::m_percentChangedPerDay semantics [U][M]) instead
        # of the pinned urlhash arithmetic; URLs/gens absent from the
        # table hash to urlhash48 (stable content)
        gpath = os.path.join(fix_dir, "content_gens.parquet")
        self.content_gens: dict[tuple[str, int], int] | None = (
            {(r["url"], int(r["gen"])): int(r["content_hash"])
             for r in _load(fix_dir, "content_gens")}
            if os.path.exists(gpath) else None)
        self.frontier: dict[tuple[int, int], Req] = {}
        self.seen: dict[tuple[int, int], tuple[int, int]] = {}
        self.next_ok: dict[int, int] = {}
        self.T = 0
        self.rnd = 0
        self.emitted: list[Emit] = []
        self.metrics: list[dict] = []

    # ---- enqueue (step 6) --------------------------------------------------
    def enqueue(self, raw: list[tuple[str, int, int, bool]]) -> dict:
        """raw: (raw_url, hopcount, added_ms, is_seed)."""
        batch: dict[tuple[int, int], Req] = {}
        for raw_url, hop, added, is_seed in raw:
            url = canonicalize_url(raw_url)
            host = py_host(url)
            req = Req(url=url, host=host, path=py_path(url),
                      firstip=py_firstip(host), urlhash48=py_urlhash48(url),
                      hopcount=hop, added_ms=added, is_seed=is_seed)
            key = (req.firstip, req.urlhash48)
            old = batch.get(key)
            if old is None:
                batch[key] = req
            else:
                old.hopcount = min(old.hopcount, req.hopcount)
                old.added_ms = min(old.added_ms, req.added_ms)
                old.url = min(old.url, req.url)
                old.is_seed = old.is_seed or req.is_seed
                old.host = py_host(old.url)
                old.path = py_path(old.url)
        m = {"candidates": len(raw), "deduped": len(batch), "filtered": 0,
             "tombstoned": 0, "robots_denied": 0, "dup_seen": 0, "accepted": 0}
        for key, req in batch.items():
            a = eval_rules_py(self.rules, {
                "url": req.url, "host": req.host, "path": req.path,
                "hopcount": req.hopcount, "errorcount": 0, "is_seed": req.is_seed,
            })
            if a["force_delete"]:
                m["tombstoned"] += 1
                continue
            if a["priority"] < 0:
                m["filtered"] += 1
                continue
            if not self.robots.allowed(req.host, req.path):
                m["robots_denied"] += 1
                continue
            if key in self.seen:
                m["dup_seen"] += 1
                continue
            req.priority = a["priority"]
            req.same_ip_wait_ms = a["same_ip_wait_ms"]
            req.harvest_links = a["harvest_links"]
            req.max_spiders_per_ip = a["max_spiders_per_ip"]
            req.ufn = a["ufn"]
            self.frontier[key] = req
            self.seen[key] = (req.hopcount, self.rnd)
            m["accepted"] += 1
        return m

    def seed(self) -> dict:
        return self.enqueue(
            [(r["url"], 0, int(r["added_time_ms"]), True) for r in self.seeds]
        )

    # ---- one round (steps 1–5, 7) -------------------------------------------
    def run_round(self) -> int:
        n_quota_dropped = 0
        if self.site_quota:
            # step 10 — quota purge before winner selection
            doomed = [k for k, r in self.frontier.items()
                      if self.site_emitted.get(r.firstip, 0) >= self.site_quota]
            for k in doomed:
                del self.frontier[k]
            n_quota_dropped = len(doomed)
        by_ip: dict[int, list[Req]] = {}
        for req in self.frontier.values():
            if req.due_ms <= self.T:  # step 2' — respider/retry due gate
                by_ip.setdefault(req.firstip, []).append(req)
        if not by_ip and not self.frontier:
            return 0
        order_key = lambda r: (-r.priority, r.added_ms, r.hopcount, r.urlhash48)
        sched: list[tuple[int, Req]] = []  # (slot_time, req)
        for ip, reqs in by_ip.items():
            if self.next_ok.get(ip, 0) > self.T:
                continue
            reqs.sort(key=order_key)
            k = max(1, reqs[0].max_spiders_per_ip)
            t = self.T
            for slot, req in enumerate(reqs[:k]):
                sched.append((t, req))
                # crawl_delay of the fetched URL's OWN host (hosts sharing a
                # firstip share the politeness clock, like Gigablast)
                cd = self.robots.crawl_delay_ms(req.host)
                t += self.fetch_ms + max(req.same_ip_wait_ms, cd)
            self.next_ok[ip] = t  # last slot + fetch + wait
        sched.sort(key=lambda s: (s[0], -s[1].priority, s[1].added_ms, s[1].urlhash48))
        outlinks: list[tuple[str, int, int, bool]] = []
        n_respidered = n_errors = n_retried = n_redirected = n_dups = 0
        for t, req in sched:
            self.emitted.append(Emit(
                seq=len(self.emitted), urlhash48=req.urlhash48, url=req.url,
                firstip=req.firstip, priority=req.priority,
                scheduled_time_ms=t, hopcount=req.hopcount, rnd=self.rnd,
            ))
            del self.frontier[(req.firstip, req.urlhash48)]
            spidered = t + self.fetch_ms
            failed = bool(self.err_mod) and req.urlhash48 % self.err_mod == 0
            if failed:  # step 9 — error reply → retry re-entry
                n_errors += 1
                ec = req.errorcount + 1
                a = eval_rules_py(self.rules, {
                    "url": req.url, "host": req.host, "path": req.path,
                    "hopcount": req.hopcount, "errorcount": ec,
                    "is_seed": req.is_seed,
                })
                if a["priority"] >= 0 and not a["force_delete"]:
                    nxt = Req(
                        url=req.url, host=req.host, path=req.path,
                        firstip=req.firstip, urlhash48=req.urlhash48,
                        hopcount=req.hopcount, added_ms=spidered,
                        is_seed=req.is_seed, priority=a["priority"],
                        same_ip_wait_ms=a["same_ip_wait_ms"],
                        harvest_links=a["harvest_links"],
                        max_spiders_per_ip=a["max_spiders_per_ip"],
                        ufn=a["ufn"], gen=req.gen + 1,
                        due_ms=spidered + self.retry_wait_ms, errorcount=ec,
                        backoff=req.backoff,  # errors never touch backoff
                    )
                    self.frontier[(nxt.firstip, nxt.urlhash48)] = nxt
                    n_retried += 1
                continue  # no harvest, no quota count, no respider path
            if self.redirects is not None:
                dst = self.redirects.get(req.url)
                if dst is not None:  # step 11 — redirect reply
                    n_redirected += 1
                    outlinks.append((dst, req.hopcount, spidered, req.is_seed))
                    continue  # no harvest, no quota count, no respider
            if self.content_map is not None:  # step 12 — dup reply
                ch = self.content_map.get(req.url, req.urlhash48)
                owner = self.indexed_ch.get(ch)
                if owner is not None and owner != req.urlhash48:
                    n_dups += 1
                    continue  # slot consumed, nothing indexed
                self.indexed_ch[ch] = req.urlhash48
            self.site_emitted[req.firstip] = \
                self.site_emitted.get(req.firstip, 0) + 1
            if req.harvest_links:
                for dst in self.link_graph.get(req.url, ()):
                    outlinks.append((dst, req.hopcount + 1, t + self.fetch_ms, False))
            if self.respider:  # step 8 — reply → re-entry
                if self.content_gens is not None:
                    # content-driven signals (steps 8'/13'): compare the
                    # hash observed at THIS fetch (gen) with the previous
                    # generation's; percentchangedperday is the pinned
                    # integer rate min(100, 100·MS_PER_DAY DIV elapsed)
                    # when changed, 0 when unchanged or first download
                    if req.gen == 0:
                        unchanged, pct = False, 0
                    else:
                        cur = self.content_gens.get(
                            (req.url, req.gen), req.urlhash48)
                        prev = self.content_gens.get(
                            (req.url, req.gen - 1), req.urlhash48)
                        unchanged = cur == prev
                        elapsed = max(spidered - req.added_ms, 1)
                        pct = 0 if unchanged else min(
                            100, (100 * MS_PER_DAY) // elapsed)
                else:
                    pct = req.urlhash48 % 101
                    unchanged = (req.gen > 0
                                 and (req.urlhash48 + req.gen) % 3 == 0)
                a = eval_rules_py(self.rules, {
                    "url": req.url, "host": req.host, "path": req.path,
                    "hopcount": req.hopcount, "errorcount": 0,
                    "is_seed": req.is_seed, "is_indexed": True,
                    "percentchangedperday": pct,
                })
                if a["priority"] >= 0 and not a["force_delete"]:
                    # step 13 — EDOCUNCHANGED backoff: an UNCHANGED
                    # re-fetch (gen>0, pinned signal (urlhash48+gen)%3==0)
                    # doubles the carried interval multiplier (capped);
                    # any observed change resets it to 1
                    if self.unchanged_backoff and req.gen > 0 and unchanged:
                        backoff = min(req.backoff * 2, self.backoff_cap)
                    else:
                        backoff = 1
                    nxt = Req(
                        url=req.url, host=req.host, path=req.path,
                        firstip=req.firstip, urlhash48=req.urlhash48,
                        hopcount=req.hopcount, added_ms=spidered,
                        is_seed=req.is_seed, priority=a["priority"],
                        same_ip_wait_ms=a["same_ip_wait_ms"],
                        harvest_links=a["harvest_links"],
                        max_spiders_per_ip=a["max_spiders_per_ip"],
                        ufn=a["ufn"], gen=req.gen + 1,
                        due_ms=spidered
                        + int(a["spider_freq_days"] * float(MS_PER_DAY)) * backoff,
                        backoff=backoff,
                    )
                    self.frontier[(nxt.firstip, nxt.urlhash48)] = nxt
                    n_respidered += 1
        m = {"round": self.rnd, "clock_ms": self.T, "emitted": len(sched)}
        if self.respider:
            m["respidered"] = n_respidered
        if self.err_mod:
            m["errors"] = n_errors
            m["retried"] = n_retried
        if self.site_quota:
            m["quota_dropped"] = n_quota_dropped
        if self.redirects is not None:
            m["redirected"] = n_redirected
        if self.content_map is not None:
            m["dups"] = n_dups
        if outlinks:
            m.update(self.enqueue(outlinks))
        self.metrics.append(m)
        self.rnd += 1
        if self.frontier:
            self.T = max(self.T, min(max(self.next_ok.get(r.firstip, 0), r.due_ms)
                                     for r in self.frontier.values()))
        return len(sched)

    def run(self, max_rounds: int = 10**9) -> SimResult:
        self.seed()
        while self.frontier and self.rnd < max_rounds:
            self.run_round()
        return SimResult(self.emitted, self.seen, self.metrics)
