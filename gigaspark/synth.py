"""Deterministic fixture synthesis (FIXTURES.md; seed=42, no external data).

Generates the crawl universe (seeds, link_graph, robots, url_filters,
hostmap, page_image) and the payload table ``images`` pinned by
BASELINE.json input_hint: (image_id string, bytes binary, w int, h int,
fmt string, caption string, phash long) + a golden-pixel sidecar for the
PSNR≥40dB per-row invariant.  Pure numpy/pyarrow; parquet out.

Scales: tiny (~10k URLs/300 hosts), small (~100k/3k), bench (10^6+).
Megahost skew knob: the first ``mega_hosts`` hosts own ~``mega_share`` of
all URLs (SURVEY §4.4 skew tests).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from gigaspark.functions.images import FORMATS, encode_image
from gigaspark.functions.phash import dhash64
from gigaspark.xxh import xxh64, xxh64_signed

NOUNS = ["otter", "harbor", "lantern", "orchid", "glacier", "raven", "dune", "ember"]
ADJS = ["amber", "quiet", "vivid", "rustic", "neon", "mossy", "pale", "stormy"]


@dataclass(frozen=True)
class SynthParams:
    n_hosts: int = 300
    pages_lo: int = 10
    pages_hi: int = 60
    mega_hosts: int = 5
    mega_share: float = 0.30
    n_seed_hosts: int = 100
    n_images: int = 1000
    out_degree_hi: int = 6
    seed: int = 42

    @classmethod
    def tiny(cls) -> "SynthParams":
        return cls()

    @classmethod
    def small(cls) -> "SynthParams":
        return cls(n_hosts=3000, n_seed_hosts=1000, n_images=2000)

    @classmethod
    def bench(cls, n_hosts: int = 20000) -> "SynthParams":
        return cls(n_hosts=n_hosts, pages_lo=20, pages_hi=80,
                   n_seed_hosts=n_hosts // 2, n_images=5000)


def host_name(h: int) -> str:
    return ("www." if h % 10 == 3 else "") + f"host{h}.example"


def canon_url(h: int, j: int) -> str:
    return f"http://{host_name(h)}/p/{j}"


def _nasty_variant(h: int, j: int, v: int) -> str:
    """Raw URL forms that must canonicalize back to canon_url(h, j)."""
    host = host_name(h)
    forms = [
        f"HTTP://{host.upper()}:80/p/{j}#frag",
        f"http://{host}/a/../p/./{j}",
        f"http://{host}//p//{j}?PHPSESSID=deadbeef",
        f"http://{host}./p/{j}?sid=1",
        f"http://{host}/p/{j}?jsessionid=x",
    ]
    return forms[v % len(forms)]


def pages_per_host(p: SynthParams) -> np.ndarray:
    rng = np.random.default_rng(p.seed)
    k = rng.integers(p.pages_lo, p.pages_hi + 1, p.n_hosts)
    if p.mega_hosts > 0 and p.n_hosts > p.mega_hosts:
        base_total = int(k.sum())
        mega_total = int(p.mega_share / (1 - p.mega_share) * base_total)
        k[: p.mega_hosts] += mega_total // p.mega_hosts
    return k.astype(np.int64)


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def gen_crawl_universe(out_dir: str, p: SynthParams) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(p.seed + 1)
    k = pages_per_host(p)

    # --- seeds -----------------------------------------------------------
    seed_urls, added = [], []
    i = 0
    for h in range(min(p.n_seed_hosts, p.n_hosts)):
        seed_urls.append(canon_url(h, 0))
        added.append(i)
        i += 1
        if h % 7 == 0:  # nasty duplicate that must collapse via C1
            seed_urls.append(_nasty_variant(h, 0, h))
            added.append(i)
            i += 1
    _write(out_dir, "seeds", pa.table({
        "url": pa.array(seed_urls, pa.string()),
        "added_time_ms": pa.array(added, pa.int64()),
        "is_seed": pa.array([True] * len(seed_urls)),
    }))

    # --- link_graph ------------------------------------------------------
    src, dsts = [], []
    for h in range(p.n_hosts):
        kh = int(k[h])
        degs = rng.integers(1, p.out_degree_hi + 1, kh)
        r1 = rng.random(kh)
        for j in range(kh):
            out = []
            for t in range(int(degs[j])):
                x = (h * 131 + j * 31 + t * 7) % 100
                if x < 5 and p.n_hosts > 1:  # ~5% cross-host
                    h2 = (h + 1 + t) % p.n_hosts
                    out.append(canon_url(h2, (j + t) % int(k[h2])))
                elif x < 8:  # media link → F1 ismedia drop
                    out.append(f"http://{host_name(h)}/static/img{j}_{t}.jpg")
                elif x < 10:  # force_delete bait
                    out.append(f"http://{host_name(h)}/killme/{j}_{t}")
                elif x < 25:  # nasty raw variant of a same-host page
                    out.append(_nasty_variant(h, (j * 3 + t + 1) % kh, x))
                else:
                    out.append(canon_url(h, (j * 3 + t + 1) % kh))
            if r1[j] < 0.10 and out:  # explicit duplicate outlink
                out.append(out[0])
            src.append(canon_url(h, j))
            dsts.append(out)
    _write(out_dir, "link_graph", pa.table({
        "src_url": pa.array(src, pa.string()),
        "dst_urls": pa.array(dsts, pa.list_(pa.string())),
    }))

    # --- robots ----------------------------------------------------------
    rows = {"host": [], "user_agent": [], "rule_type": [], "path_prefix": [],
            "crawl_delay_ms": []}

    def add(h, ua, rt, pp, cd):
        rows["host"].append(host_name(h)); rows["user_agent"].append(ua)
        rows["rule_type"].append(rt); rows["path_prefix"].append(pp)
        rows["crawl_delay_ms"].append(cd)

    for h in range(p.n_hosts):
        if h % 3 == 0:
            continue  # no robots at all → allowed, delay 0
        cd = 0 if h % 5 < 4 else [500, 1000, 5000][h % 3]
        add(h, "*", "disallow", "/private", cd)
        if h % 10 == 1:
            add(h, "*", "disallow", "/p/9", cd)
        if h % 20 == 1:
            add(h, "*", "allow", "/p/90", cd)  # longest-match beats /p/9
        if h % 10 == 6:
            add(h, "*", "disallow", "/p/*7$", cd)  # wildcard + anchor
        if h % 13 == 2:  # UA-specific group overrides '*'
            add(h, "GigablastOpenSource", "disallow", "/p/1", cd)
    _write(out_dir, "robots", pa.table({
        "host": pa.array(rows["host"], pa.string()),
        "user_agent": pa.array(rows["user_agent"], pa.string()),
        "rule_type": pa.array(rows["rule_type"], pa.string()),
        "path_prefix": pa.array(rows["path_prefix"], pa.string()),
        "crawl_delay_ms": pa.array(rows["crawl_delay_ms"], pa.int64()),
    }))

    # --- url_filters (FIXTURES.md §5) -------------------------------------
    filt = [
        (0, "ismedia", -3, 30.0, 1, 0, False, False),
        (1, "hopcount>=7", -3, 30.0, 1, 0, False, False),
        (2, "urlmatch~=banned", -2, 30.0, 1, 0, False, False),
        (3, "urlmatch~=killme", 60, 30.0, 1, 0, False, True),
        (4, "isseed", 80, 30.0, 1, 150, True, False),
        (5, "iswww && hopcount>=2", 25, 30.0, 1, 250, True, False),
        (6, "hopcount>=3", 35, 30.0, 1, 100, False, False),
        (7, "default", 55, 30.0, 1, 100, True, False),
    ]
    cols = list(zip(*filt))
    _write(out_dir, "url_filters", pa.table({
        "rule_idx": pa.array(cols[0], pa.int32()),
        "expression": pa.array(cols[1], pa.string()),
        "priority": pa.array(cols[2], pa.int32()),
        "spider_freq_days": pa.array(cols[3], pa.float64()),
        "max_spiders_per_ip": pa.array(cols[4], pa.int32()),
        "same_ip_wait_ms": pa.array(cols[5], pa.int64()),
        "harvest_links": pa.array(cols[6], pa.bool_()),
        "force_delete": pa.array(cols[7], pa.bool_()),
    }))

    # --- hostmap (pinned firstip rule, J2/S6) ------------------------------
    hosts = [host_name(h) for h in range(p.n_hosts)]
    fips = [xxh64(hst.encode()) & 0x7FFFFFFF for hst in hosts]
    _write(out_dir, "hostmap", pa.table({
        "host": pa.array(hosts, pa.string()),
        "firstip": pa.array(fips, pa.int32()),
    }))

    # --- page_image --------------------------------------------------------
    pi_src, pi_img = [], []
    for h in range(p.n_hosts):
        for j in range(int(k[h])):
            img = (h * 1315423911 + j * 2654435761) % p.n_images
            pi_src.append(canon_url(h, j))
            pi_img.append(f"img{img:08d}")
    _write(out_dir, "page_image", pa.table({
        "src_url": pa.array(pi_src, pa.string()),
        "image_id": pa.array(pi_img, pa.string()),
    }))

    meta = {"params": asdict(p), "total_urls": int(k.sum()), "n_seeds": len(seed_urls)}
    with open(os.path.join(out_dir, "universe.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def gen_images(out_dir: str, p: SynthParams) -> None:
    """images + images_golden per FIXTURES.md §1 (input_hint schema)."""
    os.makedirs(out_dir, exist_ok=True)
    ids, blobs, ws, hs, fmts, caps, phashes = [], [], [], [], [], [], []
    gids, gw, gh, gpix = [], [], [], []
    dims = (32, 64, 128)
    for i in range(p.n_images):
        rng = np.random.default_rng(p.seed + i)
        w = int(dims[i % 3]); h = int(dims[(i // 3) % 3])
        pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        fmt = FORMATS[i % len(FORMATS)]
        ids.append(f"img{i:08d}")
        blobs.append(encode_image(fmt, pix))
        ws.append(w); hs.append(h); fmts.append(fmt)
        caps.append(f"caption of img{i:08d} {NOUNS[i % len(NOUNS)]} {ADJS[i % len(ADJS)]}")
        phashes.append(dhash64(pix))  # REAL perceptual hash (input_hint)
        gids.append(f"img{i:08d}"); gw.append(w); gh.append(h)
        gpix.append(pix.tobytes())  # golden sidecar: raw pixels + caption
    _write(out_dir, "images", pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "caption": pa.array(caps, pa.string()),
        "phash": pa.array(phashes, pa.int64()),
    }))
    _write(out_dir, "images_golden", pa.table({
        "image_id": pa.array(gids, pa.string()),
        "w": pa.array(gw, pa.int32()),
        "h": pa.array(gh, pa.int32()),
        "pixels": pa.array(gpix, pa.binary()),
        "caption": pa.array(caps, pa.string()),
    }))


def gen_all(out_dir: str, p: SynthParams | None = None) -> dict:
    p = p or SynthParams.tiny()
    meta = gen_crawl_universe(out_dir, p)
    gen_images(out_dir, p)
    return meta
