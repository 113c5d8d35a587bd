"""Mechanically rotate the driver CORRECTNESS window (VERDICT r4 item 10).

The external driver records correctness rows for only the FIRST 50
entries of ``__spark_entry__.queries()``.  This tool makes window
membership a COMPUTED artifact instead of a hand-edited dict order:

  * slots 1-6   — the flagship crawl loop, pinned every round;
  * slots 7-13  — the multimodal golden-oracle decode queries, pinned
                  (their golden-parquet value oracles are the only
                  driver-visible evidence for the C8 payload axis);
  * slots 14-N  — every contract entry NEVER driver-recorded in any
                  round (computed from the CORRECTNESS_r*.json history,
                  ordered by their current queries() position);
  * remaining   — entries whose most recent driver record is OLDEST
                  (stalest-first re-verification), again position-stable
                  within equal staleness;
  * slots 51+   — everything else, original relative order preserved.

Usage::

    python tools/rotate_window.py            # rewrite queries() + WINDOW.md
    python tools/rotate_window.py --check    # exit 1 if a rotation is due

The tool rewrites ONLY the ``return {...}`` literal inside queries()
(names and callables are re-emitted verbatim) and regenerates the
machine section of WINDOW.md with the audit trail appended.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
ENTRY = ROOT / "__spark_entry__.py"
WINDOW_MD = ROOT / "WINDOW.md"
WINDOW_SIZE = 50

PINNED_FLAGSHIP = [
    "crawl_round", "crawl_dedup_round", "respider_due", "urlseen_filter",
    "fetch_validate", "w1_emit_order",
]
PINNED_MULTIMODAL = [
    "multimodal_features", "image_neardup", "audio_features",
    "video_frames", "video_scene_cuts", "image_exif_orientation",
    "image_quality_metrics",
]


def recorded_history() -> dict[str, int]:
    """query name → latest round number with a driver-recorded row."""
    latest: dict[str, int] = {}
    for p in sorted(ROOT.glob("CORRECTNESS_r[0-9][0-9].json")):
        rnd = int(p.stem.split("_r")[1])
        for name in json.loads(p.read_text()):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def parse_queries_dict(src: str) -> tuple[str, list[tuple[str, str]], str, str]:
    """Return (head, [(name, func)...], tail, indent) around the
    queries() return-dict literal."""
    m = re.search(
        r"(def queries\(\).*?return \{\n)(.*?)(\n    \}\n)", src, re.S)
    if not m:
        raise SystemExit("queries() return-dict not found")
    body = m.group(2)
    entries = re.findall(r'^\s*"([A-Za-z0-9_]+)":\s*([A-Za-z0-9_]+),', body,
                         re.M)
    return m.group(1), entries, m.group(3), src


def compute_order(names: list[str], latest: dict[str, int]) -> list[str]:
    pos = {n: i for i, n in enumerate(names)}
    pinned = PINNED_FLAGSHIP + PINNED_MULTIMODAL
    rest = [n for n in names if n not in pinned]
    never = [n for n in rest if n not in latest]
    seen = [n for n in rest if n in latest]
    # stalest first; stable by current position within a round
    seen.sort(key=lambda n: (latest[n], pos[n]))
    window_fill = (never + seen)[: WINDOW_SIZE - len(pinned)]
    tail = [n for n in names if n not in pinned and n not in window_fill]
    return pinned + window_fill + tail


def rewrite_entry(order: list[str], entries: list[tuple[str, str]]) -> None:
    func = dict(entries)
    src = ENTRY.read_text()
    head_re = re.search(
        r"(def queries\(\).*?return \{\n)(.*?)(\n    \}\n)", src, re.S)
    lines = []
    n_pin = len(PINNED_FLAGSHIP) + len(PINNED_MULTIMODAL)
    for i, name in enumerate(order):
        if i == 0:
            lines.append("        # ---- flagship crawl loop "
                         "(slots 1-6, pinned; tools/rotate_window.py)")
        elif i == len(PINNED_FLAGSHIP):
            lines.append("        # ---- golden-parquet multimodal oracles "
                         "(slots 7-13, pinned)")
        elif i == n_pin:
            lines.append("        # ---- rotated window (slots 14-50: "
                         "never-recorded first, then stalest)")
        elif i == WINDOW_SIZE:
            lines.append("        # ---- slot 51+: outside the driver "
                         "window; tri-scale verified by tools/full_sweep.py")
        lines.append(f'        "{name}": {func[name]},')
    new_src = (src[: head_re.start(2)] + "\n".join(lines)
               + src[head_re.end(2):])
    ENTRY.write_text(new_src)


def write_window_md(order: list[str], latest: dict[str, int],
                    old_window: list[str]) -> None:
    n_pin = len(PINNED_FLAGSHIP) + len(PINNED_MULTIMODAL)
    window = order[:WINDOW_SIZE]
    rotated = window[n_pin:]
    never = [n for n in rotated if n not in latest]
    stale = [(n, latest[n]) for n in rotated if n in latest]
    displaced = [n for n in old_window if n not in window]
    md = [
        "# CORRECTNESS window audit trail",
        "",
        "GENERATED by tools/rotate_window.py — edit the tool, not this file.",
        "The external driver records rows for only the FIRST "
        f"{WINDOW_SIZE} entries of `queries()`; this file makes every",
        "membership change auditable (round-3 ADVICE).",
        "",
        "## Current window (round 5 rotation)",
        "",
        "- **Slots 1-6 — flagship crawl loop (pinned)**: "
        + ", ".join(f"`{n}`" for n in PINNED_FLAGSHIP),
        "- **Slots 7-13 — multimodal golden oracles (pinned)**: "
        + ", ".join(f"`{n}`" for n in PINNED_MULTIMODAL),
        f"- **Slots 14-{13 + len(never)} — never driver-recorded "
        "(close the visibility gap)**: "
        + ", ".join(f"`{n}`" for n in never),
        f"- **Slots {14 + len(never)}-{len(window)} — stalest previously "
        "recorded (oldest round first)**: "
        + ", ".join(f"`{n}` (r{r})" for n, r in stale),
        "",
        f"## Displaced out of the window this rotation ({len(displaced)})",
        "",
        "All were driver-recorded green in an earlier round and remain",
        "tri-scale verified by `tools/full_sweep.py` "
        "(`CORRECTNESS_FULL_r*.json`):",
        "",
        ", ".join(f"`{n}`" for n in displaced) or "(none)",
        "",
        "## Recording history",
        "",
        "Cumulative driver-recorded coverage by round (from "
        "`CORRECTNESS_r*.json`):",
        "",
    ]
    by_round: dict[int, int] = {}
    for n, r in latest.items():
        by_round[r] = by_round.get(r, 0) + 1
    cum = 0
    for r in sorted(by_round):
        cum += by_round[r]
        md.append(f"- after r{r}: {cum} distinct queries recorded")
    missing = [n for n in order if n not in latest and n not in window]
    md += [
        "",
        f"## Still never driver-recorded after this window ({len(missing)})",
        "",
        ", ".join(f"`{n}`" for n in missing) or
        "(none — every contract entry has either a driver row or a "
        "slot in the current window)",
        "",
    ]
    WINDOW_MD.write_text("\n".join(md))


def main() -> None:
    src = ENTRY.read_text()
    _, entries, _, _ = parse_queries_dict(src)
    names = [n for n, _ in entries]
    latest = recorded_history()
    order = compute_order(names, latest)
    if "--check" in sys.argv:
        if order[:WINDOW_SIZE] != names[:WINDOW_SIZE]:
            print("rotation due")
            sys.exit(1)
        print("window up to date")
        return
    rewrite_entry(order, entries)
    write_window_md(order, latest, names[:WINDOW_SIZE])
    n_never = sum(1 for n in order[:WINDOW_SIZE] if n not in latest)
    print(f"rotated: window={WINDOW_SIZE} never-recorded-in-window={n_never}")


if __name__ == "__main__":
    main()
