"""Timeline-occupancy analysis of a jax.profiler TPU trace.

Where scripts/profile_split.py aggregates per-op totals (which
double-counts enclosing while/async spans), this walks the XLA Ops line
with timestamps and reports, within the traced window: device-busy vs
idle, busy time split by op class, and the largest idle gaps with their
neighbouring ops — i.e. what the render is actually waiting on.

Usage: python scripts/timeline_gaps.py [trace.xplane.pb | trace dir]
(defaults to the newest trace under .tpu_logs/trace)
"""
from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

from xplane_parse import fields, parse_event_metadata_entry


def parse_event_ts(buf):
    meta_id = off = dur = 0
    for fno, wt, v in fields(buf):
        if fno == 1:
            meta_id = v
        elif fno == 2:
            off = v
        elif fno == 3:
            dur = v
    return meta_id, off, dur


def parse_line_ts(buf):
    name = ""
    ts_ns = 0
    events = []
    for fno, wt, v in fields(buf):
        if fno == 2:
            name = v.decode(errors="replace")
        elif fno == 3:
            ts_ns = v
        elif fno == 4:
            events.append(parse_event_ts(v))
    return name, ts_ns, events


def parse_plane_ts(buf):
    name = ""
    lines = []
    emeta = {}
    for fno, wt, v in fields(buf):
        if fno == 2:
            name = v.decode(errors="replace")
        elif fno == 3:
            lines.append(parse_line_ts(v))
        elif fno == 4:
            k, n = parse_event_metadata_entry(v)
            emeta[k] = n
    return name, lines, emeta


def classify(name: str) -> str:
    ln = name.lower()
    if "t8" in ln or "custom-call" in ln or "tpu_custom_call" in ln:
        return "pallas-kernel"
    if "sort" in ln:
        return "sort"
    if "gather" in ln or "scatter" in ln:
        return "gather/scatter"
    if "dynamic" in ln or "slice" in ln:
        return "slice"
    if "fusion" in ln:
        return "fusion"
    if "copy" in ln or "transpose" in ln:
        return "copy"
    if "while" in ln or "conditional" in ln:
        return "control"
    return "other"


def main():
    arg = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / ".tpu_logs" / "trace"
    if arg.is_dir():
        files = glob.glob(str(arg / "**" / "*.xplane.pb"), recursive=True)
        arg = Path(max(files, key=os.path.getmtime))
    buf = arg.read_bytes()
    print(f"file: {arg}")
    for fno, wt, v in fields(buf):
        if fno != 1:
            continue
        pname, lines, emeta = parse_plane_ts(v)
        pl = pname.lower()
        if ("tpu" not in pl and "device" not in pl) or "host" in pl:
            continue
        print(f"\n== plane: {pname}")
        for lname, ts_ns, events in lines:
            if not events:
                continue
            # leaf-op lines: XLA Ops; skip module/step summary lines
            ll = lname.lower()
            if "op" not in ll:
                continue
            evs = sorted(
                ((off, dur, emeta.get(mid, str(mid))) for mid, off, dur in events),
                key=lambda e: e[0],
            )
            t0 = evs[0][0]
            t1 = max(off + dur for off, dur, _ in evs)
            window = (t1 - t0) / 1e12
            # union coverage + per-class exclusive time (events on the
            # ops line may still nest: fusions inside while bodies are
            # siblings, but keep a sweep to be safe)
            busy = 0
            by_class = defaultdict(float)
            by_name = defaultdict(float)
            gaps = []
            cur_end = t0
            prev_name = ""
            for off, dur, name in evs:
                if off > cur_end:
                    gaps.append((cur_end, off - cur_end, prev_name, name))
                    busy_start = off
                else:
                    busy_start = cur_end
                end = off + dur
                if end > cur_end:
                    add = end - busy_start
                    busy += add
                    cur_end = end
                    prev_name = name
                by_class[classify(name)] += dur / 1e12
                by_name[name] += dur / 1e12
            print(f"line: {lname}  events={len(evs)}  window={window:.3f}s  "
                  f"busy={busy / 1e12:.3f}s ({100 * busy / (t1 - t0):.1f}%)  "
                  f"idle={(t1 - t0 - busy) / 1e12:.3f}s")
            for c, t in sorted(by_class.items(), key=lambda kv: -kv[1]):
                print(f"    {c:<16} {t:8.3f}s")
            gaps.sort(key=lambda g: -g[1])
            tot_gap = sum(g[1] for g in gaps) / 1e12
            print(f"  gaps: n={len(gaps)} total={tot_gap:.3f}s; top 12:")
            for off, g, before, after in gaps[:12]:
                print(f"    {g / 1e9:9.3f} ms after [{before[:60]}] before [{after[:60]}]")
            # aggregate gap time by the op that follows the gap (what was waited for)
            gap_after = defaultdict(float)
            for off, g, before, after in gaps:
                gap_after[after] += g / 1e12
            print("  gap time by following op (top 10):")
            for name, t in sorted(gap_after.items(), key=lambda kv: -kv[1])[:10]:
                print(f"    {t * 1e3:9.2f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
