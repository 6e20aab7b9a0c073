"""Minimal xplane.pb reader (no tensorflow dependency).

Hand-rolled protobuf wire decoder for the XSpace/XPlane/XLine/XEvent
subset needed to aggregate device op times from a jax.profiler trace
(schema: tsl/profiler/protobuf/xplane.proto).

Usage: python scripts/xplane_parse.py <trace.xplane.pb | trace dir>
"""
from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict
from pathlib import Path


def _varint(buf: bytes, i: int):
    shift = 0
    out = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def fields(buf: bytes):
    """Yield (field_no, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse_event(buf):
    meta_id = dur = 0
    for fno, wt, v in fields(buf):
        if fno == 1:
            meta_id = v
        elif fno == 3:
            dur = v
    return meta_id, dur


def parse_line(buf):
    name = ""
    events = []
    for fno, wt, v in fields(buf):
        if fno == 2:
            name = v.decode(errors="replace")
        elif fno == 4:
            events.append(parse_event(v))
    return name, events


def parse_event_metadata_entry(buf):
    """map<int64, XEventMetadata> entry: key=1, value=2."""
    key = 0
    name = ""
    for fno, wt, v in fields(buf):
        if fno == 1:
            key = v
        elif fno == 2:
            for f2, w2, v2 in fields(v):
                if f2 == 2:
                    name = v2.decode(errors="replace")
    return key, name


def parse_plane(buf):
    name = ""
    lines = []
    emeta = {}
    for fno, wt, v in fields(buf):
        if fno == 2:
            name = v.decode(errors="replace")
        elif fno == 3:
            lines.append(parse_line(v))
        elif fno == 4:
            k, n = parse_event_metadata_entry(v)
            emeta[k] = n
    return name, lines, emeta


def device_op_totals(path: Path):
    """{op name: seconds} aggregated over device (TPU) planes."""
    buf = path.read_bytes()
    totals = defaultdict(float)
    plane_names = []
    for fno, wt, v in fields(buf):
        if fno != 1:
            continue
        pname, lines, emeta = parse_plane(v)
        plane_names.append(pname)
        pl = pname.lower()
        if "tpu" not in pl and "device" not in pl:
            continue
        if "host" in pl:
            continue
        for lname, events in lines:
            ll = lname.lower()
            if "step" in ll:
                continue
            for meta_id, dur in events:
                totals[emeta.get(meta_id, str(meta_id))] += dur / 1e12
    return totals, plane_names


def main():
    arg = Path(sys.argv[1])
    if arg.is_dir():
        files = glob.glob(str(arg / "**" / "*.xplane.pb"), recursive=True)
        arg = Path(max(files, key=os.path.getmtime))
    totals, planes = device_op_totals(arg)
    print(f"file: {arg}")
    print(f"planes: {planes}")
    total = sum(totals.values())
    print(f"device op total: {total:.3f}s over {len(totals)} ops")
    buckets = defaultdict(float)
    for name, t in totals.items():
        ln = name.lower()
        if "custom-call" in ln or "t8" in ln or "walk" in ln or "tpu_custom_call" in ln:
            buckets["pallas-kernel"] += t
        elif "sort" in ln:
            buckets["sort"] += t
        elif "gather" in ln or "scatter" in ln:
            buckets["gather/scatter"] += t
        elif "dynamic" in ln:
            buckets["dynamic-slice"] += t
        elif "fusion" in ln:
            buckets["fusion"] += t
        elif "copy" in ln or "transpose" in ln:
            buckets["copy"] += t
        else:
            buckets["other"] += t
    for b, t in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {b:<16} {t:8.3f}s ({100 * t / max(total, 1e-12):5.1f}%)")
    print("top 40 ops:")
    for name, t in sorted(totals.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {t * 1e3:9.2f} ms  {name[:120]}")


if __name__ == "__main__":
    main()
