"""Interleaved knob A/B at ±2% resolution (round-4 protocol).

Kernel/integrator knobs are read from the environment at trace time, so
a knob flip needs a fresh process. This driver alternates
control/treatment perf_scenes.py subprocesses (A B A B ...) so slow
session drift (host load, TPU worker state) hits both legs equally,
then reports per-leg best/median over the clean (unloaded) repeats.

    python scripts/ab.py TPU_RT_NEE_GATE 1 0 --scene cbbunny --pairs 3

Interpretation rule (docs/PERF_LOG.md): a win is real when the
treatment's BEST beats the control's BEST by more than 2% AND the
medians agree in direction; anything smaller is inside the session band.
"""
from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
from pathlib import Path
from statistics import median

REPO = Path(__file__).resolve().parents[1]
RESULT_RE = re.compile(
    r"^RESULT (\S+) best=([\d.]+) median=([\d.]+) wall=([\d.]+) "
    r"flagged=(\d+)")


def run_leg(knob: str, value: str, scene: str, reps: int) -> dict:
    env = dict(os.environ)
    # comma-separated knob lists A/B several env vars at once
    # (e.g. TPU_RT_T8_NWALK,TPU_RT_T8_R 1,4 4,1)
    for k, v in zip(knob.split(","), value.split(",")):
        env[k] = v
    env["SCENES"] = scene
    env["REPEATS"] = str(reps)
    p = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "perf_scenes.py")],
        env=env, capture_output=True, text=True, cwd=str(REPO),
        timeout=1800,
    )
    out = {}
    for line in p.stdout.splitlines():
        m = RESULT_RE.match(line)
        if m:
            out = {"best": float(m.group(2)), "median": float(m.group(3)),
                   "wall": float(m.group(4)), "flagged": int(m.group(5))}
    if not out:
        print(p.stdout[-2000:], file=sys.stderr)
        print(p.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"leg {knob}={value} produced no RESULT line")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("knob")
    ap.add_argument("control")
    ap.add_argument("treatment")
    ap.add_argument("--scene", default="cbbunny")
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--wall", action="store_true",
                    help="compare min wall seconds (lower wins) instead of "
                         "Mrays/s — required when the knob changes "
                         "rays_traced itself")
    args = ap.parse_args()

    a_best, b_best = [], []
    for i in range(args.pairs):
        for tag, val, acc in (("A", args.control, a_best),
                              ("B", args.treatment, b_best)):
            r = run_leg(args.knob, val, args.scene, args.reps)
            acc.append(r["wall"] if args.wall else r["best"])
            print(f"pair {i} leg {tag} ({args.knob}={val}): "
                  f"best {r['best']:.3f} median {r['median']:.3f} "
                  f"wall {r['wall']:.2f}s flagged {r['flagged']}",
                  flush=True)

    if args.wall:
        ca, cb = min(a_best), min(b_best)
        ma, mb = median(a_best), median(b_best)
        delta = (ca - cb) / ca * 100.0  # positive = treatment faster
    else:
        ca, cb = max(a_best), max(b_best)
        ma, mb = median(a_best), median(b_best)
        delta = (cb - ca) / ca * 100.0
    print(f"\ncontrol  ({args.knob}={args.control}):  "
          f"best {ca:.3f}  median {ma:.3f}")
    print(f"treatment({args.knob}={args.treatment}): "
          f"best {cb:.3f}  median {mb:.3f}")
    md = (ma - mb) if args.wall else (mb - ma)
    verdict = "REAL" if abs(delta) > 2.0 and md * delta > 0 else "BAND"
    print(f"delta {delta:+.1f}%  -> {verdict}")


if __name__ == "__main__":
    main()
