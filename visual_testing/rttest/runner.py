"""Test runner (parity: visual-testing/src/rttest/runner.py).

Per test: delete stale output, invoke the CLI as a subprocess with a 300s
timeout and perf_counter timing, then classify:
ERROR (renderer failed), NEW (no blessed reference), PASS/FAIL (MSE vs
tolerance). skip_visual tests only record timing.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

from .diff import compare_images
from .test_spec import TestSpec

TIMEOUT_SECONDS = 1200  # remote-TPU first compiles can be minutes


@dataclass
class TestResult:
    name: str
    status: str                       # PASS | FAIL | NEW | ERROR | SKIP
    render_time_seconds: float = 0.0
    mse: Optional[float] = None
    max_diff: Optional[float] = None
    message: str = ""
    output_path: Optional[str] = None
    reference_path: Optional[str] = None

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "status": self.status,
            "render_time_seconds": self.render_time_seconds,
            "mse": self.mse,
            "max_diff": self.max_diff,
            "message": self.message,
            "output": self.output_path,
            "reference": self.reference_path,
        }


def build_command(
    spec: TestSpec,
    output_path: Path,
    renderer_args: List[str],
    backend: str,
    base_dir: Path,
) -> List[str]:
    cmd = [sys.executable, "-m", "tpu_raytracing.cli"]
    cmd += spec.scene_cli_args(base_dir)
    cmd += ["-o", str(output_path), "--backend", backend]
    cmd += renderer_args
    cmd += spec.settings.to_cli_args()
    return cmd


def run_single_test(
    spec: TestSpec,
    output_dir: Path,
    reference_dir: Path,
    renderer_args: List[str],
    backend: str,
    base_dir: Path,
    tolerance: float,
    visual: bool = True,
    stat_gate: bool = False,
) -> TestResult:
    output_path = output_dir / f"{spec.name}.exr"
    reference_path = reference_dir / f"{spec.name}.exr"
    output_path.unlink(missing_ok=True)
    output_dir.mkdir(parents=True, exist_ok=True)

    # the CLI writes under scenes/output/<path>; hand it an absolute path
    cmd = build_command(spec, output_path.resolve(), renderer_args, backend, base_dir)
    t0 = time.perf_counter()
    try:
        env = dict(os.environ)
        repo = Path(__file__).resolve().parents[2]
        env["PYTHONPATH"] = str(repo) + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=TIMEOUT_SECONDS,
            cwd=base_dir, env=env,
        )
    except subprocess.TimeoutExpired:
        return TestResult(
            spec.name, "ERROR", time.perf_counter() - t0,
            message=f"renderer timed out after {TIMEOUT_SECONDS}s",
        )
    elapsed = time.perf_counter() - t0

    # absolute -o still lands under scenes/output with the abs path joined;
    # normalize by finding where the CLI actually wrote
    actual = _locate_output(base_dir, output_path)
    if proc.returncode != 0:
        return TestResult(
            spec.name, "ERROR", elapsed,
            message=proc.stderr.strip().splitlines()[-1] if proc.stderr else "renderer failed",
        )
    if actual is None:
        return TestResult(
            spec.name, "ERROR", elapsed, message="renderer produced no output"
        )
    if actual != output_path:
        output_path.parent.mkdir(parents=True, exist_ok=True)
        actual.replace(output_path)

    if not visual or spec.skip_visual:
        return TestResult(
            spec.name, "SKIP", elapsed, output_path=str(output_path)
        )

    if not reference_path.exists():
        return TestResult(
            spec.name, "NEW", elapsed,
            message="no blessed reference; run with --bless",
            output_path=str(output_path),
        )

    try:
        diff = compare_images(output_path, reference_path)
    except Exception as e:
        return TestResult(
            spec.name, "ERROR", elapsed, message=f"diff failed: {e}",
            output_path=str(output_path), reference_path=str(reference_path),
        )
    if stat_gate:
        # cross-backend statistical gate (TPU vs CPU-blessed references):
        # beauty gated on tonemapped image-mean agreement, AOVs on a
        # small MSE bound; specular-transport scenes carry a larger
        # per-scene bound in tests.toml (delta chains make whole paths
        # flip under FMA-contraction ULPs, so the cross-backend spread
        # of even the tonemapped mean stays several percent at gate spp)
        ok = diff.stat_passes(spec.settings.stat_rel_mean)
        tol = spec.settings.stat_rel_mean
        msg = (
            f"stat gate [{diff.channel_group}]: rel_mean="
            f"{diff.rel_mean:.4f}"
            + (f" (tol {tol})" if tol is not None else "")
            + f" mse={diff.mse:.2e}"
        )
    else:
        ok = diff.passes(tolerance)
        msg = ""
    status = "PASS" if ok else "FAIL"
    return TestResult(
        spec.name, status, elapsed, mse=diff.mse, max_diff=diff.max_diff,
        message=msg,
        output_path=str(output_path), reference_path=str(reference_path),
    )


def _locate_output(base_dir: Path, requested: Path) -> Optional[Path]:
    """The CLI joins -o onto scenes/output/; find the file it wrote."""
    if requested.exists():
        return requested
    joined = base_dir / "scenes" / "output" / requested.name
    if joined.exists():
        return joined
    # absolute -o joined onto scenes/output keeps the abs path's tail on
    # POSIX (Path('/a') / Path('/b/c.exr') -> '/b/c.exr'), so requested is
    # normally correct; this is a fallback for relative -o
    rel = base_dir / "scenes" / "output" / requested
    return rel if rel.exists() else None


def run_tests(
    specs: List[TestSpec],
    output_dir: Path,
    reference_dir: Path,
    renderer_args: List[str],
    backend: str,
    base_dir: Path,
    tolerance: float,
    visual: bool = True,
    stat_gate: bool = False,
) -> List[TestResult]:
    results = []
    for spec in specs:
        res = run_single_test(
            spec, output_dir, reference_dir, renderer_args, backend,
            base_dir, tolerance, visual, stat_gate,
        )
        icon = {
            "PASS": "✓", "FAIL": "✗", "NEW": "?", "ERROR": "!", "SKIP": "-"
        }[res.status]
        print(
            f"  {icon} {res.name:<24} {res.status:<5} "
            f"{res.render_time_seconds:7.2f}s"
            + (f"  mse={res.mse:.3e}" if res.mse is not None else "")
            + (f"  {res.message}" if res.message else ""),
            flush=True,
        )
        results.append(res)
    return results
