#!/usr/bin/env python
"""Persistent-compile-cache prewarm for the regression matrix (VERDICT r3 #6).

A kernel-source commit changes every configuration's compile-cache key, so the
first post-commit TPU matrix pays a full cold Mosaic compile PER ROW — and each
row is its own process, so it also pays ~60-90 s of backend init before its
compile even starts. This script builds every matrix configuration in ONE
process and runs a single step of each, sequentially (one TPU client at a
time is a hard environment rule — see CLAUDE.md), which populates the
persistent cache (`JAYBENNE_CACHE_DIR`); the matrix rows that follow start
warm (~tens of seconds instead of 250-600+).

The config list mirrors tst/launch_ci_runner.py's MATRIX at each gate's pinned
mesh sizes. Single-device rows only: the multi-device rows run on the CPU
backend, whose compiles are not the bottleneck.

Usage:
    python tst/prewarm_cache.py [--only substr]     # on the TPU host
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (deck, pinned mesh overrides, extra overrides) — keep in lockstep with the
# gates: stepdiff.py pins 128/128, stepdiff_smr.py pins 64x32/16^2,
# stepdiff_3d.py / inf gates run their decks as-is.
CONFIGS = [
    ("stepdiff.in", {"parthenon/mesh/nx1": 128, "parthenon/meshblock/nx1": 128}, {}),
    ("stepdiff_ddmc.in", {"parthenon/mesh/nx1": 128, "parthenon/meshblock/nx1": 128}, {}),
    ("stepdiff_smr.in", {"parthenon/mesh/nx1": 64, "parthenon/mesh/nx2": 32,
                         "parthenon/meshblock/nx1": 16, "parthenon/meshblock/nx2": 16}, {}),
    ("stepdiff_smr_ddmc.in", {"parthenon/mesh/nx1": 64, "parthenon/mesh/nx2": 32,
                              "parthenon/meshblock/nx1": 16, "parthenon/meshblock/nx2": 16}, {}),
    ("stepdiff_smr_hybrid.in", {"parthenon/mesh/nx1": 64, "parthenon/mesh/nx2": 32,
                                "parthenon/meshblock/nx1": 16, "parthenon/meshblock/nx2": 16}, {}),
    ("stepdiff_smr2.in", {"parthenon/mesh/nx1": 64, "parthenon/mesh/nx2": 32,
                          "parthenon/meshblock/nx1": 16, "parthenon/meshblock/nx2": 16}, {}),
    ("stepdiff_smr2.in", {"parthenon/mesh/nx1": 64, "parthenon/mesh/nx2": 32,
                          "parthenon/meshblock/nx1": 16, "parthenon/meshblock/nx2": 16},
     {"jaybenne/use_ddmc": "true", "jaybenne/tau_ddmc": 2.5}),
    ("stepdiff_3d_smr_ddmc.in", {}, {}),
    ("inf.in", {}, {}),
    ("inf_stiff.in", {}, {}),
    ("suolson.in", {}, {}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="prewarm only configs whose deck name contains this")
    args = ap.parse_args()

    import shutil
    import tempfile

    import jax

    from jaybenne_tpu.driver import run_file

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = []
    for deck_name, mesh_mods, extra in CONFIGS:
        if args.only and args.only not in deck_name:
            continue
        label = deck_name + ("+ddmc" if extra.get("jaybenne/use_ddmc") else "")
        t0 = time.time()
        try:
            # a short FULL driver run (2 cycles + dumps into a temp dir), not
            # a bare step: the round-5 TPU matrix showed the gates compile
            # more than the step executable (radiation init, growth/dump
            # paths) — a bare-step prewarm left rows paying 520-2600 s each
            # on a slow tunnel session (BENCH.md round-5)
            outdir = tempfile.mkdtemp(prefix="jbtpu_prewarm_")
            try:
                run_file(
                    os.path.join(here, "inputs", deck_name),
                    outdir=outdir,
                    modified_inputs={**mesh_mods, **extra},
                    quiet=True, nlim=2,
                )
            finally:
                shutil.rmtree(outdir, ignore_errors=True)
            ok = True
        except Exception as exc:  # pragma: no cover - report and continue
            print(f"[FAIL] {label}: {type(exc).__name__}: {exc}", flush=True)
            ok = False
        dt_s = round(time.time() - t0, 1)
        rows.append({"config": label, "ok": ok, "seconds": dt_s})
        print(f"[{'WARM' if ok else 'FAIL'}] {label} ({dt_s}s)", flush=True)
    print(json.dumps({"backend": jax.default_backend(), "rows": rows}))
    return 0 if all(r["ok"] for r in rows) else 1


if __name__ == "__main__":
    sys.exit(main())
