#!/usr/bin/env python
"""Single-point big-mesh throughput probe (the bench.py `big_mesh` row, alone).

One process = one measurement, so kernel tunables picked up from the
environment at import time (JB_SIGMA_REFRESH, JB_REGION_CELLS_IMC/DDMC) apply
cleanly — kernel-bearing steps never hit the cross-process compile cache, so
every invocation pays one full compile (~1-4 min on the tunneled v5e) and then
times the production step path. Prints one JSON line.

Usage:
    python tst/bigmesh_bench.py [--spatial] [--steps N] [--nx N] [--particles N]
    JB_SIGMA_REFRESH=4 python tst/bigmesh_bench.py      # cadence sweep point
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spatial", action="store_true", help="decomposition=spatial (1 device)")
    ap.add_argument("--steps", type=int, default=3, help="timed steps after warmup")
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--block", type=int, default=8)
    ap.add_argument("--particles", type=int, default=200_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jaybenne_tpu import config as cfg_mod
    from jaybenne_tpu.driver import Simulation
    from jaybenne_tpu.utils.deck import Deck

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mods = {
        "parthenon/mesh/nx1": args.nx,
        "parthenon/mesh/nx2": args.nx,
        "parthenon/mesh/nx3": args.nx,
        "parthenon/mesh/ix2_bc": "periodic",
        "parthenon/mesh/ox2_bc": "periodic",
        "parthenon/mesh/ix3_bc": "periodic",
        "parthenon/mesh/ox3_bc": "periodic",
        "parthenon/meshblock/nx1": args.block,
        "parthenon/meshblock/nx2": args.block,
        "parthenon/meshblock/nx3": args.block,
        "jaybenne/num_particles": args.particles,
    }
    if args.spatial:
        mods["jaybenne/decomposition"] = "spatial"
        mods["jaybenne/n_devices"] = 1
    deck = Deck.from_file(os.path.join(here, "inputs/stepdiff.in")).update(mods)
    sim = Simulation(cfg_mod.from_deck(deck), quiet=True)
    if os.environ.get("JB_DIAG_ROUNDS") and not args.spatial:
        # the per-round diagnostics need an eager (unjitted) census loop
        from jaybenne_tpu.step import build_step_core

        sim.step_fn = build_step_core(sim.mesh, sim.cfg)
    dt = jnp.float32(3.335641e-11)

    t0 = time.perf_counter()
    state, stats = sim.step_fn(sim.state, dt)  # warmup: compile + step 0
    state.fields.energy_tally.block_until_ready()
    compile_s = time.perf_counter() - t0

    if os.environ.get("JB_DIAG_ROUNDS"):
        # diag path is eager (Python round loop) — per-call timing only
        t0 = time.perf_counter()
        events = iters = 0
        for _ in range(args.steps):
            state, stats = sim.step_fn(state, dt)
            events += int(stats.events)
            iters += int(stats.iterations)
        float(state.fields.energy_tally.sum())
        elapsed = time.perf_counter() - t0
    else:
        # timed steps run inside ONE jit (single dispatch + single fetch): the
        # tunnel's per-call round-trip varies 1.5-2x between sessions and would
        # otherwise dominate; see bench.py::_run_steps
        # per-step counts come out as i32 vectors (scan outputs), summed
        # host-side in exact Python ints — an in-carry i32 total wraps
        # negative past 2.1e9 events (same fix as bench.py::_run_steps)
        def many(st0):
            def body(st, _):
                st2, stats = sim.step_fn(st, dt)
                return st2, (stats.events, stats.iterations)

            return jax.lax.scan(body, st0, None, length=args.steps)

        jmany = jax.jit(many)
        out = jmany(state)  # compile + one pass
        float(out[0].fields.energy_tally.sum())
        t0 = time.perf_counter()
        out = jmany(state)
        float(out[0].fields.energy_tally.sum())  # tunnel: scalar fetch syncs
        elapsed = time.perf_counter() - t0
        state = out[0]
        # ONE bulk transfer each, after the clock stops (per-element int()
        # inside the window costs a tunnel round-trip per step)
        events = int(np.asarray(out[1][0]).astype(np.int64).sum())
        iters = int(np.asarray(out[1][1]).astype(np.int64).sum())

    print(json.dumps({
        "events_per_sec": float(f"{events / elapsed:.4g}"),
        "step_s": round(elapsed / args.steps, 4),
        "events": events,
        "iters": iters,
        "steps": args.steps,
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
        "spatial": args.spatial,
        "env": {k: v for k, v in os.environ.items() if k.startswith("JB_")},
    }))


if __name__ == "__main__":
    main()
