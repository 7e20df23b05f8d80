#!/usr/bin/env python
"""Single-point DDMC throughput probe (the bench.py `ddmc` row, alone).

One process = one measurement so kernel tunables picked up at import time
(JB_SUBLANES, JB_COND_EVERY) apply cleanly. The config is the stepdiff_ddmc
acceptance problem at full bench size (128 cells, 100k particles) through the
VMEM-resident mega-kernel's DDMC branch. Prints one JSON line with the rate,
per-step wall time, and the same erf accuracy gate bench.py applies.

Usage:
    python tst/ddmc_bench.py [--steps N] [--particles N]
    JB_SUBLANES=16 python tst/ddmc_bench.py     # tile-width sweep point
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DT = 3.335641e-11


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--nx", type=int, default=128)
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--imc", action="store_true",
                    help="probe the plain stepdiff deck instead (IMC baseline "
                    "for wall-clock/step comparison at the same tile width)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from scipy.special import erf

    from jaybenne_tpu import config as cfg_mod
    from jaybenne_tpu.driver import Simulation
    from jaybenne_tpu.utils.deck import Deck

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    deck_name = "inputs/stepdiff.in" if args.imc else "inputs/stepdiff_ddmc.in"
    deck = Deck.from_file(os.path.join(here, deck_name)).update(
        {
            "parthenon/mesh/nx1": args.nx,
            "parthenon/meshblock/nx1": args.nx,
            "jaybenne/num_particles": args.particles,
        }
    )
    sim = Simulation(cfg_mod.from_deck(deck), quiet=True)
    dt = jnp.float32(DT)

    t0 = time.perf_counter()
    state, stats = sim.step_fn(sim.state, dt)
    float(state.fields.energy_tally.sum())  # scalar fetch: tunnel-safe sync
    compile_s = time.perf_counter() - t0
    events0 = int(stats.events)
    n_timed = args.steps - 1

    def many(st0):
        def body(st, _):
            st2, stats = sim.step_fn(st, dt)
            return st2, (stats.events, stats.iterations)

        return jax.lax.scan(body, st0, None, length=n_timed)

    jmany = jax.jit(many)
    out = jmany(state)  # compile + one pass
    float(out[0].fields.energy_tally.sum())
    t0 = time.perf_counter()
    out = jmany(state)
    float(out[0].fields.energy_tally.sum())
    elapsed = time.perf_counter() - t0
    state = out[0]
    events = int(np.asarray(out[1][0]).astype(np.int64).sum())
    iters = int(np.asarray(out[1][1]).astype(np.int64).sum())

    # same analytic accuracy gate as bench.py (tol 0.05)
    tally = np.asarray(state.fields.energy_tally).reshape(-1)
    xc = np.asarray(sim.mesh.cell_centers()[0]).reshape(-1)
    t = args.steps * DT
    tau_c, ur0, shift = 1.000692e-7, 7.5646e5, 0.5
    sol = ur0 / 2.0 * (
        erf(((xc + shift) + 0.5) / (2.0 * np.sqrt(t / tau_c)))
        - erf(((xc + shift) - 0.5) / (2.0 * np.sqrt(t / tau_c)))
    )
    werr = (np.abs(sol - tally) / np.abs((sol + tally) / 2) * sol).sum() / sol.sum()

    print(json.dumps({
        "mode": "imc" if args.imc else "ddmc",
        "events_per_sec": float(f"{events / elapsed:.4g}"),
        "step_ms": round(1e3 * elapsed / n_timed, 3),
        "events": events + events0,
        "iters": iters,
        "steps": args.steps,
        "werr": float(f"{werr:.4g}"),
        "accuracy_pass": bool(werr <= 0.05),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
        "env": {k: v for k, v in os.environ.items() if k.startswith("JB_")},
    }))


if __name__ == "__main__":
    main()
