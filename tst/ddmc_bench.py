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
    ap.add_argument("--hybrid", action="store_true",
                    help="probe the genuine per-cell IMC/DDMC hybrid: the "
                    "stepdiff_smr_hybrid deck at its native 128x64 SMR size, "
                    "where tau_ddmc=5 puts the refined box (tau=3.9) on the "
                    "IMC branch and the coarse cells (tau=7.8) on DDMC in "
                    "the SAME kernel (reference transport_ddmc.cpp:135)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from scipy.special import erf

    from jaybenne_tpu import config as cfg_mod
    from jaybenne_tpu.driver import Simulation
    from jaybenne_tpu.utils.deck import Deck

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.hybrid:
        # acceptance-gate mesh size (64x32, 16^2 blocks — where the 0.3
        # per-cell gate is proven affordable at 100k particles) with
        # tau_ddmc=10 so the refinement jump splits the branches: fine cells
        # tau = sigma*dx = 7.8 -> IMC, coarse tau = 15.6 -> DDMC, both live
        # in ONE kernel. (The deck's native 128x64 size achieves the same
        # split at its own tau_ddmc=5, but its per-cell MC noise at 100k
        # particles is ~0.5 — measured r5 — so it cannot carry an accuracy
        # gate; tst/logs/r5_hybrid.json records that capability point.)
        deck_name = "inputs/stepdiff_smr_hybrid.in"
        deck = Deck.from_file(os.path.join(here, deck_name)).update(
            {
                "parthenon/mesh/nx1": 64,
                "parthenon/mesh/nx2": 32,
                "parthenon/meshblock/nx1": 16,
                "parthenon/meshblock/nx2": 16,
                "jaybenne/tau_ddmc": 10.0,
                "jaybenne/num_particles": args.particles,
            }
        )
    else:
        deck_name = "inputs/stepdiff.in" if args.imc else "inputs/stepdiff_ddmc.in"
        deck = Deck.from_file(os.path.join(here, deck_name)).update(
            {
                "parthenon/mesh/nx1": args.nx,
                "parthenon/meshblock/nx1": args.nx,
                "jaybenne/num_particles": args.particles,
            }
        )
    sim = Simulation(cfg_mod.from_deck(deck), quiet=True)
    if args.hybrid:
        # report the per-cell branch split this config actually exercises
        dmin = np.asarray(sim.mesh.block_dx)[:, : sim.cfg.mesh.ndim].min(axis=1)
        sig = float(sim.cfg.mcblock.scattering_constant_value)
        tau = dmin * sig
        ddmc_blocks = int((tau > sim.cfg.jaybenne.tau_ddmc).sum())
        hybrid_split = {
            "ddmc_blocks": ddmc_blocks,
            "imc_blocks": int(tau.size - ddmc_blocks),
        }
        assert 0 < ddmc_blocks < tau.size, (
            "config is not a genuine hybrid: every block on one branch"
        )
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
    # sol-weighted fractional error; cells where BOTH sol and tally are zero
    # (possible on the 2D SMR mesh's far field) contribute 0, not 0/0 = NaN
    den = np.abs((sol + tally) / 2)
    werr = (
        np.where(den > 0, np.abs(sol - tally) / np.where(den > 0, den, 1.0), 0.0)
        * sol
    ).sum() / sol.sum()

    # hybrid runs the 2D SMR acceptance deck, gated at its reference tolerance
    tol = 0.3 if args.hybrid else 0.05
    out_row = {
        "mode": "hybrid" if args.hybrid else ("imc" if args.imc else "ddmc"),
        "events_per_sec": float(f"{events / elapsed:.4g}"),
        "step_ms": round(1e3 * elapsed / n_timed, 3),
        "events": events + events0,
        "iters": iters,
        "steps": args.steps,
        "werr": float(f"{werr:.4g}"),
        "accuracy_pass": bool(werr <= tol),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
        "env": {k: v for k, v in os.environ.items() if k.startswith("JB_")},
    }
    if args.hybrid:
        out_row["hybrid_split"] = hybrid_split
    print(json.dumps(out_row))


if __name__ == "__main__":
    main()
