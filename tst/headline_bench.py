#!/usr/bin/env python
"""Single-point headline throughput probe (bench.py's stepdiff row, alone).

One process = one measurement, so mega-kernel tunables picked up from the
environment at import time (JB_SUBLANES) apply cleanly; every invocation pays
one cold compile (~1-2 min on the tunneled v5e) and then times the production
step path exactly as bench.py does (warmup step, then N-1 steps inside one
jitted lax.scan). Prints one JSON line.

Usage:
    python tst/headline_bench.py [--steps N] [--nx N] [--particles N]
    JB_SUBLANES=64 python tst/headline_bench.py     # tile-width sweep point
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--nx", type=int, default=128)
    ap.add_argument("--block", type=int, default=0, help="0 = single block")
    ap.add_argument("--particles", type=int, default=100_000)
    args = ap.parse_args()

    import jax.numpy as jnp

    import bench
    from jaybenne_tpu import config as cfg_mod
    from jaybenne_tpu.driver import Simulation
    from jaybenne_tpu.utils.deck import Deck

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    deck = Deck.from_file(os.path.join(here, "inputs/stepdiff.in")).update(
        {
            "parthenon/mesh/nx1": args.nx,
            "parthenon/meshblock/nx1": args.block or args.nx,
            "jaybenne/num_particles": args.particles,
        }
    )
    sim = Simulation(cfg_mod.from_deck(deck), quiet=True)
    rate, events, _, elapsed = bench._run_steps(
        sim, jnp.float32(3.335641e-11), args.steps
    )
    print(json.dumps({
        "events_per_sec": float(f"{rate:.4g}"),
        "events_total": events,
        "elapsed_s": round(elapsed, 3),
        "sublanes": int(os.environ.get("JB_SUBLANES", "128")),
        "nx": args.nx,
        "block": args.block or args.nx,
    }))


if __name__ == "__main__":
    main()
