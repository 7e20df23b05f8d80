#!/usr/bin/env python
"""Measured VPU op-rate ceiling for the census-kernel roofline (BENCH.md).

The census kernels are VPU-bound (no MXU work, VMEM-resident loops), so the
relevant hardware ceiling is the sustained elementwise-op issue rate at the
kernels' own tile shape — not a FLOPs-sheet number. This probe times a Pallas
loop whose body is K chained f32 multiply-adds on a (BSUB, 128) tile (the
grid kernel's shape) for several K, and fits ops/s from the slope; the
intercept is the loop/cond overhead the COND_EVERY knob amortizes. A second
mode times the chunked slab-scan gather (`_gather`) the same way, giving the
measured cost of the kernels' one remaining table access pattern.

Usage:  python tst/vpu_roofline.py [--iters N] [--tiles T]
Prints one JSON line with the fitted rates; run on the TPU (one process).
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
    ap.add_argument("--iters", type=int, default=2000,
                    help="loop iterations per kernel call")
    ap.add_argument("--tiles", type=int, default=64,
                    help="grid tiles per call (amortizes per-call overhead)")
    ap.add_argument("--repeat", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from jaybenne_tpu.ops.pallas_grid import BSUB, LANES
    from jaybenne_tpu.ops.pallas_transport import GREP, _chunk_table, _gather

    shape = (BSUB, LANES)
    interpret = jax.default_backend() != "tpu"

    def time_kernel(body_ops, K):
        """Wall time of `iters` loop iterations whose body applies the given
        op chain; one jit, timed on the second call, scalar-fetch synced."""

        def kern(x_ref, tab_ref, o_ref):
            def body(c):
                x, it = c
                return (body_ops(x, tab_ref), it + 1)

            def cond(c):
                return c[1] < args.iters

            x, _ = jax.lax.while_loop(cond, body, (x_ref[:], jnp.int32(0)))
            o_ref[:] = x

        spec = pl.BlockSpec(shape, lambda g: (g, 0), memory_space=pltpu.VMEM)
        tab_spec = pl.BlockSpec(
            (K * GREP, LANES), lambda g: (0, 0), memory_space=pltpu.VMEM
        )
        call = pl.pallas_call(
            kern,
            grid=(args.tiles,),
            in_specs=[spec, tab_spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(
                (args.tiles * BSUB, LANES), jnp.float32
            ),
            interpret=interpret,
        )
        jc = jax.jit(call)
        x0 = jnp.ones((args.tiles * BSUB, LANES), jnp.float32) * 0.5
        tab = _chunk_table(
            jnp.arange(K * LANES, dtype=jnp.float32), jnp.float32, K
        ).reshape(K * GREP, LANES)
        float(jc(x0, tab)[0, 0])  # compile + run
        best = 1e99
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            float(jc(x0, tab)[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    # --- chained-FMA ceiling: slope over K gives s/op; per (BSUB,128) tile ---
    def fma_chain(n):
        def ops(x, tab_ref):
            del tab_ref
            for _ in range(n):
                x = x * jnp.float32(0.9999) + jnp.float32(1e-6)
            return x
        return ops

    KS = (8, 32, 64)
    times = {k: time_kernel(fma_chain(k), 1) for k in KS}
    # linear fit t = a + b*k over the two extremes
    b = (times[KS[-1]] - times[KS[0]]) / (KS[-1] - KS[0])
    a = times[KS[0]] - b * KS[0]
    per_op_s = b / (args.iters * args.tiles)  # one (BSUB,128) vector op
    lane_ops_per_s = (BSUB * LANES) / per_op_s
    loop_overhead_s = a / (args.iters * args.tiles)  # per tile-iteration

    # --- chunk-scan gather: time _gather over a K-chunk table -----------------
    def gather_body(K):
        def ops(x, tab_ref):
            idx = (x.astype(jnp.int32) & (K * LANES - 1))
            g = _gather(tab_ref, idx, K)
            return x + g * jnp.float32(1e-9)
        return ops

    KG = (16, 64)
    gt = {k: time_kernel(gather_body(k), k) for k in KG}
    g_slope = (gt[KG[1]] - gt[KG[0]]) / (KG[1] - KG[0])
    per_chunk_s = g_slope / (args.iters * args.tiles)
    chunk_in_ops = per_chunk_s / per_op_s

    print(json.dumps({
        "tile": [BSUB, LANES],
        "vector_op_s": float(f"{per_op_s:.4g}"),
        "lane_ops_per_s": float(f"{lane_ops_per_s:.4g}"),
        "tile_iter_overhead_s": float(f"{loop_overhead_s:.4g}"),
        "gather_chunk_s": float(f"{per_chunk_s:.4g}"),
        "gather_chunk_in_vector_ops": float(f"{chunk_in_ops:.3g}"),
        "iters": args.iters,
        "tiles": args.tiles,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
