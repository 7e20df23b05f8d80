#!/usr/bin/env python
"""Dump plotter — the equivalent of the reference's ``analysis/plot.py``:

  * ``--dim 1``: per-block 1D line profiles of a cell variable;
  * ``--dim 2``: 2D pcolormesh of a variable slice, with optional particle scatter
    (``--particles``) and meshblock outlines (``--blocks``).

Usage: ``python analysis/plot.py <dump.phdf> <variable> [--dim {1,2}] [-o out.png]``
"""

from __future__ import annotations

import argparse
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jhdf


def plot_1d(dump, variable, ax):
    v = dump.Get(variable)
    for nb in range(dump.NumBlocks):
        ax.plot(dump.X1c[nb, 0, 0, :], v[nb, 0, 0, :], marker=".", ms=3, lw=1)
    ax.set_xlabel("x")
    ax.set_ylabel(variable)


def plot_2d(dump, variable, ax, show_particles=False, show_blocks=False):
    v = dump.Get(variable)
    vmin, vmax = float(np.nanmin(v)), float(np.nanmax(v))
    for nb in range(dump.NumBlocks):
        xn = dump.X1n[nb]
        yn = dump.X2n[nb]
        pc = ax.pcolormesh(
            xn, yn, v[nb, 0, :, :], vmin=vmin, vmax=vmax, shading="flat"
        )
        if show_blocks:
            bb = dump.BlockBounds[nb]
            ax.plot(
                [bb[0], bb[1], bb[1], bb[0], bb[0]],
                [bb[2], bb[2], bb[3], bb[3], bb[2]],
                "k-", lw=0.5,
            )
    if show_particles:
        try:
            x = dump.GetSwarm("photons", "swarm.x")
            y = dump.GetSwarm("photons", "swarm.y")
            ax.plot(x, y, "k.", ms=0.5, alpha=0.3)
        except KeyError:
            print("no swarm data in dump; skipping particles")
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_aspect("equal")
    plt.colorbar(pc, ax=ax, label=variable)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dumpfile")
    ap.add_argument("variable")
    ap.add_argument("--dim", type=int, default=1, choices=[1, 2])
    ap.add_argument("--particles", action="store_true")
    ap.add_argument("--blocks", action="store_true")
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args(argv)

    dump = jhdf.jhdf(args.dumpfile)
    fig, ax = plt.subplots(figsize=(8, 5))
    if args.dim == 1:
        plot_1d(dump, args.variable, ax)
    else:
        plot_2d(dump, args.variable, ax, args.particles, args.blocks)
    ax.set_title(f"{os.path.basename(args.dumpfile)}  t={dump.Time:.3e}")
    out = args.output or (
        os.path.splitext(os.path.basename(args.dumpfile))[0]
        + f".{args.variable}.png"
    )
    fig.savefig(out, dpi=150, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
