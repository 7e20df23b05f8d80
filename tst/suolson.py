#!/usr/bin/env python
"""Su-Olson-type external-volume-source gate (``inputs/suolson.in``).

Criterion (exact bookkeeping): with both particle boundaries reflecting the
slab is closed, so at any time

    E_matter(t) + E_radiation(t) - E(0)  ==  q * V_src * min(t, tmax)

to MC-free accuracy — the external injection is the only energy entering the
system, emission/absorption only move energy between the two reservoirs, and
the per-cell particle budget divides the 16 source cells evenly (npc = 500,
zero fractional part) so the injected total is exact, not just in expectation.
This gates the external source, emission debit, absorption deposit, feedback,
and the power-law-cv EOS together through the real driver + dump pipeline.
"""

import sys

sys.dont_write_bytecode = True

import os
import tempfile

import numpy as np

import regression_test as rt

parser = rt.get_default_parser()
parser.set_defaults(input="suolson.in")
args = parser.parse_args()

modified_inputs = rt._merge_overrides(
    args,
    {
        # close the system: bookkeeping needs no escaped-energy ledger
        "parthenon/swarm/ix1_bc": "jaybenne_reflecting",
        "parthenon/swarm/ox1_bc": "jaybenne_reflecting",
    },
)

input_file = os.path.join(rt._ROOT, "inputs", args.input)
outdir = tempfile.mkdtemp(prefix="jbtpu_suolson_")

print("\n=== SU-OLSON EXTERNAL-SOURCE BOOKKEEPING GATE ===")
print(f"= input:     {args.input}")
print(f"= n_devices: {args.n_devices}")
print("=================================================\n")

sim = rt.run_problem(
    input_file, modified_inputs, outdir,
    n_devices=args.n_devices, precision=args.precision,
    decomposition=getattr(args, "decomposition", None),
)
dump = rt._load_last_dump(sim.cfg.problem_id, outdir)

jb = sim.cfg.jaybenne
mc = sim.cfg.mcblock
mesh = sim.cfg.mesh
t_end = float(dump.Time)

dv = float(np.asarray(sim.mesh.block_volume)[0])
sie = np.asarray(dump.Get("field.material.sie"), np.float64)
tally = np.asarray(dump.Get("field.jaybenne.energy_tally"), np.float64)
e_mat = (mc.initial_density * sie).sum() * dv
e_rad = tally.sum() * dv

# initial matter energy: uniform rho0, T0 through the power-law-cv EOS
eos = mc.build_eos()
sie0 = float(eos.internal_energy_from_density_temperature(
    mc.initial_density, mc.initial_temperature
))
vol_tot = (mesh.x1max - mesh.x1min) * (mesh.x2max - mesh.x2min) * (
    mesh.x3max - mesh.x3min
)
e0 = mc.initial_density * sie0 * vol_tot

box = jb.external_source_box
v_src = (box[1] - box[0]) * (box[3] - box[2]) * (box[5] - box[4])
injected = jb.external_source_q * v_src * min(t_end, jb.external_source_tmax)

gain = e_mat + e_rad - e0
err = abs(gain - injected) / injected
print(f"  matter  = {e_mat:.6e}")
print(f"  radiation = {e_rad:.6e}")
print(f"  gain    = {gain:.6e}")
print(f"  injected = {injected:.6e}")
print(f"  fractional error = {err:.3e} (tolerance 1e-2)")

if err <= 1.0e-2 and int(sim.state.overflow) == 0:
    print("TEST PASSED")
    sys.exit(0)
print("TEST FAILED")
sys.exit(1)
