"""Dump reader — the equivalent of the reference's ``analysis/jhdf.py`` (a thin
subclass of Parthenon's ``phdf``): loads a ``.phdf`` dump written by
``jaybenne_tpu.io`` and reconstructs per-block node/center coordinates and variables.

Reads BOTH dump layouts the package writes: the native compact schema
(``file_type = hdf5``) and the Parthenon binary layout
(``file_type = phdf_parthenon`` — the structure ``parthenon_tools.phdf``
understands, so that file also opens in the reference's own analysis stack).

Exposes the same surface the regression harness and plotter consume:
``Time``, ``NumBlocks``, ``NX1/NX2/NX3``, ``X1c/X2c/X3c`` (shape
``[n_blocks, nz, ny, nx]``), ``X1n/X2n/X3n`` (nodes), ``BlockBounds``, and
``Get(variable_name)``.
"""

from __future__ import annotations

import h5py
import numpy as np

# dataset names that are structure, not output variables, in a Parthenon file
# (the same exclusion list the reference's jhdf applies, analysis/jhdf.py:95-104)
_NON_VAR_KEYS = {
    "Blocks", "Info", "Input", "Levels", "Locations", "LogicalLocations",
    "Params", "SparseInfo", "VolumeLocations",
}


class jhdf:
    def __init__(self, filename):
        self.file = filename
        with h5py.File(filename, "r") as h:
            if "Info" in h:
                self._read_parthenon(h)
            else:
                self._read_native(h)

        nb, nx, ny, nz = self.NumBlocks, self.NX1, self.NX2, self.NX3
        shape = (nb, nz, ny, nx)
        ii = np.arange(nx)
        jj = np.arange(ny)
        kk = np.arange(nz)
        self.X1c = (
            self.origin[:, 0][:, None, None, None]
            + (ii[None, None, None, :] + 0.5) * self.dx[:, 0][:, None, None, None]
        ) * np.ones(shape)
        self.X2c = (
            self.origin[:, 1][:, None, None, None]
            + (jj[None, None, :, None] + 0.5) * self.dx[:, 1][:, None, None, None]
        ) * np.ones(shape)
        self.X3c = (
            self.origin[:, 2][:, None, None, None]
            + (kk[None, :, None, None] + 0.5) * self.dx[:, 2][:, None, None, None]
        ) * np.ones(shape)
        # block node coordinates (outline corners), shape [nb, n+1]
        self.X1n = self.origin[:, 0][:, None] + np.arange(nx + 1)[None, :] * self.dx[:, 0][:, None]
        self.X2n = self.origin[:, 1][:, None] + np.arange(ny + 1)[None, :] * self.dx[:, 1][:, None]
        self.X3n = self.origin[:, 2][:, None] + np.arange(nz + 1)[None, :] * self.dx[:, 2][:, None]
        # per-block physical bounds [nb, 6] = (x1lo, x1hi, x2lo, x2hi, x3lo, x3hi)
        self.BlockBounds = np.stack(
            [
                self.origin[:, 0], self.origin[:, 0] + nx * self.dx[:, 0],
                self.origin[:, 1], self.origin[:, 1] + ny * self.dx[:, 1],
                self.origin[:, 2], self.origin[:, 2] + nz * self.dx[:, 2],
            ],
            axis=1,
        )

    # ------------------------------------------------------------------ layouts
    def _read_native(self, h):
        self.Time = float(h.attrs["Time"])
        self.NCycle = int(h.attrs["NCycle"])
        self.NumBlocks = int(h.attrs["NumBlocks"])
        self.ndim = int(h.attrs["ndim"])
        self.NX1 = int(h.attrs["NX1"])
        self.NX2 = int(h.attrs["NX2"])
        self.NX3 = int(h.attrs["NX3"])
        self.bounds = np.asarray(h.attrs["bounds"])
        self.origin = h["blocks/origin"][...]
        self.dx = h["blocks/dx"][...]
        self.level = h["blocks/level"][...]
        self._vars = {k: h[f"vars/{k}"][...] for k in h.get("vars", {})}
        self._swarm = {}
        if "swarm" in h:
            for sname in h["swarm"]:
                for vname in h[f"swarm/{sname}"]:
                    self._swarm[(sname, vname)] = h[f"swarm/{sname}/{vname}"][...]

    def _read_parthenon(self, h):
        info = h["Info"].attrs
        self.Time = float(info["Time"])
        self.NCycle = int(info["NCycle"])
        self.NumBlocks = int(info["NumMeshBlocks"])
        self.ndim = int(info["NumDims"])
        mbs = np.asarray(info["MeshBlockSize"])
        self.NX1, self.NX2, self.NX3 = int(mbs[0]), int(mbs[1]), int(mbs[2])
        dom = np.asarray(info["RootGridDomain"], dtype=np.float64)
        self.bounds = np.asarray([dom[0], dom[1], dom[3], dom[4], dom[6], dom[7]])
        nodes = [h["Locations/x"][...], h["Locations/y"][...], h["Locations/z"][...]]
        self.origin = np.stack([n[:, 0] for n in nodes], axis=1)
        self.dx = np.stack([n[:, 1] - n[:, 0] for n in nodes], axis=1)
        self.level = h["Levels"][...]
        self._vars = {
            k: h[k][...]
            for k in h.keys()
            if k not in _NON_VAR_KEYS and isinstance(h[k], h5py.Dataset)
        }
        self._swarm = {}
        for sname in h.keys():
            if sname in _NON_VAR_KEYS or not isinstance(h[sname], h5py.Group):
                continue
            if sname in ("Locations", "VolumeLocations"):
                continue
            for vname in h[sname]:
                if vname in ("counts", "offsets"):
                    # per-block bookkeeping datasets, not swarm variables —
                    # registering them would pollute the GetSwarm surface
                    # with [B]-shaped arrays among [n_particles] ones
                    continue
                self._swarm[(sname, f"swarm.{vname}")] = h[f"{sname}/{vname}"][...]
                self._swarm[(sname, vname)] = h[f"{sname}/{vname}"][...]

    # ------------------------------------------------------------------ access
    def Get(self, variable):
        """Cell variable as ``[n_blocks, nz, ny, nx]``."""
        if variable in self._vars:
            return self._vars[variable]
        raise KeyError(
            f"variable {variable!r} not in dump (have {sorted(self._vars)})"
        )

    def GetSwarm(self, swarm, variable):
        return self._swarm[(swarm, variable)]
