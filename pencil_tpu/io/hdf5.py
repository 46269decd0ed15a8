"""HDF5 snapshot I/O — the reference's ``IO = io_hdf5`` strategy
(``src/io_hdf5.f90``: single file ``data/allprocs/var.h5`` holding per-
component ghosted datasets under ``data/``, the grid under ``grid/``, and
persistent records under ``persist/``; read back by the reference python
package, python/pencil/read/varfile.py:330-356).

Layout written here (matching the reader's expectations):
    data/<comp>   (mz, my, mx) float — ghosted, z-major like the Fortran
    time          scalar
    grid/x|y|z    ghosted 1-D coordinate vectors
    grid/dx|dy|dz scalars
    persist/*     optional records (e.g. shear_delta_y)
"""
from __future__ import annotations

import os

import numpy as np


def write_var_h5(path, fields_stack, comp_names, x, y, z, dx, dy, dz, t,
                 persist=None):
    """fields_stack: ghosted (nf, mx, my, mz) numpy array."""
    import h5py
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with h5py.File(path, "w") as fh:
        grp = fh.create_group("data")
        for i, name in enumerate(comp_names):
            # reference stores Fortran (mx,my,mz) column-major = C (mz,my,mx)
            grp.create_dataset(name, data=fields_stack[i].T)
        fh.create_dataset("time", data=np.float64(t))
        gg = fh.create_group("grid")
        gg.create_dataset("x", data=np.asarray(x, np.float64))
        gg.create_dataset("y", data=np.asarray(y, np.float64))
        gg.create_dataset("z", data=np.asarray(z, np.float64))
        gg.create_dataset("dx", data=np.float64(dx))
        gg.create_dataset("dy", data=np.float64(dy))
        gg.create_dataset("dz", data=np.float64(dz))
        gg.create_dataset("Lx", data=np.float64(x[-1] - x[0]))
        gg.create_dataset("Ly", data=np.float64(y[-1] - y[0]))
        gg.create_dataset("Lz", data=np.float64(z[-1] - z[0]))
        if persist:
            pg = fh.create_group("persist")
            for k, v in persist.items():
                pg.create_dataset(k, data=np.atleast_1d(v))


def read_var_h5(path):
    """→ (fields {comp: (mx,my,mz)}, t, grid dict)."""
    import h5py
    out = {}
    with h5py.File(path, "r") as fh:
        for k in fh["data"]:
            out[k] = np.asarray(fh["data"][k]).T
        t = float(np.asarray(fh["time"]))
        grid = {k: np.asarray(fh["grid"][k]) for k in fh["grid"]}
    return out, t, grid


def import_state_h5(model, path, key_seed=0):
    """Build a framework state from a reference-layout ``var.h5`` —
    the read half of the ``IO = io_hdf5`` strategy (``src/io_hdf5.f90``
    input_snap → the same ``data/<comp>`` (mz,my,mx) datasets, ``time``
    scalar and ``persist/`` records this module writes).  Component
    datasets are matched to the model's registry slots by name; missing
    aux slots stay at their init value."""
    import jax.numpy as jnp
    import jax

    if os.path.isdir(path):
        path = os.path.join(path, "allprocs", "var.h5")
    fields_g, t, grid = read_var_h5(path)
    reg = model.reg
    gs = model.cfg.grid
    g = gs.nghost
    state = model.init_state(key_seed)
    dtype = model.dtype
    out = dict(state["fields"])
    comp_of = {}
    for name, slot in reg.slots.items():
        for ci in range(slot.ncomp):
            comp_of[reg.comp_names[slot.start + ci]] = (name, ci)
    for cn, arr in fields_g.items():
        if cn not in comp_of:
            continue
        name, ci = comp_of[cn]
        interior = jnp.asarray(arr[g:-g, g:-g, g:-g], dtype)
        if reg.slots[name].ncomp == 1:
            out[name] = interior
        else:
            out[name] = out[name].at[ci].set(interior)
    state["fields"] = out
    state["t"] = jnp.asarray(t, state["t"].dtype)
    return state


def export_state_h5(model, state, datadir):
    """Dump a framework state as a reference-layout HDF5 data directory
    (dim.dat + allprocs/var.h5 + index.pro + param.nml with
    io_strategy='HDF5') readable by the reference python package."""
    from ..compat.io_dist import write_dim, write_param_nml
    os.makedirs(datadir, exist_ok=True)
    reg = model.reg
    gs = model.cfg.grid
    fa = np.asarray(reg.stack(state["fields"]))
    g = gs.nghost
    fg = np.pad(fa, ((0, 0), (g, g), (g, g), (g, g)), mode="wrap")
    write_dim(os.path.join(datadir, "dim.dat"), gs.mx, gs.my, gs.mz,
              reg.nvar, reg.nf - reg.nvar)   # global form (4-int proc line)
    grid = model.grid
    write_var_h5(os.path.join(datadir, "allprocs", "var.h5"), fg,
                 reg.comp_names,
                 np.asarray(grid.x), np.asarray(grid.y), np.asarray(grid.z),
                 gs.dx, gs.dy, gs.dz, float(np.asarray(state["t"])))
    # grid.h5 (read by python/pencil/read/grids.py:109-129)
    import h5py
    with h5py.File(os.path.join(datadir, "grid.h5"), "w") as fh:
        gg = fh.create_group("grid")
        for k, v in (("x", grid.x), ("y", grid.y), ("z", grid.z),
                     ("dx_1", grid.dx_1), ("dy_1", grid.dy_1),
                     ("dz_1", grid.dz_1), ("dx_tilde", grid.dx_tilde),
                     ("dy_tilde", grid.dy_tilde), ("dz_tilde", grid.dz_tilde)):
            gg.create_dataset(k, data=np.asarray(v, np.float64))
        for k, v in (("dx", gs.dx), ("dy", gs.dy), ("dz", gs.dz),
                     ("Lx", gs.Lx), ("Ly", gs.Ly), ("Lz", gs.Lz)):
            gg.create_dataset(k, data=np.float64(v))
        # settings group (read by python/pencil/read/dims.py:95-129)
        st = fh.create_group("settings")
        vals = dict(mx=gs.mx, my=gs.my, mz=gs.mz, mvar=reg.nvar,
                    maux=reg.nf - reg.nvar, mglobal=0, nghost=g,
                    nprocx=1, nprocy=1, nprocz=1,
                    nx=gs.nx, ny=gs.ny, nz=gs.nz,
                    l1=g, l2=g + gs.nx - 1, m1=g, m2=g + gs.ny - 1,
                    n1=g, n2=g + gs.nz - 1)
        for k, v in vals.items():
            st.create_dataset(k, data=np.int32(v))
        st.create_dataset("precision", data=b"S")
    with open(os.path.join(datadir, "index.pro"), "w") as f:
        for i, name in enumerate(reg.comp_names):
            f.write(f"i{name}={i + 1}\n")
    write_param_nml(os.path.join(datadir, "param.nml"), model,
                    io_strategy="HDF5")
