"""Shell-integrated power spectra (reference ``src/power_spectrum.f90``:
``power`` :308, ``powersnap`` driver src/run.f90:480,825; output files
``data/power_kin.dat`` etc. — one row of E(k) per dump, k-shells of unit
width in box-wavenumber units)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def shell_spectrum(field, spec):
    """E(k) shell-integrated over integer-k shells.

    field: (ncomp, nx, ny, nz) or (nx, ny, nz); returns (nk,) with
    nk = max(n)//2, normalized so sum(E) = mean energy 0.5<|f|²> for vector
    fields (Parseval)."""
    if field.ndim == 3:
        field = field[None]
    n = field.shape[1:]
    fk = jnp.fft.fftn(field, axes=(-3, -2, -1)) / (n[0] * n[1] * n[2])
    pk = 0.5 * jnp.sum(jnp.abs(fk) ** 2, axis=0)
    kx = np.fft.fftfreq(n[0]) * n[0]
    ky = np.fft.fftfreq(n[1]) * n[1]
    kz = np.fft.fftfreq(n[2]) * n[2]
    kmag = np.sqrt(kx[:, None, None] ** 2 + ky[None, :, None] ** 2
                   + kz[None, None, :] ** 2)
    shell = jnp.asarray(np.rint(kmag).astype(np.int32))
    nk = max(n) // 2
    ek = jax.ops.segment_sum(pk.ravel(), shell.ravel(), num_segments=nk + 1)
    return ek[:nk]


class SpectrumWriter:
    """Appends spectra in the reference format: a time line then the E(k)
    values (reference power_spectrum.f90 output; read by
    python/pencil/read/powers.py)."""

    def __init__(self, path):
        self.path = path

    def append(self, t, ek):
        ek = np.asarray(ek)
        with open(self.path, "a") as f:
            f.write(f"{float(t):.6e}\n")
            for i in range(0, len(ek), 8):
                f.write(" ".join(f"{v:.6e}" for v in ek[i:i + 8]) + "\n")


def read_spectrum(path):
    """Read back (times, spectra) from a power_*.dat file."""
    times, spectra, cur = [], [], []
    with open(path) as f:
        for line in f:
            vals = line.split()
            if len(vals) == 1 and (not cur or len(cur) > 0):
                if cur:
                    spectra.append(np.asarray(cur, np.float64))
                    cur = []
                times.append(float(vals[0]))
            else:
                cur.extend(float(v) for v in vals)
    if cur:
        spectra.append(np.asarray(cur, np.float64))
    return np.asarray(times), np.asarray(spectra)
