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


def spectrum_1d(field, axis=0):
    """1-D power spectrum along one axis, averaged over the other two
    (reference ``power_1d`` :2964 — powerx/powery/powerz files):
    E(k_a) with nk = n_a//2, Parseval-normalised like shell_spectrum."""
    if field.ndim == 3:
        field = field[None]
    n = field.shape[1 + axis]
    ax = 1 + axis
    fk = jnp.fft.fft(field, axis=ax) / n
    pk = 0.5 * jnp.sum(jnp.abs(fk) ** 2, axis=0)
    other = tuple(a for a in range(3) if a != axis)
    pk = jnp.mean(pk, axis=other)
    k = np.abs(np.fft.fftfreq(n) * n).astype(np.int32)
    nk = n // 2
    ek = jax.ops.segment_sum(pk, jnp.asarray(k), num_segments=nk + 1)
    return ek[:nk]


def spectrum_xy(field):
    """Horizontal shell spectrum per z plane (reference ``power_xy``
    :656): E(k_h, z) with k_h = |(k_x, k_y)| integer shells."""
    if field.ndim == 3:
        field = field[None]
    nx, ny, nz = field.shape[1:]
    fk = jnp.fft.fft2(field, axes=(1, 2)) / (nx * ny)
    pk = 0.5 * jnp.sum(jnp.abs(fk) ** 2, axis=0)      # (nx, ny, nz)
    kx = np.fft.fftfreq(nx) * nx
    ky = np.fft.fftfreq(ny) * ny
    kh = np.rint(np.sqrt(kx[:, None] ** 2 + ky[None, :] ** 2)).astype(int)
    nk = max(nx, ny) // 2
    shell = jnp.asarray(kh.ravel())
    ek = jax.vmap(
        lambda p: jax.ops.segment_sum(p.reshape(nx * ny), shell,
                                      num_segments=nk + 1),
        in_axes=2, out_axes=1)(pk)
    return ek[:nk]                                    # (nk, nz)


def helicity_spectrum(vec, curl_vec, spec):
    """Shell spectra of energy and helicity (reference ``powerhel``
    :1024): for magnetic sp='mag', pass (aa, bb) → (E_M(k), H_M(k)) with
    H = shell Re(a·b*); for kinetic pass (oo, uu) likewise."""
    n = vec.shape[1:]
    norm = n[0] * n[1] * n[2]
    fa = jnp.fft.fftn(vec, axes=(-3, -2, -1)) / norm
    fb = jnp.fft.fftn(curl_vec, axes=(-3, -2, -1)) / norm
    e_dens = 0.5 * jnp.sum(jnp.abs(fb) ** 2, axis=0)
    h_dens = jnp.sum(jnp.real(fa * jnp.conj(fb)), axis=0)
    kx = np.fft.fftfreq(n[0]) * n[0]
    ky = np.fft.fftfreq(n[1]) * n[1]
    kz = np.fft.fftfreq(n[2]) * n[2]
    kmag = np.sqrt(kx[:, None, None] ** 2 + ky[None, :, None] ** 2
                   + kz[None, None, :] ** 2)
    shell = jnp.asarray(np.rint(kmag).astype(np.int32).ravel())
    nk = max(n) // 2
    ek = jax.ops.segment_sum(e_dens.ravel(), shell, num_segments=nk + 1)
    hk = jax.ops.segment_sum(h_dens.ravel(), shell, num_segments=nk + 1)
    return ek[:nk], hk[:nk]
