"""Spectra breadth (reference power_spectrum.f90 power_1d :2964,
power_xy :656, powerhel :1024)."""
import jax.numpy as jnp
import numpy as np

from pencil_tpu.io.spectra import (helicity_spectrum, shell_spectrum,
                                   spectrum_1d, spectrum_xy)
from pencil_tpu import GridSpec


def _grid(n=32):
    x = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.meshgrid(x, x, x, indexing="ij")


def test_spectrum_1d_single_mode():
    n = 32
    X, Y, Z = _grid(n)
    f = jnp.asarray(2.0 * np.cos(3 * X))
    ek = np.asarray(spectrum_1d(f, axis=0))
    # power concentrated at k=3: 0.5·<f²> = 1.0
    assert np.argmax(ek) == 3
    np.testing.assert_allclose(ek.sum(), 1.0, rtol=1e-5)


def test_spectrum_xy_mode_and_z_dependence():
    n = 32
    X, Y, Z = _grid(n)
    f = jnp.asarray(np.cos(4 * X) * (1.0 + np.sin(Z) ** 2))
    ek = np.asarray(spectrum_xy(f))
    assert ek.shape == (n // 2, n)
    # kh=4 dominates at every z
    assert (np.argmax(ek, axis=0) == 4).all()
    # z-dependence: plane energy proportional to (1+sin²z)²
    z = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ratio = ek[4] / ek[4].max()
    expect = (1 + np.sin(z) ** 2) ** 2
    np.testing.assert_allclose(ratio, expect / expect.max(), rtol=1e-4)


def test_helicity_spectrum_beltrami():
    """A Beltrami field (curl B = k B) is maximally helical:
    |H(k)| = 2 E(k)/k."""
    n = 32
    X, Y, Z = _grid(n)
    kb = 2
    # A = (cos kz, sin kz, 0)/k gives B = curl A = (cos kz, sin kz, 0)
    bx = np.cos(kb * Z)
    by = np.sin(kb * Z)
    aa = jnp.asarray(np.stack([bx / kb, by / kb, np.zeros_like(bx)]))
    bb = jnp.asarray(np.stack([bx, by, np.zeros_like(bx)]))
    ek, hk = helicity_spectrum(aa, bb, None)
    ek, hk = np.asarray(ek), np.asarray(hk)
    assert np.argmax(ek) == kb
    np.testing.assert_allclose(hk[kb], 2 * ek[kb] / kb, rtol=1e-5)
    np.testing.assert_allclose(ek.sum(), 0.5, rtol=1e-5)   # 0.5<B²>=0.5
