"""Visualization helpers (reference ``python/pencil/visu``:
animate_interactive / animate_slices over video-slice files).

Matplotlib is imported lazily; every function also works headless by
returning the figure (or writing a file) without showing it."""
from __future__ import annotations

import os

import numpy as np


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_slice(field="ux", plane="xy", datadir="data", index=-1,
               outfile=None, cmap="RdBu_r"):
    """Render one frame of a video-slice series
    (pc.visu.animate_slices single-frame analog)."""
    from .read import slices
    s = slices(field, plane, datadir)
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(5, 4))
    frame = np.asarray(s.data[index])
    vmax = np.abs(frame).max() or 1.0
    im = ax.imshow(frame.T, origin="lower", cmap=cmap,
                   vmin=-vmax, vmax=vmax)
    ax.set_title(f"{field} ({plane})  t={float(s.t[index]):.3g}")
    fig.colorbar(im, ax=ax)
    if outfile:
        fig.savefig(outfile, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return outfile
    return fig


def animate_slices(field="ux", plane="xy", datadir="data", outdir=None,
                   step=1):
    """Write every ``step``-th slice frame as PNG (pc.visu.animate_slices
    headless analog); returns the file list."""
    from .read import slices
    s = slices(field, plane, datadir)
    outdir = outdir or os.path.join(str(datadir), "frames")
    os.makedirs(outdir, exist_ok=True)
    files = []
    for i in range(0, len(s.t), step):
        files.append(plot_slice(field, plane, datadir, index=i,
                                outfile=os.path.join(
                                    outdir, f"{field}_{plane}_{i:05d}.png")))
    return files


def plot_ts(columns=("urms",), datadir="data", outfile=None, logy=False):
    """Time-series quick look (pc.visu ts plotting)."""
    from .read import ts
    t = ts(datadir)
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(6, 4))
    for c in columns:
        ax.plot(t.t, getattr(t, c), label=c)
    ax.set_xlabel("t")
    if logy:
        ax.set_yscale("log")
    ax.legend()
    if outfile:
        fig.savefig(outfile, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return outfile
    return fig
