"""Dust particles with drag coupling (reference ``src/particles_dust.f90``,
7098 LoC — the core Lagrangian carrier, SURVEY.md §2.8).

State: positions xp (npar, 3) and velocities vp (npar, 3), integrated with
the same 2N-RK scheme as the gas (the reference integrates particles inside
the RK substeps via particles_timestep_first/second,
src/timestep.f90:131-172).

Physics: Epstein drag dv/dt = −(v − u(x_p))/τ_s, optional gravity, optional
back-reaction −ε·(u − v̄_p)/τ_s deposited onto the gas momentum (dust-to-gas
mass loading eps_dtog), TSC interpolation/deposition
(src/particles_map.f90)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax
import jax.numpy as jnp

from ..physics.base import ModuleBase, accumulate
from .interp import deposit, interpolate


@dataclass(frozen=True)
class ParticlesDust(ModuleBase):
    name: ClassVar[str] = "particles"

    npar: int = 1024
    tausp: float = 1.0            # stopping time τ_s
    eps_dtog: float = 0.0         # dust-to-gas ratio (0 = no back-reaction)
    scheme: str = "tsc"           # 'ngp' | 'cic' | 'tsc'
    lgravz: bool = False
    gravz: float = 0.0
    init: str = "random"          # 'random' | 'equidistant'
    vinit: str = "zero"           # 'zero' | 'gas' (match local gas velocity)

    # -- state ----------------------------------------------------------
    def init_particles(self, grid, spec, key, dtype):
        kx, kv = jax.random.split(key)
        lo = jnp.asarray([spec.x0, spec.y0, spec.z0], dtype)
        L = jnp.asarray([spec.Lx, spec.Ly, spec.Lz], dtype)
        if self.init == "random":
            xp = lo + L * jax.random.uniform(kx, (self.npar, 3), dtype)
        elif self.init == "equidistant":
            n = int(round(self.npar ** (1.0 / 3.0)))
            g1 = (jnp.arange(n, dtype=dtype) + 0.5) / n
            xyz = jnp.stack(jnp.meshgrid(g1, g1, g1, indexing="ij"), -1)
            xp = (lo + L * xyz.reshape(-1, 3))[: self.npar]
        else:
            raise NotImplementedError(self.init)
        vp = jnp.zeros((self.npar, 3), dtype)
        return {"xp": xp, "vp": vp}

    # -- dynamics -------------------------------------------------------
    def rhs_particles(self, pstate, pen, spec, df, ts,
                      mesh_axis_names=None, mesh_shape=(1, 1, 1)):
        """Returns d(pstate); adds drag back-reaction to the gas df.

        Sharded mode (reference particles_mpicomm's role): particle state
        is replicated across shards; each shard gathers/deposits only the
        particles inside its subdomain (owner masking), gathers are psum'd
        over the mesh, and deposit spill into ghost zones is shipped to the
        owning neighbour by the reverse halo exchange."""
        xp, vp = pstate["xp"], pstate["vp"]
        uu_slots = "uu" in pen.reg.slots
        sharded = bool(mesh_axis_names) and any(
            n is not None and s > 1
            for n, s in zip(mesh_axis_names, mesh_shape))
        origin = mask = None
        names = []
        g = 3
        nloc = tuple(d - 2 * g for d in pen.fg.shape[1:])
        if sharded:
            dxyz = jnp.asarray([spec.dx, spec.dy, spec.dz], xp.dtype)
            x0 = jnp.asarray([spec.x0, spec.y0, spec.z0], xp.dtype)
            idxs = []
            for a, n in enumerate(mesh_axis_names):
                if n is not None and mesh_shape[a] > 1:
                    idxs.append(jax.lax.axis_index(n).astype(xp.dtype))
                    names.append(n)
                else:
                    idxs.append(jnp.asarray(0.0, xp.dtype))
            nl = jnp.asarray(nloc, xp.dtype)
            origin = x0 + jnp.stack(idxs) * nl * dxyz
            fc = (xp - origin) / dxyz
            inb = (fc >= 0.0) & (fc < nl)
            mask = (inb[:, 0] & inb[:, 1] & inb[:, 2]).astype(xp.dtype)
        if uu_slots:
            ug = interpolate(pen.fg[pen.reg.slice("uu")], xp, spec,
                             self.scheme, origin=origin, mask=mask).T
            if sharded:
                for n in names:
                    ug = jax.lax.psum(ug, n)
        else:
            ug = jnp.zeros_like(vp)
        tausp1 = 1.0 / self.tausp if self.tausp > 0.0 else 0.0
        dvp = -(vp - ug) * tausp1
        if self.lgravz and self.gravz != 0.0:
            dvp = dvp.at[:, 2].add(self.gravz)
        dxp = vp
        if self.eps_dtog > 0.0 and uu_slots:
            # back-reaction: gas feels +ε ρ_p/ρ_g (v_p − u)/τ_s; deposit the
            # per-particle momentum-exchange then normalize by gas density.
            # Each particle carries mass m_p = ε·ρ₀·V_box/npar.
            mp = self.eps_dtog * jnp.exp(pen.eos.lnrho0 if pen.eos else 0.0) \
                * spec.Lx * spec.Ly * spec.Lz / self.npar
            dV = spec.dx * spec.dy * spec.dz
            mom = ((vp - ug) * tausp1 * (mp / dV)).T  # (3, npar) force dens.
            fdrag = deposit(mom, xp, spec, nloc, self.scheme,
                            dtype=vp.dtype, origin=origin, mask=mask,
                            mesh_axis_names=mesh_axis_names,
                            mesh_shape=mesh_shape)
            accumulate(df, "uu", fdrag * pen.rho1())
        # drag CFL: dt1_drag = max(1/τ_s)/cdtp_drag joins dt1_max by max
        # (reference particles_dust.f90:4839-4908, cdtp_drag=0.2)
        if tausp1 > 0.0:
            ts.max_rate(tausp1 / 0.2)
        return {"xp": dxp, "vp": dvp}

    def wrap_positions(self, pstate, spec):
        lo = jnp.asarray([spec.x0, spec.y0, spec.z0], pstate["xp"].dtype)
        L = jnp.asarray([spec.Lx, spec.Ly, spec.Lz], pstate["xp"].dtype)
        xp = lo + jnp.mod(pstate["xp"] - lo, L)
        return {**pstate, "xp": xp}

    def rhop(self, pstate, pen, spec):
        """Particle mass density on the grid (reference rhop aux)."""
        mp = self.eps_dtog if self.eps_dtog > 0 else 1.0
        mp = mp * spec.Lx * spec.Ly * spec.Lz / self.npar
        dV = spec.dx * spec.dy * spec.dz
        ones = jnp.ones((pstate["xp"].shape[0],), pstate["xp"].dtype)
        return deposit(ones * (mp / dV), pstate["xp"], spec, spec.shape,
                       self.scheme, dtype=pstate["xp"].dtype)
