"""2N low-storage Runge–Kutta time stepping + CFL control.

Reference ``src/timestep.f90``: Williamson (1980) 2N-RK3 coefficients
α=(0,−5/9,−153/128), β=(1/3,15/16,8/15) (initialize_timestep :19-66,
update f += β·dt·df at :162-163), plus 1st/2nd-order variants and the
5-stage 2N-RK4 of Carpenter & Kennedy (1994).

CFL rule (reference ``src/equ.f90:916-931`` + set_dt ``src/sub.f90:3896``):
    1/dt = max_points sqrt( (advec/cdt)² + (diffus/cdtv + hyper/cdtv3)² )
with advec = Σ_a(|u_a|+c_fast)/Δ_a and diffus = max(ν,η,χ,...)·Σ_a Δ_a⁻².
"""
from __future__ import annotations

import jax.numpy as jnp

# itorder -> (alpha, beta, stage_time_fraction)
_CK_A = (
    0.0,
    -567301805773.0 / 1357537059087.0,
    -2404267990393.0 / 2016746695238.0,
    -3550918686646.0 / 2091501179385.0,
    -1275806237668.0 / 842570457699.0,
)
_CK_B = (
    1432997174477.0 / 9575080441755.0,
    5161836677717.0 / 13612068292357.0,
    1720146321549.0 / 2090206949498.0,
    3134564353537.0 / 4481467310338.0,
    2277821191437.0 / 14882151754819.0,
)
_CK_C = (
    0.0,
    1432997174477.0 / 9575080441755.0,
    2526269341429.0 / 6820363962896.0,
    2006345519317.0 / 3224310063776.0,
    2802321613138.0 / 2924317926251.0,
)

RK_TABLES = {
    1: ((0.0,), (1.0,), (0.0,)),
    2: ((0.0, -0.5), (0.5, 1.0), (0.0, 0.5)),
    3: ((0.0, -5.0 / 9.0, -153.0 / 128.0),
        (1.0 / 3.0, 15.0 / 16.0, 8.0 / 15.0),
        (0.0, 1.0 / 3.0, 0.75)),
    4: (_CK_A, _CK_B, _CK_C),  # 5-stage 2N-RK4 (Carpenter & Kennedy)
}


def cfl_dt1(ts, grid, time_cfg):
    """Pointwise inverse-timestep field from the module accumulators."""
    dxyz2 = grid.dx1 ** 2 + grid.dy1 ** 2 + grid.dz1 ** 2
    adv = ts.maxadvec
    adv2 = ts.advec_cs2
    dif = 0.0
    if not (isinstance(ts.maxdiffus, float) and ts.maxdiffus == 0.0):
        dif = ts.maxdiffus * dxyz2 / time_cfg.cdtv
    if not (isinstance(ts.maxdiffus3, float) and ts.maxdiffus3 == 0.0):
        dxyz6 = grid.dx1 ** 6 + grid.dy1 ** 6 + grid.dz1 ** 6
        dif = dif + ts.maxdiffus3 * dxyz6 / time_cfg.cdtv3
    if all(isinstance(v, float) for v in (adv, adv2, dif)):
        return jnp.zeros((1, 1, 1))
    a2 = 0.0
    if not isinstance(adv, float):
        a2 = a2 + adv ** 2
    if not isinstance(adv2, float):
        a2 = a2 + adv2
    # reference rule: dt = min(cdt/advec, cdtv/diffus) — the classes compete
    # by MAX of rates, advec itself is sqrt(advec_uu² + advec_cs2)
    # (src/equ.f90:916-931 + timestep.f90:148)
    dt1_a = jnp.sqrt(a2) / time_cfg.cdt if not isinstance(a2, float) else 0.0
    mesh = getattr(ts, "maxadvec_mesh", 0.0)
    if not isinstance(mesh, float):
        mesh = mesh * (64.0 / 60.0) / 2.5
        dt1_a = jnp.maximum(dt1_a, mesh) if not isinstance(dt1_a, float) \
            else mesh
    if isinstance(dif, float):
        if isinstance(dt1_a, float):
            return jnp.zeros((1, 1, 1))
        return dt1_a + jnp.zeros((1, 1, 1))
    if isinstance(dt1_a, float):
        return dif + jnp.zeros((1, 1, 1))
    return jnp.maximum(dt1_a, dif)
