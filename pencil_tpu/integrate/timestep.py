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
    """Pointwise inverse-timestep field from the module accumulators —
    reference-exact assembly (src/equ.f90:1100-1151):

        maxadvec   = Σ advec_lin + √(advec_cs2 + …) + √(advec2_hypermesh)
        dt1_advec  = maxadvec/cdt
        dt1_diffus = maxdiffus·dxyz₂/cdtv + maxdiffus3·dxyz₆/cdtv3
        dt1_max    = √(dt1_advec² + dt1_diffus²)

    Note the LINEAR addition of the wave-speed root to the velocity
    advection (not root-sum-square of the two), and the RSS combination of
    the advective and diffusive classes at the end.
    """
    # metric-aware Σ dline⁻² when provided (curvilinear: 1/(r dθ),
    # 1/(r sinθ dφ) — reference dxyz_2 uses dline_1)
    dxyz2 = getattr(ts, "dxyz2", None)
    if dxyz2 is None:
        dxyz2 = grid.dx1 ** 2 + grid.dy1 ** 2 + grid.dz1 ** 2
    adv = ts.maxadvec
    if not isinstance(ts.advec_cs2, float):
        adv = adv + jnp.sqrt(ts.advec_cs2)
    if not isinstance(ts.advec2_hypermesh, float):
        adv = adv + jnp.sqrt(ts.advec2_hypermesh)
    dif = 0.0
    if not (isinstance(ts.maxdiffus, float) and ts.maxdiffus == 0.0):
        dif = ts.maxdiffus * dxyz2 / time_cfg.cdtv
    extra_dif = getattr(ts, "maxdiffus_scaled", 0.0)
    if not isinstance(extra_dif, float):
        # pre-scaled diffusion rates (the meanfield_e_tensor EMF class
        # folds dline_1 into diffus_special itself)
        dif = dif + extra_dif / time_cfg.cdtv
    if not (isinstance(ts.maxdiffus3, float) and ts.maxdiffus3 == 0.0):
        dxyz6 = grid.dx1 ** 6 + grid.dy1 ** 6 + grid.dz1 ** 6
        dif = dif + ts.maxdiffus3 * dxyz6 / time_cfg.cdtv3
    if isinstance(adv, float) and isinstance(dif, float):
        # no advective/diffusive classes — a direct-max rate (particle
        # drag, heating limit) may still bound dt
        extra = getattr(ts, "dt1_extra", 0.0)
        if not isinstance(extra, float):
            return extra + jnp.zeros((1, 1, 1))
        return jnp.zeros((1, 1, 1))
    dt1_a = adv / time_cfg.cdt if not isinstance(adv, float) else 0.0
    if isinstance(dif, float):
        out = dt1_a + jnp.zeros((1, 1, 1))
    elif isinstance(dt1_a, float):
        out = dif + jnp.zeros((1, 1, 1))
    else:
        out = jnp.sqrt(dt1_a ** 2 + dif ** 2)
    extra = getattr(ts, "dt1_extra", 0.0)
    if not isinstance(extra, float):
        out = jnp.maximum(out, extra)
    return out
