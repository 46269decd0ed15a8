"""Initial-condition registry (reference init_uu/init_lnrho/init_ss/init_aa
switches in each module + the 65 INITIAL_CONDITION plug-ins,
``src/initial_condition/``).  Names mirror the reference's ``inituu=...``
namelist values where the physics matches."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bessj0(x):
    """J0 by the A&S 9.4.1/9.4.3 rational approximations (the reference's
    bessj(0,x), general.f90 — Numerical Recipes bessj0)."""
    ax = jnp.abs(x)
    y = x * x
    p1 = (57568490574.0 + y * (-13362590354.0 + y * (651619640.7
          + y * (-11214424.18 + y * (77392.33017 + y * (-184.9052456))))))
    q1 = (57568490411.0 + y * (1029532985.0 + y * (9494680.718
          + y * (59272.64853 + y * (267.8532712 + y)))))
    small = p1 / q1
    z = 8.0 / jnp.maximum(ax, 1e-30)
    y2 = z * z
    xx = ax - 0.785398164
    pa = (1.0 + y2 * (-0.1098628627e-2 + y2 * (0.2734510407e-4
          + y2 * (-0.2073370639e-5 + y2 * 0.2093887211e-6))))
    pb = (-0.1562499995e-1 + y2 * (0.1430488765e-3
          + y2 * (-0.6911147651e-5 + y2 * (0.7621095161e-6
          + y2 * (-0.934935152e-7)))))
    big = jnp.sqrt(0.636619772 / jnp.maximum(ax, 1e-30))         * (jnp.cos(xx) * pa - z * jnp.sin(xx) * pb)
    return jnp.where(ax < 8.0, small, big)


def _bessj1(x):
    """J1 (Numerical Recipes bessj1, as the reference's bessj(1,x))."""
    ax = jnp.abs(x)
    y = x * x
    p1 = x * (72362614232.0 + y * (-7895059235.0 + y * (242396853.1
         + y * (-2972611.439 + y * (15704.48260 + y * (-30.16036606))))))
    q1 = (144725228442.0 + y * (2300535178.0 + y * (18583304.74
         + y * (99447.43394 + y * (376.9991397 + y)))))
    small = p1 / q1
    z = 8.0 / jnp.maximum(ax, 1e-30)
    y2 = z * z
    xx = ax - 2.356194491
    pa = (1.0 + y2 * (0.183105e-2 + y2 * (-0.3516396496e-4
          + y2 * (0.2457520174e-5 + y2 * (-0.240337019e-6)))))
    pb = (0.4687499995e-1 + y2 * (-0.2002690873e-3
          + y2 * (0.8449199096e-5 + y2 * (-0.88228987e-6
          + y2 * 0.105787412e-6))))
    big = jnp.sqrt(0.636619772 / jnp.maximum(ax, 1e-30))         * (jnp.cos(xx) * pa - z * jnp.sin(xx) * pb) * jnp.sign(x)
    return jnp.where(ax < 8.0, small, big)


def _coords(grid):
    return grid.xg, grid.yg, grid.zg


def cubic_step(x, x0, width, shift=0.0):
    """Reference ``sub.f90`` cubic_step: smooth 0→1 step of half-width
    ``width`` centred at ``x0 + shift·width``."""
    xi = jnp.clip((x - x0) / max(width, 1e-30) - shift, -1.0, 1.0)
    return 0.5 + xi * (0.75 - xi * xi * 0.25)


def init_scalar(name, grid, spec, eos, key, ampl=0.0, width=0.05,
                kx=1.0, ky=1.0, kz=1.0, field="", left=0.0, right=0.0,
                xjump=0.0, phase=0.0, radius=1.0,
                center1=(0.0, 0.0, 0.0)):
    x, y, z = _coords(grid)
    shape = (spec.nx, spec.ny, spec.nz)
    zero = jnp.zeros(shape, dtype=grid.x.dtype)
    if name in ("zero", "nothing", ""):
        return zero
    if name in ("sinwave-phase", "coswave-phase"):
        # A·{sin,cos}(k·x + φ) (reference initcond.f90:2579/2601)
        fn = jnp.sin if name[0] == "s" else jnp.cos
        return ampl * fn(kx * x + ky * y + kz * z + phase) + zero
    if name == "blob":
        # gaussian blob, NOT normalized by 2 in the exponent (reference
        # sub.f90:5450: f += A·exp(−((x−x0)²+(y−y0)²+(z−z0)²)/r²))
        r2 = ((x - center1[0]) ** 2 + (y - center1[1]) ** 2
              + (z - center1[2]) ** 2)
        return ampl * jnp.exp(-r2 / radius ** 2) + zero
    if name in ("xjump", "yjump", "zjump"):
        # tanh step along one axis (reference 'xjump' etc.: Sod-type
        # discontinuity)
        c = (x, y, z)["xyz".index(name[0])]
        prof = 0.5 * (1.0 + jnp.tanh((c - xjump) / max(width, 1e-9)))
        return left + (right - left) * prof + zero
    if name == "const":
        return zero + ampl
    if name == "gaussian-noise":
        return ampl * jax.random.normal(key, shape, dtype=grid.x.dtype)
    if name == "sinwave-x":
        return ampl * jnp.sin(kx * x) + zero
    if name == "sinwave-y":
        return ampl * jnp.sin(ky * y) + zero
    if name == "sinwave-z":
        return ampl * jnp.sin(kz * z) + zero
    if name == "gaussian-z":
        return ampl * jnp.exp(-0.5 * (z / width) ** 2) + zero
    if name == "stratified-z":
        # isothermal hydrostatic: lnrho = -z/H with H = width
        return -z / width + zero
    raise NotImplementedError(f"init_scalar {name!r}")


def init_vector(name, grid, spec, eos, key, ampl=0.0, kx=1.0, ky=1.0,
                kz=1.0, width=0.1, sigma=1.0, const3=(0.0, 0.0, 0.0),
                rnoise_int=0.0, rnoise_ext=0.0, radius=1.0, eps_tube=0.0,
                center1=(0.0, 0.0, 0.0), comp_pars=(),
                r_int=0.0, r_ext=1.0, inclaa=0.0, z1=0.0):
    name = name.lower()
    x, y, z = _coords(grid)
    shape = (spec.nx, spec.ny, spec.nz)
    zero = jnp.zeros(shape, dtype=grid.x.dtype)
    zeros3 = jnp.zeros((3,) + shape, dtype=grid.x.dtype)
    if name in ("zero", "nothing", ""):
        return zeros3
    if name in ("sinwave-phase", "coswave-phase"):
        # per-COMPONENT plane waves A_i·{sin,cos}(k_i·x + φ_i) — the
        # reference drives each component from its own ampl_ux/kx_ux/…
        # namelist arrays (hydro.f90:1756-1763)
        fn = jnp.sin if name[0] == "s" else jnp.cos
        comps = []
        for i in range(3):
            a, kxi, kyi, kzi, ph = (comp_pars[i] if i < len(comp_pars)
                                    else (0.0, 0.0, 0.0, 0.0, 0.0))
            comps.append(a * fn(kxi * x + kyi * y + kzi * z + ph) + zero)
        return jnp.stack(comps)
    if name == "trilinear-y":
        # u_y = Σ_a c_a·(linear in non-periodic directions, sin in
        # periodic ones) (initcond.f90 trilinear; hydro.f90:1747 routes
        # ampl_ux/uy/uz as the three direction coefficients)
        import math as _m
        amps = (comp_pars[0][0] if comp_pars else ampl,
                comp_pars[1][0] if len(comp_pars) > 1 else 0.0,
                comp_pars[2][0] if len(comp_pars) > 2 else 0.0)
        tmp = zero
        for a, (c, L, c0, per) in zip(amps, (
                (x, spec.Lx, spec.x0, spec.periodic[0]),
                (y, spec.Ly, spec.y0, spec.periodic[1]),
                (z, spec.Lz, spec.z0, spec.periodic[2]))):
            if a == 0.0:
                continue
            if per:
                tmp = tmp + a * jnp.sin(2 * _m.pi / L * (c - c0 - 0.25 * L))
            else:
                tmp = tmp + a * c
        return jnp.stack([zero, tmp + zero, zero])
    if name == "parabola_x":
        # channel profile u_y = max_uu·(1 − (x/x_wall)²) (hydro.f90:1697;
        # ampl carries max_uu); x(l1) is the leftmost interior point
        xw = float(grid.interior(grid.x)[0])
        return jnp.stack([zero, ampl * (1.0 - (x / xw) ** 2) + zero, zero])
    if name == "ax=cosysinz":
        # A_x = A·cos(ky·y)·sin(kz·z) — the free-decay potential-field
        # test mode (magnetic.f90:2054 → initcond.f90 cosy_sinz)
        return jnp.stack([ampl * jnp.cos(ky * y) * jnp.sin(kz * z) + zero,
                          zero, zero])
    if name == "x1cosycosz":
        # u_y += A·(1/x)·cos(ky·y)·cos(kz·z) — Taylor-Couette azimuthal
        # seed (initcond.f90 x1_cosy_cosz via hydro.f90:1808)
        return jnp.stack([zero,
                          ampl / x * jnp.cos(ky * y) * jnp.cos(kz * z)
                          + zero, zero])
    if name == "magnetogram":
        # file-driven photospheric magnetogram seed (solar_corona driver
        # data): not ported — start from A=0 (the corona build-up is
        # driven by the boundary physics, not this seed)
        return zeros3
    if name == "poshel-roberts":
        # positive-helicity Roberts flow A ∝ u_Roberts/kf (initcond.f90
        # roberts flow vector potential; fluxes aligned for kf=√2·k):
        # A = (ampl/√2)·(cos kx·sin ky, −sin kx·cos ky, √2 cos kx·cos ky)
        fac = ampl / jnp.sqrt(2.0)
        return jnp.stack([
            fac * jnp.cos(kx * x) * jnp.sin(ky * y) + zero,
            -fac * jnp.sin(kx * x) * jnp.cos(ky * y) + zero,
            fac * jnp.sqrt(2.0) * jnp.cos(kx * x) * jnp.cos(ky * y)
            + zero])
    if name == "piecewise-dipole":
        # neutron-star Meissner field: vertical-uniform core (r<r_int),
        # potential shell, inclined dipole outside r_ext
        # (magnetic.f90:8618-8678 piecew_dipole_aa)
        import math as _m
        r = jnp.sqrt(x * x + y * y + z * z) + zero
        tini = 1e-30
        r1 = 1.0 / jnp.maximum(r, tini)
        r2i = 1.0 / jnp.maximum(r * r, tini)
        beta0 = ampl * _m.cos(inclaa)
        beta1 = -ampl * _m.sin(inclaa) / _m.sqrt(2.0)
        a0 = (1.0 / r_ext ** 3 * beta0, 1.0 / r_ext ** 3 * beta0, 0.0)
        a1 = (0.0, 1.0 / (r_ext ** 3 - r_int ** 3) * beta1, 0.0)
        b0 = (0.0, 0.0, beta0)
        b1 = (0.0, -r_int ** 3 / (r_ext ** 3 - r_int ** 3) * beta1, beta1)
        sigma0 = a0[1] * r + b0[1] * r2i
        sigma1 = a1[1] * r + b1[1] * r2i
        sigma0 = jnp.where(r > r_ext, a0[2] * r + b0[2] * r2i, sigma0)
        sigma1 = jnp.where(r > r_ext, a1[2] * r + b1[2] * r2i, sigma1)
        sigma0 = jnp.where(r < r_int, a0[0] * r + b0[0] * r2i, sigma0)
        sigma1 = jnp.where(r < r_int, a1[0] * r + b1[0] * r2i, sigma1)
        sigma1 = sigma1 * _m.sqrt(2.0)
        return jnp.stack([
            -sigma0 * y * r1 + zero,
            sigma0 * x * r1 + sigma1 * z * r1 + zero,
            -sigma1 * y * r1 + zero])
    if name == "bessel-x":
        # A_y += A·J1(kx·x)/kx, A_z += A·(J0(kx·x)−J0(kx·x1))/kx — the
        # force-free reversed-field-pinch screw field (initcond.f90
        # bessel_x via magnetic.f90:2000)
        x1d = grid.interior(grid.x)
        j0_edge = _bessj0(jnp.asarray(kx * (spec.x0 + spec.Lx)))
        J0 = (_bessj0(kx * x1d) - j0_edge) / kx
        J1 = _bessj1(kx * x1d) / kx
        ay = ampl * J1[:, None, None] + zero
        az = ampl * J0[:, None, None] + zero
        return jnp.stack([zero, ay, az])
    if name == "gaussian-noise":
        return ampl * jax.random.normal(key, (3,) + shape, dtype=grid.x.dtype)
    if (len(name) == 13 and name.startswith("sinwave-u")
            and name[10:12] == "-k"):
        # 'sinwave-u<c>-k<a>': component c = A·sin(k_a·x_a)
        # (hydro.f90:1767 sinwave(ampluu, f, iu<c>, k<a>=kx_uu))
        comp = "xyz".index(name[9])
        axis = "xyz".index(name[12])
        k = (kx, ky, kz)[axis]
        c = (x, y, z)[axis]
        out = [zero, zero, zero]
        out[comp] = ampl * jnp.sin(k * c) + zero
        return jnp.stack(out)
    if name == "sinwave-x":  # u_y = A sin(kx x): transverse wave
        return jnp.stack([zero, ampl * jnp.sin(kx * x) + zero, zero])
    if name == "sinwave-z":
        return jnp.stack([ampl * jnp.sin(kz * z) + zero, zero, zero])
    if name == "coswave-x":
        return jnp.stack([ampl * jnp.cos(kx * x) + zero, zero, zero])
    if name in ("soundwave-x", "soundwave-y", "soundwave-z"):
        # u_i = sqrt(|A/k|)·sin(k·x_i) (reference initcond.f90:2316
        # soundwave; width envelope unsupported → width=0 case)
        axis = "xyz".index(name[-1])
        k = (kx, ky, kz)[axis]
        fac = abs(ampl / k) ** 0.5 * (1.0 if ampl >= 0 else -1.0)
        c = (x, y, z)[axis]
        w = fac * jnp.sin(k * c) + zero
        out = [zero, zero, zero]
        out[axis] = w
        return jnp.stack(out)
    if name == "linear-zx":
        # A_y = −½·A·z²/Lz → B_x = A·z/Lz (reference magnetic.f90:2110)
        ay = -0.5 * ampl * z ** 2 / spec.Lz + zero
        return jnp.stack([zero, ay, zero])
    if name == "beltrami-x":
        # A = (0, σ·sin(kx x), cos(kx x)): force-free ∇×A = kA for σ=1;
        # σ = fractional helicity (reference initcond.f90 beltrami sigma)
        return jnp.stack([zero,
                          ampl * jnp.sin(kx * x) * sigma + zero,
                          ampl * jnp.cos(kx * x) + zero])
    if name == "beltrami-z":
        return jnp.stack([ampl * jnp.sin(kz * z) * sigma + zero,
                          ampl * jnp.cos(kz * z) + zero, zero])
    if name == "up-down":
        # flow up in one spot, down (×0.7) in another, gaussian z-profile
        # centred on z1 (reference init_uu 'up-down', src/hydro.f90:2189)
        w = max(width, 1e-6)
        prof = ampl * jnp.exp(-0.5 * ((z - z1) / w) ** 2)
        x1, y1 = spec.x0 + 0.3 * spec.Lx, spec.y0 + 0.3 * spec.Ly
        x2, y2 = spec.x0 + 0.5 * spec.Lx, spec.y0 + 0.8 * spec.Ly
        r1 = (x - x1) ** 2 + (y - y1) ** 2
        r2 = (x - x2) ** 2 + (y - y2) ** 2
        uz = prof * (jnp.exp(-0.5 * r1 / w ** 2)
                     - 0.7 * jnp.exp(-0.5 * r2 / w ** 2))
        return jnp.stack([zero, zero, uz + zero])
    if name == "ABC":
        A = ampl
        return jnp.stack([
            A * (jnp.sin(kz * z) + jnp.cos(ky * y)) + zero,
            A * (jnp.sin(kx * x) + jnp.cos(kz * z)) + zero,
            A * (jnp.sin(ky * y) + jnp.cos(kx * x)) + zero,
        ])
    if name == "horizontal_dipole":
        # spherical-shell test dipole (magnetic.f90:2256):
        # A = (0, −A·r·sin φ, −A·r·cosθ·cos φ)
        return jnp.stack([
            zero,
            -ampl * x * jnp.sin(z) + zero,
            -ampl * x * jnp.cos(y) * jnp.cos(z) + zero])
    if name == "vertical_dipole":
        # magnetic.f90:2265: A = (0, 0, A·r·sinθ)
        return jnp.stack([zero, zero, ampl * x * jnp.sin(y) + zero])
    if name in ("const_uu", "const-uu"):
        # u = uu_const componentwise (reference hydro.f90:1691)
        return jnp.stack([zero + float(const3[a]) for a in range(3)])
    if name == "sinxsinz":
        # reference initcond.f90:120 sinxsinz — despite the name it ADDS
        # ampl·cos(kx·x)·cos(ky·y)·cos(kz·z) to component i+1 (the
        # y-component of a vector slot) only
        prof = ampl * (jnp.cos(kx * x) * jnp.cos(ky * y)
                       * jnp.cos(kz * z)) + zero
        return jnp.stack([zero, prof, zero])
    if name == "gaussian-noise-rprof":
        # Gaussian noise confined to rnoise_int < r < rnoise_ext by
        # cubic-step shoulders of width dr/4 (initcond.f90:4482
        # gaunoise_rprof_vect); r is the cylindrical/spherical radius in
        # curvilinear coordinates (= the x coordinate), spherical r in a
        # cartesian box
        if getattr(spec, "coords", "cartesian") != "cartesian":
            rr = x + zero
        else:
            rr = jnp.sqrt(x * x + y * y + z * z) + zero
        dr = rnoise_ext - max(0.0, rnoise_int)
        prof = 1.0 - cubic_step(rr, rnoise_ext, 0.25 * dr, shift=-1.0)
        if rnoise_int > 0.0:
            prof = prof * cubic_step(rr, rnoise_int, 0.25 * dr, shift=1.0)
        noise = jax.random.normal(key, (3,) + shape, dtype=grid.x.dtype)
        return ampl * prof[None] * noise
    if name == "hor-tube-x":
        # x-aligned flux tube (initcond.f90:3599 htube_x): the quenched
        # gaussian tmp = (1+ε cos(2πx/Lx))/(1+r²/R²) is NOT scaled by
        # ampl (reference quirk — ampl only gates zero); A =
        # (0, −(z−c_z)·tmp, +(y−c_y)·tmp)
        if ampl == 0.0:
            return zeros3
        import math as _m
        kxm = 2.0 * _m.pi / spec.Lx
        modulate = (1.0 + eps_tube * jnp.cos(kxm * x)) if eps_tube != 0.0 \
            else 1.0
        dy_ = y - center1[1]
        dz_ = z - center1[2]
        tmp = modulate / (1.0 + (dy_ ** 2 + dz_ ** 2) / radius ** 2) + zero
        return jnp.stack([zero, -dz_ * tmp + zero, dy_ * tmp + zero])
    if name == "anelastic-nlin":
        # solenoidal 2-D (x,z) vortex from the gaussian streamfunction
        # ψ = A·exp(−kx·x² − kz·z²): u = (−ψ_z, 0, ψ_x)/ρ with ρ=1 at
        # init time (hydro.f90:2331-2344; ampl carries ampl_uy)
        psi = ampl * jnp.exp(-kx * x ** 2 - kz * z ** 2)
        return jnp.stack([2.0 * kz * z * psi + zero, zero,
                          -2.0 * kx * x * psi + zero])
    if name == "anelastic-lin":
        # u_x = A·sin(x)·cos(z), u_y = 0, and u_z is zeroed after being
        # set (the `!!!` line, reference hydro.f90:2346-2354) — the ampl
        # here is the reference's ampl_ux (ampl_uy is read but unused)
        return jnp.stack([ampl * jnp.sin(x) * jnp.cos(z) + zero,
                          zero, zero])
    raise NotImplementedError(f"init_vector {name!r}")
