"""Unit tests for the non-Fourier heat-flux module and the runtime
supernova scheduler (reference heatflux.f90 / interstellar.f90 check_SN)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pencil_tpu import (Config, Density, EosIdealGas, GridSpec, Hydro,
                        Magnetic, Model)  # noqa: E402
from pencil_tpu.physics.entropy import Entropy  # noqa: E402
from pencil_tpu.physics.heatflux import HeatFlux  # noqa: E402
from pencil_tpu.physics.temperature import TemperatureIdealGas  # noqa: E402


def test_heatflux_relaxes_to_spitzer():
    """With fixed τ (ltau_spitzer_va=F) and uniform B ∥ x, q relaxes
    toward the field-aligned Spitzer flux: after one small step,
    dq/dt ≈ −τ⁻¹(q − q_target) with q(0)=0 → q ≈ dt·τ⁻¹·(−K∇lnT b̂b̂)."""
    tau_inv = 2.0
    Ksp = 1e-4
    cfg = Config(
        grid=GridSpec(nx=32, ny=8, nz=8),
        modules=(EosIdealGas(gamma=5.0 / 3.0, cp=2.5),
                 Density(init="zero"),
                 Hydro(init="zero"),
                 TemperatureIdealGas(init="sinwave-x", ampl=0.05, kx=1.0),
                 Magnetic(init="zero", B_ext=(1.0, 0.0, 0.0)),
                 HeatFlux(iheatflux="spitzer", tau_inv_spitzer=tau_inv,
                          Kspitzer_para=Ksp, ltau_spitzer_va=False,
                          saturation_flux=0.0)),
    )
    model = Model(cfg)
    state = model.init_state(1)
    fa = model.reg.stack(state["fields"])
    dfa, _dt1, _ = model.rhs(fa, model.grid, 0.0)
    off = 0
    sl = {}
    for nm, slot in model.reg.slots.items():
        if slot.kind != "pde":
            continue
        sl[nm] = slice(off, off + slot.ncomp)
        off += slot.ncomp
    dq = np.asarray(dfa[sl["qq"]])
    # expected: dq_x = −τ⁻¹·K·e^{3.5lnTT−lnrho}·∂x lnTT (b̂ = x̂)
    lnTT = np.asarray(state["fields"]["lnTT"])
    x = np.asarray(model.grid.x)[3:-3]
    # lnTT = lnTT0 + ampl·sin(x) → ∂x lnTT = ampl·cos(x)
    dlnTT = 0.05 * np.cos(x)[:, None, None] + 0.0 * lnTT
    K = Ksp * np.exp(3.5 * lnTT - 0.0)
    expect = -tau_inv * K * dlnTT
    err = np.abs(dq[0] - expect).max() / np.abs(expect).max()
    assert err < 0.05, err
    # transverse components carry no flux for B ∥ x̂
    assert np.abs(dq[1:]).max() < 1e-3 * np.abs(expect).max()


def test_sn_explosion_energy_budget():
    """A 'single' SN through SNScheduler._explode deposits ≈ ampl_SN of
    thermal energy for frac_kin=0 (explode_SN :3338-3344: c_SN·∫prof dV
    = etmp by the cnorm normalization)."""
    from pencil_tpu.physics.interstellar import Interstellar, SNScheduler
    ism = Interstellar(
        lSN_scale_rad=False, width_SN=0.2, thermal_profile="gaussian",
        velocity_profile="gaussian", lSN_autofrackin=False, frac_kin=0.0,
        ampl_SN=1.0, lSN_eth=True, lSN_mass=False,
        t_next_SNI=0.0, t_next_SNII=-1.0,
    )
    cfg = Config(
        grid=GridSpec(nx=32, ny=32, nz=32, x0=-1, y0=-1, z0=-1,
                      Lx=2.0, Ly=2.0, Lz=2.0),
        modules=(EosIdealGas(), Density(init="zero"), Hydro(init="zero"),
                 Entropy(init="zero"), ism),
    )
    model = Model(cfg)
    state = model.init_state(0)
    fields = {k: np.asarray(v) for k, v in state["fields"].items()}
    sched = SNScheduler(ism, model)
    rho = sched._rho_of(fields)
    ss = np.array(fields["ss"], np.float64)
    out = sched._explode(fields, rho, ss, 16, 16, 16, check=False)
    assert out is not None
    eos = model.eos
    gam, cp = eos.gamma, eos.cp
    cv = cp / gam

    def ee_of(lnrho, ssv):
        lnTT = (eos.lnTT0 + gam * ssv / cp
                + (gam - 1.0) * (lnrho - eos.lnrho0))
        return cv * np.exp(lnTT)

    lnrho = np.log(rho)
    dV = cfg.grid.dx * cfg.grid.dy * cfg.grid.dz
    E0 = (rho * ee_of(lnrho, ss)).sum() * dV
    E1 = (rho * ee_of(lnrho, np.asarray(out["ss"], np.float64))).sum() * dV
    dE = E1 - E0
    assert abs(dE - 1.0) < 0.05, dE


def test_sn_scheduler_fires_and_reschedules():
    """t_next=0 arms the SNI channel; calling the scheduler at t>0 fires
    one remnant and moves t_next into the future (set_next_SNI
    :2197-2231 Poisson draw)."""
    from pencil_tpu.physics.interstellar import Interstellar, SNScheduler
    ism = Interstellar(
        lSNI=True, lSNII=False, lSN_scale_rad=False, width_SN=0.2,
        thermal_profile="gaussian", velocity_profile="gaussian",
        lSN_autofrackin=False, ampl_SN=1e-3, TT_SN_max=1e8,
        t_next_SNI=0.0, t_next_SNII=-1.0,
    )
    cfg = Config(
        grid=GridSpec(nx=16, ny=16, nz=32, x0=-1, y0=-1, z0=-1,
                      Lx=2.0, Ly=2.0, Lz=2.0),
        modules=(EosIdealGas(), Density(init="zero"), Hydro(init="zero"),
                 Entropy(init="zero"), ism),
    )
    model = Model(cfg)
    state = model.init_state(0)
    fields = {k: np.asarray(v) for k, v in state["fields"].items()}
    sched = SNScheduler(ism, model)
    assert sched.active
    upd = sched(fields, t=1e-6, it=1)
    assert upd is not None and sched.nfired == 1
    assert sched.t_next_SNI > 1e-6
    # entropy rose somewhere
    assert np.asarray(upd["ss"]).max() > np.asarray(fields["ss"]).max()
