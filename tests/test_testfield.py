"""Test-field method (reference test_methods/testfield_z.f90): measured
turbulent transport of the Roberts flow has the known structure."""
import numpy as np

from pencil_tpu import (Config, Density, EosIdealGas, GridSpec,
                        HydroKinematic, Model, TestfieldZ, TimeSpec)
from pencil_tpu.physics.testfield import transport_coefficients


def _run(profile="roberts", nsteps=400):
    cfg = Config(
        grid=GridSpec(nx=16, ny=16, nz=16),
        time=TimeSpec(itorder=3, dt=5e-3),
        modules=(EosIdealGas(gamma=1.0001), Density(),
                 HydroKinematic(profile=profile, ampl=1.0),
                 TestfieldZ(ktestfield=1.0, etatest=0.1)),
    )
    model = Model(cfg)
    state = model.init_state(0)
    step = model.make_step()
    for _ in range(nsteps):
        state = step(state)
    return transport_coefficients(model, state)


def test_roberts_alpha_structure():
    co = _run("roberts")
    # diagonal alpha isotropic and significantly nonzero (helical flow)
    np.testing.assert_allclose(co["alp11"], co["alp22"], rtol=1e-3)
    assert abs(co["alphat"]) > 0.05
    # off-diagonal alpha vanishes
    assert abs(co["alp12"]) < 0.02 * abs(co["alphat"])
    assert abs(co["alp21"]) < 0.02 * abs(co["alphat"])
    # positive turbulent diffusivity
    assert co["etat"] > 0.01
