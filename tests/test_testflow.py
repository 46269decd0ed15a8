"""Test-flow method (reference src/testflow_z.f90): turbulent viscosity
of the Roberts flow measured via linear test momentum equations."""
import numpy as np

from pencil_tpu import (Config, Density, EosIdealGas, GridSpec,
                        HydroKinematic, Model, TestflowZ, TimeSpec)
from pencil_tpu.physics.testflow import turbulent_viscosity


def _run(lsoca=True, nsteps=400):
    cfg = Config(
        grid=GridSpec(nx=16, ny=16, nz=16),
        time=TimeSpec(itorder=3, dt=5e-3),
        modules=(EosIdealGas(gamma=1.0001), Density(),
                 HydroKinematic(profile="roberts", ampl=1.0),
                 TestflowZ(ktestflow=1.0, nutest=0.1, lsoca=lsoca)),
    )
    model = Model(cfg)
    state = model.init_state(0)
    step = model.make_step()
    for _ in range(nsteps):
        state = step(state)
    return turbulent_viscosity(model, state)


def test_roberts_turbulent_viscosity():
    co = _run()
    # positive eddy viscosity, isotropic between the x and y test pairs
    assert co["nut"] > 0.02, co
    np.testing.assert_allclose(co["nut_x"], co["nut_y"], rtol=0.05)
    # AKA effect absent for this flow at SOCA order
    assert abs(co["aka_x"]) < 0.3 * co["nut"]


def test_roberts_testflow_nonsoca_runs():
    co = _run(lsoca=False, nsteps=200)
    assert np.isfinite([co["nut_x"], co["nut_y"]]).all()
