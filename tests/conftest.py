import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs multichip).
# A sitecustomize in this environment forces JAX_PLATFORMS to the TPU
# platform, so the env var alone is not enough — use jax.config, which wins.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# PC_TPU=1 switches the suite to the real TPU lane: the fused-kernel
# equivalence tests gated by ``needs_tpu`` run compiled on hardware
# (invoke as `PC_TPU=1 pytest tests/test_fused.py`); everything else
# runs on the virtual 8-device CPU mesh.
if os.environ.get("PC_TPU", "") not in ("", "0"):
    pass  # keep whatever platform the environment provides (axon/tpu)
else:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
