"""Test configuration: run on a virtual 8-device CPU mesh.

Sharding-equivalence tests need multiple devices; real TPU pods aren't
available in CI, so we force the host platform with 8 virtual devices
(SURVEY.md section 4).  Must run before the first JAX import.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# The container's sitecustomize registers an 'axon' TPU PJRT plugin at
# interpreter startup and imports jax before this conftest runs, so the
# JAX_PLATFORMS env var alone is too late; the config update below forces
# the local-CPU backend (with 8 virtual devices) as long as no backend has
# been initialized yet.  Without it, every per-shape compile goes through
# the remote TPU relay (~20 s each).
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)  # match Fortran double precision
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

LW_FSCK = "/root/reference/data/ecckd-1.2_lw_ckd-definition_climate_fsck-tol0.0161.nc"
LW_RRTMGP = "/root/reference/data/ecckd-1.2_lw_ckd-definition_climate_rrtmgp-tol0.061.nc"
SW_WIDE = "/root/reference/data/ecckd-1.2_sw_ckd-definition_climate_wide-tol0.05.nc"


@pytest.fixture(scope="session")
def lw_model():
    from ecckd_tpu.models.loader import load_ckd_model
    return load_ckd_model(LW_FSCK)


@pytest.fixture(scope="session")
def lw_rrtmgp_model():
    from ecckd_tpu.models.loader import load_ckd_model
    return load_ckd_model(LW_RRTMGP)


@pytest.fixture(scope="session")
def sw_model():
    from ecckd_tpu.models.loader import load_ckd_model
    return load_ckd_model(SW_WIDE)


def make_atmosphere(ncol=4, nlay=20, seed=0, p_top=1.0, p_sfc=101300.0):
    """Synthetic but physically plausible atmospheric columns."""
    rng = np.random.default_rng(seed)
    # Log-spaced level pressures with mild per-column jitter.
    base = np.exp(np.linspace(np.log(p_top), np.log(p_sfc), nlay + 1))
    jitter = 1.0 + 0.05 * rng.standard_normal((ncol, nlay + 1))
    plev = np.sort(base[None, :] * jitter, axis=1)
    play = 0.5 * (plev[:, 1:] + plev[:, :-1])
    # Temperature: warm surface, cold tropopause, warm stratopause.
    logp = np.log(play)
    tlay = (288.0 - 55.0 * np.exp(-((logp - np.log(1.5e4)) ** 2) / 4.0)
            + 2.0 * rng.standard_normal((ncol, nlay)))
    loglev = np.log(plev)
    tlev = (288.0 - 55.0 * np.exp(-((loglev - np.log(1.5e4)) ** 2) / 4.0)
            + 2.0 * rng.standard_normal((ncol, nlay + 1)))
    tsfc = tlev[:, -1] + rng.uniform(-2, 4, ncol)
    h2o = 10.0 ** rng.uniform(-6, -2, (ncol, nlay))
    o3 = 10.0 ** rng.uniform(-8, -5.2, (ncol, nlay))
    return dict(plev=plev, play=play, tlay=tlay, tlev=tlev, tsfc=tsfc,
                h2o=h2o, o3=o3)


RFMIP_VMRS = dict(co2=397.547e-6, ch4=1831.47e-9, n2o=326.99e-9, o2=0.2095,
                  cfc11=233.042e-12, cfc12=520.581e-12, n2=0.7808)
