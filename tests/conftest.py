import os
import sys

# Tests use a virtual 8-device CPU mesh.  The session's sitecustomize may
# pre-register a TPU plugin and force jax_platforms programmatically, so env
# vars alone are not enough — override via jax.config before any backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


def pytest_configure(config):
    # informational budget marker (no pytest-timeout plugin in this image;
    # tests that use it also enforce their own subprocess-level timeouts)
    config.addinivalue_line(
        "markers", "timeout(seconds): per-test wall-clock budget")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def make_read(rng, length):
    return "".join(rng.choice(list("ACGT"), size=length))


def mutate(rng, s, err=0.1):
    out = []
    for ch in s:
        r = rng.random()
        if r < err * 0.35:
            continue
        if r < err * 0.65:
            out.append(str(rng.choice(list("ACGT"))))
            out.append(ch)
        elif r < err:
            out.append(str(rng.choice(list("ACGT"))))
        else:
            out.append(ch)
    return "".join(out)


@pytest.fixture(scope="session")
def synthetic_families(rng):
    """Reads from several synthetic 'transcripts': list of (seq, family)."""
    refs = [make_read(rng, int(rng.integers(200, 380))) for _ in range(6)]
    reads = []
    for fam, ref in enumerate(refs):
        for _ in range(int(rng.integers(6, 14))):
            reads.append((mutate(rng, ref), fam))
    order = rng.permutation(len(reads))
    return [reads[i] for i in order]
