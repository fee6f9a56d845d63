"""pytest plugin: install the cudf_tpu.pandas proxy before collection.

Used by tools/pandas_suite.py to run pandas' own tests with the
accelerator active (the cudf.pandas CI pattern — the reference runs the
upstream pandas suite as its conformance oracle)."""

import jax


def pytest_configure(config):
    # pandas' tests run on host semantics; force the CPU backend so the
    # axon tunnel latency doesn't turn thousands of tiny ops into hours
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    from cudf_tpu.pandas import install

    install()
