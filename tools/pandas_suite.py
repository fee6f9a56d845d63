"""Run pandas' own test suite under the cudf_tpu.pandas proxy.

The reference treats the upstream pandas test suite as its strongest
oracle (cudf.pandas CI runs it with the accelerator installed and tracks
the pass rate — python/cudf/cudf_pandas_tests/ and the
`cudf.pandas` third-party integration docs).  Same idea here:

    python tools/pandas_suite.py pandas/tests/frame/methods/test_head_tail.py

installs the proxy, then invokes pytest on modules of the installed
pandas package.  Start with the curated SMOKE list (modules known to
exercise the proxied fast paths) and record the pass rate in the output.
"""

from __future__ import annotations

import os
import subprocess
import sys

SMOKE = [
    "tests/frame/methods/test_head_tail.py",
    "tests/series/methods/test_clip.py",
    "tests/series/methods/test_fillna.py",
    "tests/frame/methods/test_sort_values.py",
    "tests/reductions/test_reductions.py::TestSeriesReductions",
    "tests/series/methods/test_rank.py",
    "tests/series/methods/test_value_counts.py",
    "tests/frame/methods/test_rename.py",
    "tests/series/methods/test_isin.py",
    "tests/series/methods/test_round.py",
    "tests/series/methods/test_dropna.py",
    "tests/series/methods/test_diff.py",
    "tests/frame/methods/test_shift.py",
    "tests/series/methods/test_quantile.py",
    "tests/frame/methods/test_drop_duplicates.py",
    "tests/series/methods/test_astype.py",
    "tests/series/methods/test_nlargest.py",
    "tests/series/methods/test_duplicated.py",
    "tests/series/methods/test_unique.py",
    "tests/series/methods/test_searchsorted.py",
    "tests/series/methods/test_pct_change.py",
    "tests/series/methods/test_between.py",
]


def main(argv):
    import pandas

    pkg = os.path.dirname(pandas.__file__)
    targets = argv or [os.path.join(pkg, t) for t in SMOKE]
    env = dict(os.environ)
    # the proxy is installed inside the pytest process via -p plugin
    cmd = [
        sys.executable, "-m", "pytest", "-q", "--no-header",
        "-p", "cudf_tpu.pandas._pytest_plugin", *targets,
    ]
    print("running:", " ".join(cmd), file=sys.stderr)
    return subprocess.call(cmd, env=env)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
