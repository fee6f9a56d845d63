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


# Directory-scale conformance runs (the reference runs pandas' ENTIRE
# suite, ci/cudf_pandas_scripts/pandas-tests/run.sh:40; these directories
# are the equivalent non-curated oracle at repo scale).
DIRECTORIES = [
    "tests/series/methods",
    "tests/series/indexing",
    "tests/frame/methods",
    "tests/reductions",
    "tests/groupby/aggregate",
    "tests/base",
]


def run_directories(dirs=None, out_path="CONFORMANCE.md"):
    """Run whole upstream pandas test directories under the proxy and
    record per-directory pass rates."""
    import tempfile
    import time
    import xml.etree.ElementTree as ET

    import pandas

    pkg = os.path.dirname(pandas.__file__)
    rows = []
    for d in dirs or DIRECTORIES:
        xml = tempfile.mktemp(suffix=".xml")
        cmd = [
            sys.executable, "-m", "pytest", "-q", "--no-header",
            "-p", "cudf_tpu.pandas._pytest_plugin", "-p", "no:cacheprovider",
            f"--junitxml={xml}", os.path.join(pkg, d),
        ]
        t0 = time.time()
        subprocess.call(cmd, stdout=subprocess.DEVNULL,
                        stderr=subprocess.DEVNULL)
        try:
            suite = ET.parse(xml).getroot().find("testsuite")
            total = int(suite.get("tests"))
            failed = int(suite.get("failures")) + int(suite.get("errors"))
            skipped = int(suite.get("skipped"))
        except Exception:
            total = failed = skipped = 0
        ran = total - skipped
        rate = (ran - failed) / ran * 100 if ran else 0.0
        rows.append((d, ran, ran - failed, rate, time.time() - t0))
        print(f"{d}: {ran - failed}/{ran} = {rate:.1f}%  "
              f"({time.time()-t0:.0f}s)", flush=True)
        if os.path.exists(xml):
            os.unlink(xml)
    total_ran = sum(r[1] for r in rows)
    total_pass = sum(r[2] for r in rows)
    lines = [
        "# cudf_tpu.pandas conformance — upstream pandas test directories",
        "",
        "Non-curated directory-scale runs of pandas' own test suite under",
        "the `cudf_tpu.pandas` proxy (the reference's strongest oracle,",
        "ci/cudf_pandas_scripts/pandas-tests/run.sh).  Skips excluded.",
        "",
        "| directory | passed / ran | rate |",
        "|---|---|---|",
    ]
    for d, ran, passed, rate, _ in rows:
        lines.append(f"| pandas/{d} | {passed} / {ran} | {rate:.1f}% |")
    lines.append(f"| **total** | **{total_pass} / {total_ran}** | "
                 f"**{total_pass / max(total_ran, 1) * 100:.1f}%** |")
    lines.append("")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}: {total_pass}/{total_ran} = "
          f"{total_pass / max(total_ran, 1) * 100:.1f}%")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--dirs":
        raise SystemExit(run_directories(sys.argv[2:] or None))
    raise SystemExit(main(sys.argv[1:]))
