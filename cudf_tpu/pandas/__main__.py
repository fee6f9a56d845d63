"""python -m cudf_tpu.pandas script.py [args...]

(reference: python/cudf/cudf/pandas/__main__.py)
"""

import runpy
import sys

import cudf_tpu.pandas


def main():
    cudf_tpu.pandas.install()
    if len(sys.argv) < 2:
        print("usage: python -m cudf_tpu.pandas <script.py> [args...]")
        sys.exit(1)
    sys.argv = sys.argv[1:]
    runpy.run_path(sys.argv[0], run_name="__main__")


if __name__ == "__main__":
    main()
