"""Build the native library: python -m pytorch_points_tpu._native.build"""

import os
import subprocess
import sys


def main():
    csrc = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "csrc"
    )
    rc = subprocess.call(["make", "-C", csrc])
    sys.exit(rc)


if __name__ == "__main__":
    main()
