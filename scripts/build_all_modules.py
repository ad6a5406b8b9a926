"""Batch index build for every configured module
(reference scripts/build_all_modules.py)."""
import sys

from tensortruth_tpu.build_db import main

if __name__ == "__main__":
    sys.exit(main(["--all", *sys.argv[1:]]))
