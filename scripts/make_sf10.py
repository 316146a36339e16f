#!/usr/bin/env python
"""100x fixture (60M-row lineitem, 10M events, 500k documents) into
./bench_sf10/ with multi-file parquet (~64 MB files) for the scaled
tables — the shuffle-regime bench fixture (BENCH sf10 arm)."""
from __future__ import annotations

import os

from make_sf1 import REPO, make


def main() -> None:
    make(
        dst=os.path.join(REPO, "bench_sf10"),
        copies=100,
        file_size_bytes=64 * 1024 * 1024,
    )


if __name__ == "__main__":
    main()
