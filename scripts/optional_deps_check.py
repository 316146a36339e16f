#!/usr/bin/env python
"""One-command status + exercise run for the optional-dependency lane.

Reports which optional decoders are present (pillow / openai-whisper /
ffmpeg binary / gradio), then runs the skip-marked integration tests
that become live when they are installed
(tests/test_multimodal_optional.py). With no optional deps installed
this prints the skip table and exits 0 — the lane is healthy, just
dormant. Install via requirements-optional.txt (+ a system ffmpeg) and
re-run; the skips turn into passes.

Record the latest result in COVERAGE.md when the deps change.
"""
from __future__ import annotations

import importlib.util
import shutil
import subprocess
import sys

REPO = __file__.rsplit("/", 2)[0]


def main() -> int:
    status = {
        "pillow (PIL)": importlib.util.find_spec("PIL") is not None,
        "openai-whisper": importlib.util.find_spec("whisper") is not None,
        "ffmpeg binary": shutil.which("ffmpeg") is not None,
        "gradio": importlib.util.find_spec("gradio") is not None,
    }
    for name, present in status.items():
        print(f"{'PRESENT' if present else 'absent ':8} {name}")
    print()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest",
         "tests/test_multimodal_optional.py", "-v", "-rs"],
        cwd=REPO,
    )
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
