"""Build the native vision library with g++ (no external deps).

Usage: python -m eincm_tpu.native.build
The ctypes binding (vision.py) also triggers this lazily on first import if
the shared object is missing or stale.
"""

from __future__ import annotations

import subprocess
from pathlib import Path

SRCS = [
    Path(__file__).parent / "vision.cpp",
    Path(__file__).parent / "events.cpp",
]
SRC = SRCS[0]  # back-compat
LIB = Path(__file__).parent / "libeincm_vision.so"

_failed = False  # a failed build is final for the process: don't re-spawn
# g++ (and re-log) on every available() probe — staging checks per window


def build(force: bool = False) -> Path | None:
    global _failed
    if _failed and not force:
        return None
    if (
        not force
        and LIB.exists()
        and all(LIB.stat().st_mtime >= s.stat().st_mtime for s in SRCS)
    ):
        return LIB
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread",
        *[str(s) for s in SRCS], "-o", str(LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"[eincm_tpu.native] build failed: {e}")
        _failed = True
        return None
    _failed = False
    return LIB


if __name__ == "__main__":
    out = build(force=True)
    print(f"built: {out}")
