"""Build libqzcore.so with g++.  Usage: python -m qatzip_tpu.native.build"""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRCS = [os.path.join(HERE, "qzcore.cpp"), os.path.join(HERE, "qzdeflate.cpp"),
        os.path.join(HERE, "qzbatch.cpp")]
OUT = os.path.join(HERE, "libqzcore.so")


def build(force: bool = False) -> str | None:
    if (not force and os.path.exists(OUT)
            and all(os.path.getmtime(OUT) >= os.path.getmtime(s)
                    for s in SRCS)):
        return OUT
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", *SRCS, "-lz", "-o", OUT]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        print(f"qzcore build failed: {exc}", file=sys.stderr)
        return None
    return OUT


if __name__ == "__main__":
    path = build(force=True)
    print(f"built {path}" if path else "build FAILED")
    sys.exit(0 if path else 1)
