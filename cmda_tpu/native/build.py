"""Build the native ingest shared library.

Usage: python -m cmda_tpu.native.build
"""
from __future__ import annotations

import os
import subprocess

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "ingest.cpp")
LIB = os.path.join(HERE, "libcmda_ingest.so")


def build(verbose: bool = True) -> str:
    base = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-march=native", "-ffast-math", "-fno-finite-math-only",
        SRC, "-o", LIB,
    ]
    # full build links zlib (h5 chunk inflate) + libpng (frame decode);
    # degrade gracefully on images without the headers
    attempts = [
        base + ["-lpng", "-lz"],
        base + ["-DCMDA_NO_PNG", "-lz"],
    ]
    last = None
    for cmd in attempts:
        if verbose:
            print(" ".join(cmd))
        try:
            subprocess.run(cmd, check=True, capture_output=not verbose)
            return LIB
        except subprocess.CalledProcessError as e:
            last = e
    raise last


if __name__ == "__main__":
    build()
    print(f"built {LIB}")
