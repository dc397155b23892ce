"""Build the native ingest shared library.

Usage: python -m cmda_tpu.native.build
"""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "ingest.cpp")
LIB = os.path.join(HERE, "libcmda_ingest.so")


def build(verbose: bool = True) -> str:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-march=native", "-ffast-math", "-fno-finite-math-only",
        SRC, "-o", LIB,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    build()
    print(f"built {LIB}")
