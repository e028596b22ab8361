"""Build the native annotation library (g++ -> libnsnative.so)."""

from __future__ import annotations

import os
import subprocess

HERE = os.path.dirname(os.path.abspath(__file__))
SO_PATH = os.path.join(HERE, "libnsnative.so")
SOURCES = [os.path.join(HERE, "annotate.cc")]


def build(force: bool = False) -> str:
    if not force and os.path.exists(SO_PATH):
        newest_src = max(os.path.getmtime(s) for s in SOURCES)
        if os.path.getmtime(SO_PATH) >= newest_src:
            return SO_PATH
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           "-o", SO_PATH] + SOURCES
    subprocess.run(cmd, check=True)
    return SO_PATH


if __name__ == "__main__":
    print(build(force=True))
