"""Build the native wavio extension in-place (no pip): g++ → native/wavio.so.

Invoked automatically on first import by `data/native_loader.py`; can also be
run directly: ``python native/build.py``.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "wavio.cpp")
OUT = os.path.join(HERE, "wavio.so")


def build(force: bool = False) -> str:
    if (
        not force
        and os.path.exists(OUT)
        and os.path.getmtime(OUT) >= os.path.getmtime(SRC)
    ):
        return OUT
    include = sysconfig.get_path("include")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        f"-I{include}", SRC, "-o", OUT,
    ]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
