"""On-demand build + ctypes loading of the native C++ components."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_LOCK = threading.Lock()
_CACHE: dict = {}

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")


def load_library(name: str) -> Optional[ctypes.CDLL]:
    """Compile native/<name>.cpp to a shared lib (cached) and dlopen it.

    Returns None when no compiler is available — callers fall back to the
    numpy implementation.
    """
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = os.path.join(NATIVE_DIR, f"{name}.cpp")
        build_dir = os.path.join(NATIVE_DIR, "build")
        lib_path = os.path.join(build_dir, f"lib{name}.so")
        lib = None
        try:
            if not os.path.exists(src):
                raise FileNotFoundError(src)
            if (not os.path.exists(lib_path)) or (
                os.path.getmtime(lib_path) < os.path.getmtime(src)
            ):
                os.makedirs(build_dir, exist_ok=True)
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-std=c++17", src, "-o", lib_path,
                    ],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(lib_path)
        except Exception as e:  # no compiler / build failure -> numpy fallback
            print(f"native {name} unavailable ({e}); using numpy fallback")
            lib = None
        _CACHE[name] = lib
        return lib
