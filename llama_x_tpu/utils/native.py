"""Build-on-first-use helper for the native C++ components (native/*.cc).

One place owns the staleness check and g++ invocation so the FLAC decoder and the
SentencePiece encoder (and future native components) cannot drift.
"""

from __future__ import annotations

import subprocess
from pathlib import Path

NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"


def build_native(src_name: str, lib_name: str) -> Path:
    """Compile native/<src_name> to native/<lib_name> if missing or stale.
    Raises on compiler failure (callers decide whether that is fatal)."""
    src = NATIVE_DIR / src_name
    lib = NATIVE_DIR / lib_name
    if not (lib.exists() and lib.stat().st_mtime >= src.stat().st_mtime):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(src), "-o", str(lib)],
            check=True, capture_output=True,
        )
    return lib
