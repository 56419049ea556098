"""Tracing / profiling / observability helpers.

TPU-native replacements for the reference's ad-hoc verbose timers and GPU
memory dumps (reference: energy.py:296-365, system.py:110-143).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from enum import Enum
from typing import Dict, Iterator, Optional

import jax


class LogKey(str, Enum):
    """Metric channels (reference src/optimizer/utils.py:9-17)."""

    E = "E"
    E_LOC = "E_LOC"
    E_LOC_VAR = "E_LOC_VAR"
    N_UNIQUE_SAMP = "N_UNIQUE_SAMP"
    TIME = "TIME"


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sink: Optional[dict] = None) -> Iterator[None]:
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink.setdefault(label, []).append(dt)
    else:
        print(f"[timed] {label}: {dt*1000:.2f} ms", flush=True)


def device_memory_stats() -> Dict[str, dict]:
    """Per-device memory statistics (bytes in use / limit where available)."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        out[str(d)] = {
            "bytes_in_use": s.get("bytes_in_use"),
            "peak_bytes_in_use": s.get("peak_bytes_in_use"),
            "bytes_limit": s.get("bytes_limit"),
        }
    return out


def save_log(log: dict, fname: str) -> str:
    """Persist a metrics log both as JSONL (one channel entry per line) and,
    when pandas is importable, as the reference-compatible DataFrame pickle
    (reference energy.py:511-538)."""
    base, _ = os.path.splitext(fname)
    jsonl = base + ".jsonl"
    with open(jsonl, "w") as f:
        for key, series in log.items():
            for step, value in series:
                f.write(json.dumps({"key": str(key), "step": step, "value": value}) + "\n")
    try:
        import pandas as pd

        frames = []
        for key, series in log.items():
            if not series:
                continue
            steps, values = zip(*series)
            frames.append(pd.DataFrame({str(key): values}, index=steps))
        if frames:
            df = pd.concat(frames, axis=1)
            df.to_pickle(base + ".pkl")
    except Exception:
        pass
    return jsonl
