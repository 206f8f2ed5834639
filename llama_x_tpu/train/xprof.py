"""Offline XSpace (xplane.pb) summarizer: per-op device time without tensorboard.

``jax.profiler.trace`` writes an XSpace protobuf per host
(plugins/profile/<ts>/*.xplane.pb). The standard viewer is the tensorboard profile
plugin, which is not installed in this image — this module parses the wire format
directly (same hand-rolled approach as data/sentencepiece.py) and aggregates device
time by XLA op / source location, which is what you actually want when deciding what
to optimize next.

XSpace schema (tsl/profiler/protobuf/xplane.proto, public):
  XSpace  { repeated XPlane planes = 1; }
  XPlane  { 1: id, 2: name, 3: repeated XLine, 4: map<int64, XEventMetadata>,
            5: map<int64, XStatMetadata> }
  XLine   { 1: id, 2: name, 4: repeated XEvent, 11: display_name }
  XEvent  { 1: metadata_id, 3: duration_ps, 2: offset_ps, 5: num_occurrences }
  XEventMetadata { 1: id, 2: name, 4: display_name }

usage:
  python -m llama_x_tpu.train.xprof <trace_dir>          # top device ops
  python -m llama_x_tpu.train.xprof <trace_dir> --by-source
(<trace_dir> is the dir passed to jax.profiler.trace / Profiler)
"""

from __future__ import annotations

import collections
import struct
from pathlib import Path

from llama_x_tpu.data.sentencepiece import _fields  # protobuf wire-format walker


def _parse_line(buf: bytes):
    name, events = "", []
    display = ""
    for f, _, v in _fields(buf):
        if f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 11:
            display = v.decode("utf-8", "replace")
        elif f == 4:
            meta_id = dur = 0
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    meta_id = v2
                elif f2 == 3:
                    dur = v2
            events.append((meta_id, dur))
    return display or name, events


def _parse_plane(buf: bytes):
    name, lines, metadata = "", [], {}
    for f, _, v in _fields(buf):
        if f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 3:
            lines.append(_parse_line(v))
        elif f == 4:  # map entry { 1: key, 2: XEventMetadata }
            key, meta = 0, {}
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    key = v2
                elif f2 == 2:
                    for f3, _, v3 in _fields(v2):
                        if f3 == 2:
                            meta["name"] = v3.decode("utf-8", "replace")
                        elif f3 == 4:
                            meta["display"] = v3.decode("utf-8", "replace")
            metadata[key] = meta.get("display") or meta.get("name", str(key))
    return name, lines, metadata


def device_op_times(trace_dir: str | Path) -> dict[str, dict[str, float]]:
    """{device_plane_name: {op_name: total_device_seconds}} aggregated over every
    xplane.pb under trace_dir (host planes are skipped)."""
    out: dict[str, dict[str, float]] = {}
    for pb in sorted(Path(trace_dir).rglob("*.xplane.pb")):
        data = pb.read_bytes()
        for f, _, v in _fields(data):
            if f != 1:
                continue
            name, lines, metadata = _parse_plane(v)
            if "device:" not in name and "TPU" not in name:
                continue
            agg = out.setdefault(name, collections.defaultdict(float))
            for line_name, events in lines:
                if line_name not in ("XLA Ops", "XLA Modules") and "Ops" not in line_name:
                    continue
                if "Module" in line_name:
                    continue  # module totals double-count their ops
                for meta_id, dur_ps in events:
                    agg[metadata[meta_id] if meta_id in metadata else str(meta_id)] += dur_ps / 1e12
    return {k: dict(v) for k, v in out.items()}


def _bucket(op_name: str) -> str:
    """Collapse XLA op names into human buckets (fusion.123 -> fusion, etc.)."""
    base = op_name.split(".")[0].split("(")[0]
    return base


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("trace_dir")
    parser.add_argument("--top", type=int, default=25)
    parser.add_argument("--buckets", action="store_true", help="aggregate by op family")
    args = parser.parse_args()

    planes = device_op_times(args.trace_dir)
    if not planes:
        print("no device planes found (host-only trace?)")
        return
    for plane, ops in planes.items():
        total = sum(ops.values())
        print(f"== {plane}: {total*1e3:.2f} ms device time over {len(ops)} distinct ops")
        if args.buckets:
            agg = collections.defaultdict(float)
            for name, t in ops.items():
                agg[_bucket(name)] += t
            ops = agg
        for name, t in sorted(ops.items(), key=lambda x: -x[1])[: args.top]:
            print(f"  {t*1e3:9.3f} ms  {100*t/total:5.1f}%  {name[:100]}")


if __name__ == "__main__":
    main()
