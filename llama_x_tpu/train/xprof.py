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
            meta_id = dur = off = 0
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    meta_id = v2
                elif f2 == 2:
                    off = v2
                elif f2 == 3:
                    dur = v2
            events.append((meta_id, off, dur))
    return display or name, events


def _self_times(events) -> dict[int, float]:
    """Per-metadata-id SELF time (seconds) for one line of possibly-nested events.

    TPU 'XLA Ops' lines nest scopes: a `while` (layer scan) event spans every op it
    contains, fusions span their producers, etc. Summing durations double-counts —
    the r4 8B trace attributed 1877 ms/step on a 942 ms/step device. Self time =
    duration minus the durations of DIRECT children (standard flame-graph collapse
    over the properly-nested interval list)."""
    out: dict[int, float] = collections.defaultdict(float)
    stack: list[list] = []  # [end_ps, meta_id, dur_ps, child_ps]
    for meta_id, off, dur in sorted(events, key=lambda e: (e[1], -e[2])):
        while stack and stack[-1][0] <= off:
            _, m, d, c = stack.pop()
            out[m] += max(d - c, 0) / 1e12
        if stack:
            stack[-1][3] += dur
        stack.append([off + dur, meta_id, dur, 0])
    while stack:
        _, m, d, c = stack.pop()
        out[m] += max(d - c, 0) / 1e12
    return out


def _parse_stat(buf: bytes):
    """XStat { 1: metadata_id, value oneof: 2 double (fixed64), 3 uint64, 4 int64,
    5 str, 6 bytes, 7 ref }; returns (stat_metadata_id, value)."""
    sid, val = 0, None
    for f, w, v in _fields(buf):
        if f == 1:
            sid = v
        elif f == 2 and w == 1:
            val = struct.unpack("<d", struct.pack("<Q", v))[0]
        elif f in (3, 4, 7):
            val = v
        elif f == 5:
            val = v.decode("utf-8", "replace")
        elif f == 6:
            val = v
    return sid, val


def _parse_plane(buf: bytes, want_stats: bool = False):
    name, lines, metadata, stats = "", [], {}, {}
    stat_names: dict[int, str] = {}
    for f, _, v in _fields(buf):
        if f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 3:
            lines.append(_parse_line(v))
        elif f == 4:  # map entry { 1: key, 2: XEventMetadata }
            key, meta = 0, {}
            meta_stats = []
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    key = v2
                elif f2 == 2:
                    for f3, _, v3 in _fields(v2):
                        if f3 == 2:
                            meta["name"] = v3.decode("utf-8", "replace")
                        elif f3 == 4:
                            meta["display"] = v3.decode("utf-8", "replace")
                        elif f3 == 5 and want_stats:
                            meta_stats.append(_parse_stat(v3))
            metadata[key] = meta.get("display") or meta.get("name", str(key))
            if meta_stats:
                stats[key] = meta_stats
    if want_stats:
        # XStatMetadata map: XPlane field 5 { 1: key, 2: XStatMetadata { 1: id, 2: name } }
        for f, _, v in _fields(buf):
            if f != 5:
                continue
            for f2, _, v2 in _fields(v):
                if f2 == 2:
                    sid, sname = 0, ""
                    for f3, _, v3 in _fields(v2):
                        if f3 == 1:
                            sid = v3
                        elif f3 == 2:
                            sname = v3.decode("utf-8", "replace")
                    stat_names[sid] = sname
        named = {
            key: {stat_names.get(sid, str(sid)): val for sid, val in st}
            for key, st in stats.items()
        }
        return name, lines, metadata, named
    return name, lines, metadata


def device_summary(trace_dir: str | Path) -> dict[str, dict]:
    """Per-device-plane attribution over every xplane.pb under trace_dir:

      {plane: {"ops": {op: self_seconds},       # 'XLA Ops' line, nesting collapsed
               "async": {op: seconds},          # 'Async XLA Ops' (overlapped DMA etc.)
               "busy_s": float,                 # 'Steps' line total (true device busy)
               "steps": int}}                   # number of step events

    'ops' self-times sum to ~busy_s (gaps = unattributed); 'async' runs CONCURRENT
    with ops and must not be added to it. Host planes are skipped."""
    out: dict[str, dict] = {}
    for pb in sorted(Path(trace_dir).rglob("*.xplane.pb")):
        data = pb.read_bytes()
        for f, _, v in _fields(data):
            if f != 1:
                continue
            name, lines, metadata = _parse_plane(v)
            if "device:" not in name and "TPU" not in name:
                continue
            plane = out.setdefault(
                name,
                {"ops": collections.defaultdict(float),
                 "async": collections.defaultdict(float),
                 "busy_s": 0.0, "steps": 0},
            )
            for line_name, events in lines:
                if line_name == "Steps":
                    plane["busy_s"] += sum(d for _, _, d in events) / 1e12
                    plane["steps"] += len(events)
                elif line_name == "XLA Ops":
                    for meta_id, t in _self_times(events).items():
                        plane["ops"][metadata.get(meta_id, str(meta_id))] += t
                elif "Async" in line_name and "Ops" in line_name:
                    for meta_id, _, dur_ps in events:
                        plane["async"][metadata.get(meta_id, str(meta_id))] += dur_ps / 1e12
    for plane in out.values():
        plane["ops"] = dict(plane["ops"])
        plane["async"] = dict(plane["async"])
    return out


def device_op_times(trace_dir: str | Path) -> dict[str, dict[str, float]]:
    """{device_plane_name: {op_name: self_device_seconds}} — the 'XLA Ops' view of
    device_summary (kept as the simple entry point; async DMA excluded)."""
    return {name: plane["ops"] for name, plane in device_summary(trace_dir).items()}


def op_details(trace_dir: str | Path) -> dict[str, dict]:
    """Self-time joined with the per-op HLO metadata the TPU runtime embeds in the
    trace: {op: {self_s, category, flops, bytes_accessed, source, achieved_tflops,
    achieved_gbps}}. flops/bytes are per EXECUTION; occurrences counts executions, so
    achieved rates use self_s/occurrences. This is what turns the top-op table into
    an optimization worklist (is the big fusion compute- or bandwidth-bound, and
    which model line emitted it?)."""
    out: dict[str, dict] = {}
    for pb in sorted(Path(trace_dir).rglob("*.xplane.pb")):
        data = pb.read_bytes()
        for f, _, v in _fields(data):
            if f != 1:
                continue
            name, lines, metadata, stats = _parse_plane(v, want_stats=True)
            if "device:" not in name and "TPU" not in name:
                continue
            occur: dict[int, int] = collections.defaultdict(int)
            selfs: dict[int, float] = collections.defaultdict(float)
            for line_name, events in lines:
                if line_name != "XLA Ops":
                    continue
                for mid, t in _self_times(events).items():
                    selfs[mid] += t
                for mid, _, _ in events:
                    occur[mid] += 1
            for mid, t in selfs.items():
                op = metadata.get(mid, str(mid))
                st = stats.get(mid, {})
                n = max(occur[mid], 1)
                flops = int(st.get("flops", 0) or 0)
                nbytes = int(st.get("bytes_accessed", 0) or 0)
                per_exec = t / n
                d = out.setdefault(op, {
                    "self_s": 0.0, "occurrences": 0,
                    "category": st.get("hlo_category", ""),
                    "flops_per_exec": flops, "bytes_per_exec": nbytes,
                    "source": st.get("source", ""),
                })
                d["self_s"] += t
                d["occurrences"] += n
                if per_exec > 0:
                    d["achieved_tflops"] = round(flops / per_exec / 1e12, 2)
                    d["achieved_gbps"] = round(nbytes / per_exec / 1e9, 1)
    return out


def _bucket(op_name: str) -> str:
    """Collapse XLA op names into human buckets (fusion.123 -> fusion, etc.)."""
    base = op_name.split(".")[0].split("(")[0]
    return base


# Per-chip peaks for the roofline. v5e (the bench chip, bench.py:34): 197 TFLOP/s
# bf16 MXU, int8 runs at 2x, 819 GB/s HBM. Swap for other generations via --peaks.
PEAKS_V5E = {"bf16_tflops": 197.0, "int8_tflops": 394.0, "hbm_gbps": 819.0}


def roofline(details: dict[str, dict], peaks: dict = PEAKS_V5E, steps: int = 1) -> dict:
    """Speed-of-light analysis over op_details(): for each op with HLO cost metadata,
    the roofline-minimum time is max(flops/peak_flops, bytes/peak_bw) — whichever
    side dominates names the bound. ``gap`` = achieved/SOL (1.0 = at the roofline);
    ``waste_ms`` = self − SOL per step, i.e. the step-time available from making THIS
    op perfect, which is the right sort key for an optimization worklist (a 2x-off
    tiny op matters less than a 1.2x-off giant one).

    Caveats, so the numbers are read honestly: flops/bytes come from XLA's per-HLO
    cost model (bytes_accessed counts declared operand+result bytes, which for a
    fusion can exceed true HBM traffic when operands stay in VMEM/registers —
    achieved_gbps > peak flags exactly this); int8 Pallas GEMMs are matched by name
    and get the int8 peak; everything else is assumed bf16 MXU-eligible. Ops with no
    cost metadata (copies, infeed) get a bytes-only roofline when bytes are known and
    are skipped otherwise."""
    rows = []
    for op, d in details.items():
        self_s = d.get("self_s", 0.0)
        occ = max(d.get("occurrences", 1), 1)
        flops = d.get("flops_per_exec", 0) or 0
        nbytes = d.get("bytes_per_exec", 0) or 0
        if self_s <= 0 or (not flops and not nbytes):
            continue
        peak_f = peaks["int8_tflops"] if "int8" in op else peaks["bf16_tflops"]
        t_compute = flops / (peak_f * 1e12)
        t_memory = nbytes / (peaks["hbm_gbps"] * 1e9)
        sol = max(t_compute, t_memory)
        per_exec = self_s / occ
        rows.append({
            "op": op,
            "self_ms": round(self_s * 1e3 / steps, 3),
            "sol_ms": round(sol * occ * 1e3 / steps, 3),
            "bound": "compute" if t_compute >= t_memory else "memory",
            "gap": round(per_exec / sol, 2) if sol > 0 else None,
            "waste_ms": round((self_s - sol * occ) * 1e3 / steps, 3),
            "category": d.get("category", ""),
            "source": d.get("source", ""),
        })
    rows.sort(key=lambda r: -r["waste_ms"])
    total_self = sum(r["self_ms"] for r in rows)
    # Sum POSITIVE waste only: ops whose declared bytes exceed true HBM traffic
    # (fusion operands resident in VMEM) get sol > self, and letting that negative
    # "waste" cancel real headroom elsewhere would understate what's available.
    available = sum(r["waste_ms"] for r in rows if r["waste_ms"] > 0)
    return {
        "peaks": peaks,
        "attributed_ms": round(total_self, 2),
        # step-time reclaimable if every op ran at its roofline — the ceiling of the
        # CURRENT op mix (fewer/other ops, e.g. less remat, can beat it)
        "available_ms": round(available, 2),
        "sol_speedup": round(total_self / (total_self - available), 3)
        if available < total_self else None,
        "ops": rows,
    }


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("trace_dir")
    parser.add_argument("--top", type=int, default=25)
    parser.add_argument("--buckets", action="store_true", help="aggregate by op family")
    parser.add_argument("--roofline", action="store_true",
                        help="speed-of-light gap table (needs HLO cost metadata in the trace)")
    parser.add_argument("--steps", type=int, default=1,
                        help="traced step count to divide per-step numbers by (roofline)")
    args = parser.parse_args()

    if args.roofline:
        rl = roofline(op_details(args.trace_dir), steps=args.steps)
        print(f"attributed {rl['attributed_ms']:.1f} ms/step, {rl['available_ms']:.1f} ms "
              f"above per-op rooflines -> {rl['sol_speedup']:.2f}x ceiling on this op mix")
        print(f"{'self':>9} {'SOL':>9} {'gap':>6}  bound    op / source")
        for r in rl["ops"][: args.top]:
            print(f"{r['self_ms']:8.2f}m {r['sol_ms']:8.2f}m {r['gap'] or 0:6.2f}  "
                  f"{r['bound']:<7}  {r['op'][:60]}  {r['source'].split('/')[-1]}")
        return

    planes = device_summary(args.trace_dir)
    if not planes:
        print("no device planes found (host-only trace?)")
        return
    for plane, info in planes.items():
        ops, busy = info["ops"], info["busy_s"]
        total = sum(ops.values())
        print(f"== {plane}: {total*1e3:.2f} ms op self-time over {len(ops)} distinct ops"
              f" (device busy {busy*1e3:.2f} ms / {info['steps']} steps)")
        if args.buckets:
            agg = collections.defaultdict(float)
            for name, t in ops.items():
                agg[_bucket(name)] += t
            ops = agg
        for name, t in sorted(ops.items(), key=lambda x: -x[1])[: args.top]:
            print(f"  {t*1e3:9.3f} ms  {100*t/total:5.1f}%  {name[:100]}")
        if info["async"]:
            at = sum(info["async"].values())
            print(f"  -- async (overlapped, not additive): {at*1e3:.2f} ms total")


if __name__ == "__main__":
    main()
