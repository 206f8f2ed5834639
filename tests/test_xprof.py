"""XSpace trace summarizer (train/xprof.py): wire-format parse + device-op
aggregation, on a hand-emitted xplane.pb (same approach as test_sentencepiece.py)."""

import struct

import pytest

from llama_x_tpu.train.xprof import device_op_times


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        out += bytes([b | (0x80 if n else 0)])
        if not n:
            return out


def _field(num: int, wire: int, payload) -> bytes:
    key = _varint(num << 3 | wire)
    if wire == 0:
        return key + _varint(payload)
    if wire == 2:
        return key + _varint(len(payload)) + payload
    raise ValueError(wire)


def _event(meta_id: int, dur_ps: int, off_ps: int = 0) -> bytes:
    return _field(1, 0, meta_id) + _field(2, 0, off_ps) + _field(3, 0, dur_ps)


def _line(name: str, events) -> bytes:
    msg = _field(2, 2, name.encode())
    for e in events:
        msg += _field(4, 2, e)
    return msg


def _meta(mid: int, name: str) -> bytes:
    inner = _field(1, 0, mid) + _field(2, 2, name.encode())
    return _field(1, 0, mid) + _field(2, 2, inner)  # map entry {key, XEventMetadata}


def _plane(name: str, lines, metas) -> bytes:
    msg = _field(2, 2, name.encode())
    for ln in lines:
        msg += _field(3, 2, ln)
    for m in metas:
        msg += _field(4, 2, m)
    return msg


def test_device_op_aggregation(tmp_path):
    plane = _plane(
        "/device:TPU:0",
        [
            _line("XLA Ops", [_event(1, 2_000_000, 0), _event(1, 3_000_000, 4_000_000),
                              _event(2, 500_000, 8_000_000)]),
            _line("XLA Modules", [_event(1, 99_000_000)]),  # module totals must be skipped
        ],
        [_meta(1, "fusion.7"), _meta(2, "copy.1")],
    )
    host = _plane("/host:CPU", [_line("XLA Ops", [_event(1, 7_000_000)])], [_meta(1, "hostop")])
    space = _field(1, 2, plane) + _field(1, 2, host)
    d = tmp_path / "plugins" / "profile" / "t1"
    d.mkdir(parents=True)
    (d / "vm.xplane.pb").write_bytes(space)

    out = device_op_times(tmp_path)
    assert list(out) == ["/device:TPU:0"]  # host plane skipped
    ops = out["/device:TPU:0"]
    assert abs(ops["fusion.7"] - 5e-6) < 1e-12  # 2 disjoint events summed, ps -> s
    assert abs(ops["copy.1"] - 0.5e-6) < 1e-12


def test_nested_self_time_and_async(tmp_path):
    """A `while` scope spanning its children must contribute only its SELF time
    (duration minus direct children); async lines aggregate separately; the Steps
    line gives device busy time (the r4 8B trace double-counted 2x without this)."""
    from llama_x_tpu.train.xprof import device_summary

    # while.1: [0, 10ms) containing fusion.2 [1, 4ms) and fusion.2 [5, 8ms);
    # fusion.2 at [1,4) itself contains copy.3 [2, 3ms)
    ops_line = _line("XLA Ops", [
        _event(1, 10_000_000, 0),
        _event(2, 3_000_000, 1_000_000),
        _event(3, 1_000_000, 2_000_000),
        _event(2, 3_000_000, 5_000_000),
    ])
    async_line = _line("Async XLA Ops", [_event(4, 7_000_000, 0)])
    steps_line = _line("Steps", [_event(5, 10_000_000, 0)])
    plane = _plane(
        "/device:TPU:0",
        [ops_line, async_line, steps_line],
        [_meta(1, "while.1"), _meta(2, "fusion.2"), _meta(3, "copy.3"),
         _meta(4, "async-copy"), _meta(5, "step0")],
    )
    d = tmp_path / "plugins" / "profile" / "t1"
    d.mkdir(parents=True)
    (d / "vm.xplane.pb").write_bytes(_field(1, 2, plane))

    out = device_summary(tmp_path)["/device:TPU:0"]
    assert abs(out["ops"]["while.1"] - 4e-6) < 1e-12     # 10 - (3 + 3) direct children
    assert abs(out["ops"]["fusion.2"] - 5e-6) < 1e-12    # (3 - 1 nested copy) + 3
    assert abs(out["ops"]["copy.3"] - 1e-6) < 1e-12
    assert sum(out["ops"].values()) == pytest.approx(10e-6)  # self times tile the span
    assert abs(out["async"]["async-copy"] - 7e-6) < 1e-12   # separate, not in ops
    assert out["busy_s"] == pytest.approx(10e-6) and out["steps"] == 1

def test_roofline_bounds_and_waste():
    """Roofline math: compute- vs memory-bound classification against the named
    peaks, gap = achieved/SOL, available sums only POSITIVE waste (fusions whose
    declared bytes exceed true HBM traffic must not cancel real headroom)."""
    from llama_x_tpu.train.xprof import roofline

    peaks = {"bf16_tflops": 100.0, "int8_tflops": 200.0, "hbm_gbps": 1000.0}
    details = {
        # 1e12 flops @ bf16 peak -> SOL 10 ms; ran 20 ms -> gap 2, waste 10 ms
        "fusion.1": {"self_s": 0.020, "occurrences": 1,
                     "flops_per_exec": int(1e12), "bytes_per_exec": int(1e6)},
        # int8-named op gets the int8 peak: SOL 5 ms; ran 6 ms -> waste 1 ms
        "int8_mm_pallas.2": {"self_s": 0.006, "occurrences": 1,
                             "flops_per_exec": int(1e12), "bytes_per_exec": 0},
        # memory-bound: 1e7 B @ 1000 GB/s -> SOL 10 us; ran 30 us over 2 execs
        "copy.3": {"self_s": 0.00006, "occurrences": 2,
                   "flops_per_exec": 0, "bytes_per_exec": int(1e7)},
        # declared bytes OVERCOUNT (negative waste): must not reduce available_ms
        "fusion.4": {"self_s": 0.001, "occurrences": 1,
                     "flops_per_exec": 0, "bytes_per_exec": int(1e9)},  # SOL 1 ms? no: 1e9/1e12 s = 1 ms -> waste 0
        "fusion.5": {"self_s": 0.0005, "occurrences": 1,
                     "flops_per_exec": 0, "bytes_per_exec": int(1e9)},  # SOL 1 ms > self 0.5 ms
        # no cost metadata -> skipped
        "infeed.6": {"self_s": 0.5, "occurrences": 1, "flops_per_exec": 0, "bytes_per_exec": 0},
    }
    rl = roofline(details, peaks=peaks)
    by_op = {r["op"]: r for r in rl["ops"]}
    assert "infeed.6" not in by_op
    assert by_op["fusion.1"]["bound"] == "compute" and by_op["fusion.1"]["gap"] == 2.0
    assert by_op["fusion.1"]["waste_ms"] == pytest.approx(10.0)
    assert by_op["int8_mm_pallas.2"]["sol_ms"] == pytest.approx(5.0)  # int8 peak used
    assert by_op["copy.3"]["bound"] == "memory"
    assert by_op["copy.3"]["sol_ms"] == pytest.approx(0.02)  # 2 execs x 10 us
    assert by_op["fusion.5"]["waste_ms"] < 0  # overcounted bytes -> negative row…
    assert rl["available_ms"] == pytest.approx(
        sum(r["waste_ms"] for r in rl["ops"] if r["waste_ms"] > 0))  # …excluded here
    # worklist sorted by reclaimable time, biggest first
    wastes = [r["waste_ms"] for r in rl["ops"]]
    assert wastes == sorted(wastes, reverse=True)
