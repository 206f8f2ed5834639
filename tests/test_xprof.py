"""XSpace trace summarizer (train/xprof.py): wire-format parse + device-op
aggregation, on a hand-emitted xplane.pb (same approach as test_sentencepiece.py)."""

import struct

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


def _event(meta_id: int, dur_ps: int) -> bytes:
    return _field(1, 0, meta_id) + _field(3, 0, dur_ps)


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
            _line("XLA Ops", [_event(1, 2_000_000), _event(1, 3_000_000), _event(2, 500_000)]),
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
    assert abs(ops["fusion.7"] - 5e-6) < 1e-12  # 2 events summed, ps -> s
    assert abs(ops["copy.1"] - 0.5e-6) < 1e-12
