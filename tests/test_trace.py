"""utils.trace — per-op device-trace aggregation (synthetic trace fixture).

The live capture path runs on TPU only (tools/profile_trace_step.py,
``bench --trace``); CI pins the parsing/aggregation logic the live path
feeds through.
"""

import gzip
import json

import pytest

from gnn_bfs_rans_tpu.utils.trace import aggregate_device_trace, top_ops


@pytest.fixture
def trace_dir(tmp_path):
    events = [
        # process metadata: one device lane, one host lane
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 2,
         "args": {"name": "python host"}},
        # the device pid exposes several thread lanes; only "XLA Ops" is
        # the per-op timeline — "Steps"/"XLA Modules" spans cover the same
        # wall interval and must NOT be double-counted
        {"ph": "M", "name": "thread_name", "pid": 1, "tid": 1,
         "args": {"name": "Steps"}},
        {"ph": "M", "name": "thread_name", "pid": 1, "tid": 2,
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "name": "thread_name", "pid": 1, "tid": 3,
         "args": {"name": "XLA Ops"}},
        # device ops over 2 steps: fusion.1 (10+12 us), custom-call (30+28)
        {"ph": "X", "pid": 1, "tid": 3, "name": "fusion.1", "dur": 10.0,
         "args": {"long_name": "add(mul(...))"}},
        {"ph": "X", "pid": 1, "tid": 3, "name": "fusion.1", "dur": 12.0},
        {"ph": "X", "pid": 1, "tid": 3, "name": "gat_fwd_kernel", "dur": 30.0},
        {"ph": "X", "pid": 1, "tid": 3, "name": "gat_fwd_kernel", "dur": 28.0},
        # module/step lanes covering the same interval — must be skipped
        {"ph": "X", "pid": 1, "tid": 1, "name": "1", "dur": 90.0},
        {"ph": "X", "pid": 1, "tid": 2, "name": "a_module", "dur": 85.0},
        # jit_ wrapper spans double-count children — must be skipped
        {"ph": "X", "pid": 1, "tid": 3, "name": "jit_forward", "dur": 1000.0},
        # host-lane event — not device time
        {"ph": "X", "pid": 2, "tid": 9, "name": "dispatch", "dur": 500.0},
    ]
    d = tmp_path / "plugins" / "profile" / "run"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_aggregates_device_lane_only(trace_dir):
    res = aggregate_device_trace(trace_dir, n_steps=2)
    # (10+12+30+28) us / 2 steps = 40 us/step
    assert res["device_total_s_per_step"] == pytest.approx(40e-6)
    assert res["ops_us_per_step"] == {
        "gat_fwd_kernel": 29.0, "fusion.1": 11.0
    }
    assert "jit_forward" not in res["ops_us_per_step"]
    assert "dispatch" not in res["ops_us_per_step"]
    assert "1" not in res["ops_us_per_step"]         # Steps lane
    assert "a_module" not in res["ops_us_per_step"]  # XLA Modules lane
    assert res["op_detail"]["fusion.1"] == "add(mul(...))"


def test_top_ops_truncates(trace_dir):
    res = aggregate_device_trace(trace_dir, n_steps=2)
    t = top_ops(res, n=1)
    assert list(t["top_ops_us_per_step"]) == ["gat_fwd_kernel"]
    assert t["device_total_ms_per_step"] == pytest.approx(0.04)


def test_missing_trace_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        aggregate_device_trace(str(tmp_path), n_steps=1)
