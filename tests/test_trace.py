"""utils.trace — the CV_TRACE_* / CV_INSTRUMENT analogue
(core/src/trace.cpp): nested host spans, Chrome trace-event output,
dispatch-tier counters."""

import json

import numpy as np

import opencv_tpu as tcv
from opencv_tpu.utils import trace


def test_region_spans_and_dump(tmp_path):
    trace.reset()
    trace.start()
    try:
        with trace.trace_region("outer", kind="test"):
            with trace.trace_region("inner"):
                np.arange(10).sum()
    finally:
        trace.stop()
    evs = trace.events()
    names = [e["name"] for e in evs]
    assert "outer" in names and "inner" in names
    inner = next(e for e in evs if e["name"] == "inner")
    outer = next(e for e in evs if e["name"] == "outer")
    assert inner["args"]["depth"] == 1      # nested under outer
    assert outer["args"]["depth"] == 0
    assert outer["dur"] >= inner["dur"]
    assert outer["args"]["kind"] == "test"
    p = str(tmp_path / "t.json")
    trace.dump_trace(p)
    doc = json.load(open(p))
    assert {e["name"] for e in doc["traceEvents"]} >= {"outer", "inner"}
    assert doc["traceEvents"][0]["ph"] == "X"


def test_decorator_and_disabled_costs_nothing():
    trace.reset()
    trace.stop()

    @trace.region("decorated")
    def f(x):
        return x + 1

    assert f(1) == 2
    assert trace.events() == []             # disabled: no host spans


def test_dispatch_tier_counters():
    trace.reset()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 48, 1), np.uint8)
    tcv.GaussianBlur(img, (5, 5), 0)        # exercises the dispatch ladder
    stats = trace.tier_stats()
    assert any(k.startswith("tier.") for k in stats), stats
    # on the CPU test backend the pallas tier is gated off -> xla tier
    assert any(k.endswith(".xla") or k.endswith(".pallas")
               for k in stats)


def test_logger_per_tag_levels(capsys):
    from opencv_tpu.utils import logger as lg
    prev = lg.getLogLevel()
    try:
        lg.setLogLevel(lg.LOG_LEVEL_WARNING)
        lg.setLogTagLevel("imgproc.resize", lg.LOG_LEVEL_DEBUG)
        assert lg.getLogTagLevel("imgproc.resize") == lg.LOG_LEVEL_DEBUG
        # dotted-prefix match
        assert lg.getLogTagLevel("imgproc.resize.cubic") \
            == lg.LOG_LEVEL_DEBUG
        assert lg.getLogTagLevel("core") == lg.LOG_LEVEL_WARNING
        lg.log(lg.LOG_LEVEL_DEBUG, "visible", tag="imgproc.resize")
        lg.log(lg.LOG_LEVEL_DEBUG, "hidden", tag="core")
        err = capsys.readouterr().err
        assert "visible" in err and "hidden" not in err
    finally:
        lg.setLogLevel(prev)
        lg._tag_levels.pop("imgproc.resize", None)
