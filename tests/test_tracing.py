"""Structured tracing/metrics (utils/tracing.py; fills the observability
gap SURVEY.md §5 documents for the reference)."""

import io
import json

import numpy as np

from cnf2freq_tpu.utils.tracing import NullTracer, Tracer


def test_spans_and_metrics():
    sink = io.StringIO()
    tr = Tracer(sink=sink)
    with tr.span("outer"):
        with tr.span("inner"):
            pass
        with tr.span("inner"):
            pass
    tr.metric(event="iteration", hitnnn=3)
    assert tr.spans["outer"].calls == 1
    assert tr.spans["outer/inner"].calls == 2
    assert tr.spans["outer"].total_s >= tr.spans["outer/inner"].total_s
    recs = [json.loads(l) for l in sink.getvalue().splitlines()]
    kinds = {r["type"] for r in recs}
    assert kinds == {"span", "metric"}
    m = [r for r in recs if r["type"] == "metric"][0]
    assert m["hitnnn"] == 3 and "t" in m
    rep = tr.report()
    assert "outer/inner" in rep


def test_null_tracer_is_noop():
    tr = NullTracer()
    with tr.span("x"):
        pass
    tr.metric(a=1)
    assert not tr.spans and not tr.metrics


def test_driver_emits_iteration_metrics():
    from cnf2freq_tpu.driver import Driver
    from cnf2freq_tpu.io import load_plantimpute
    ped = load_plantimpute("/root/reference/demoplantimpute.map",
                          "/root/reference/demoplantimpute.ped",
                          "/root/reference/demoplantimpute.gen")
    drv = Driver(ped)
    drv.tracer = Tracer()
    drv.preprocess()
    drv.iterate(early=True)
    drv.iterate()
    its = [m for m in drv.tracer.metrics if m.get("event") == "iteration"]
    assert len(its) == 2
    assert {"hitnnn", "inverted", "scalefactor", "flips"} <= set(its[-1])
    assert "preprocess" in drv.tracer.spans
    assert any(k.endswith("scan") for k in drv.tracer.spans)
    assert any(k.endswith("updates") for k in drv.tracer.spans)
