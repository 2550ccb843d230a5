"""Smoke-test the driver-critical ``bench.py`` artifact (CPU tiny path).

The driver runs ``python bench.py`` on real TPU hardware at the end of every
round and records the printed JSON lines as the round's BENCH artifact — a
regression in bench.py's wiring (model build, eval clone, train step, JSON
schema) would silently cost the round's headline metric.  This exercises the
same code through the ``--tiny`` CPU path at toy shapes.
"""

import io
import json
import os
import sys
from contextlib import redirect_stdout

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run_bench(arch: str):
    import bench

    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main(tiny=True, arch=arch)
    lines = [json.loads(l) for l in buf.getvalue().splitlines() if l.strip()]
    assert lines, "bench printed no JSON lines"
    for rec in lines:
        # flops/mfu are optional extras (FLOPS.json-driven, full shapes only)
        assert {"metric", "value", "unit", "vs_baseline"} <= set(rec), rec
        assert set(rec) <= {"metric", "value", "unit", "vs_baseline",
                            "flops", "mfu"}, rec
        assert rec["value"] > 0, rec
    return lines


@pytest.mark.parametrize(
    "arch", ["simplebsl_online", "san_online", "brivis", "openvis_online"]
)
def test_bench_tiny(arch):
    lines = _run_bench(arch)
    # the LAST line is the headline the driver parses: inference frames/s
    assert lines[-1]["metric"] == f"{arch}_r50_inference"
    assert lines[-1]["unit"] == "frames/s/chip"
    if arch in ("simplebsl_online", "san_online", "brivis"):
        # these archs also report the train step, BEFORE the headline
        assert lines[0]["metric"] == f"{arch}_r50_train_step"
        assert lines[0]["unit"] == "ms/step"
