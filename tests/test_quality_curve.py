"""Quality regression guard: today's encoder must stay on the recorded
bench_quality.json curve.

No external VP8 binary can run in this environment (BASELINE.md), so the
curve is self-anchored; this test makes it a *pinned* anchor — any change
that silently shifts rate or quality fails here.  Two rows are re-measured
(one all-intra point, one full-feature point with segments + SSIM target)
with the exact bench_quality.run_config procedure; kbps must match to 0.5%
and PSNR/SSIM to 0.05 dB / 0.003 (the pipeline is integer-deterministic,
so real tolerance is zero — the slack only covers future metric rounding).
"""
import json
import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def recorded():
    with open(os.path.join(ROOT, "bench_quality.json")) as fh:
        return json.load(fh)


def _run_row(recorded, config_name):
    import sys
    sys.path.insert(0, ROOT)
    from bench_quality import run_config, synth_sequence

    row = next(r for r in recorded["rows"] if r["config"] == config_name)
    w, h = (int(t) for t in recorded["size"].split("x"))
    frames = synth_sequence(w, h, recorded["frames"], seed=0)
    cfg = {k: row[k] for k in ("qi_min", "qi_max", "gop_size", "altref_range",
                               "ssim_target") if k in row}
    got = run_config(config_name, cfg, frames, w, h, backend="tpu")
    assert abs(got["kbps"] - row["kbps"]) <= 0.005 * row["kbps"], \
        (got, row)
    assert abs(got["psnr"] - row["psnr"]) <= 0.05, (got, row)
    assert abs(got["ssim"] - row["ssim"]) <= 0.003, (got, row)


def test_quality_curve_intra_row(recorded):
    _run_row(recorded, "intra_qi56")


def test_quality_curve_full_row(recorded):
    _run_row(recorded, "full_q24-63")


def test_quality_curve_1080p_hd_row(recorded):
    """Pins the headline-resolution full-feature row (VERDICT r4 #9).
    Recorded on the real TPU; re-measured here on the CPU jax path —
    the streams are bit-identical across backends, so the numbers must
    match exactly (tolerances only cover rounding)."""
    import sys
    sys.path.insert(0, ROOT)
    from bench_quality import run_config, synth_sequence

    row = next(r for r in recorded["hd_rows"]
               if r["config"] == "full_1080p_q12-40")
    w, h = (int(t) for t in row["size"].split("x"))
    frames = synth_sequence(w, h, row["frames"], seed=0)
    cfg = {k: row[k] for k in ("qi_min", "qi_max", "gop_size",
                               "altref_range", "ssim_target")}
    got = run_config(row["config"], cfg, frames, w, h, backend="tpu",
                     decode_frames=1)
    assert abs(got["kbps"] - row["kbps"]) <= 0.005 * row["kbps"], (got, row)
    assert abs(got["psnr"] - row["psnr"]) <= 0.05, (got, row)
    assert abs(got["ssim"] - row["ssim"]) <= 0.003, (got, row)
