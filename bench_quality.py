"""Quality benchmark: PSNR / SSIM vs bitrate over a quantizer sweep.

The reference publishes no quality numbers (README.md:37), so per BASELINE.md
the curve is self-established: encode a synthetic textured pan and a
noise-structured sequence at several quantizer indices, for an intra-only
config and for the full feature set (3 refs + segments + SSIM target), and
report (qi, kbps, PSNR, SSIM) rows.  The decoder oracle validates every
stream; quality is measured decoder-side (decode == recon is asserted).

Usage: python bench_quality.py [--backend spec|tpu] [--frames N] [--size WxH]
Writes bench_quality.json and prints one JSON line with the curve.
"""
import argparse
import json
import sys

import numpy as np


def synth_sequence(w, h, n, seed=0):
    from vp8oclenc_tpu.io.y4m import Frame
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h + 64, 0:w + 64]
    base = (128 + 60 * np.sin(xx / 37.0) * np.cos(yy / 29.0)
            + 40 * np.sin((xx + yy) / 11.0))
    base = (base + rng.integers(0, 24, base.shape)).clip(0, 255).astype(np.uint8)
    frames = []
    for t in range(n):
        ox, oy = 3 * t, 2 * t
        y = np.ascontiguousarray(base[oy:oy + h, ox:ox + w])
        u = np.ascontiguousarray(base[oy // 2:oy // 2 + h // 2,
                                      ox // 2:ox // 2 + w // 2] // 2 + 60)
        v = np.ascontiguousarray(base[oy // 2 + 8:oy // 2 + 8 + h // 2,
                                      ox // 2 + 4:ox // 2 + 4 + w // 2] // 2 + 50)
        frames.append(Frame(y, u, v))
    return frames


def run_config(name, cfg_kwargs, frames, w, h, backend, fps=30,
               decode_frames=None):
    from vp8oclenc_tpu.config import EncoderConfig
    from vp8oclenc_tpu.pipeline.encoder import Encoder
    from vp8oclenc_tpu.decoder.vp8dec import VP8Decoder
    from vp8oclenc_tpu.utils.metrics import frame_psnr, ssim_plane

    enc = Encoder(EncoderConfig(**cfg_kwargs), w, h, backend=backend)
    dec = VP8Decoder()
    total = 0
    psnrs, ssims = [], []
    for i, f in enumerate(frames):
        payload = enc.encode_frame(f)
        total += len(payload)
        ry, ru, rv = (np.asarray(p) for p in enc.recon)
        if decode_frames is None or i < decode_frames:
            # decoder oracle (the python decoder is slow at HD sizes;
            # decode==recon equivalence is separately proven by the test
            # suite at smaller sizes, so HD rows may spot-check frame 0)
            out = dec.decode_frame(payload)
            assert np.array_equal(out.y, ry), f"{name}: decode != recon"
        src = (f.y, f.u, f.v)
        rec = (ry[:h, :w], ru[:h // 2, :w // 2], rv[:h // 2, :w // 2])
        psnrs.append(frame_psnr(src, rec)["all"])
        ssims.append((ssim_plane(src[0], rec[0]) * 2
                      + ssim_plane(src[1], rec[1])
                      + ssim_plane(src[2], rec[2])) / 4)
    kbps = total * 8 * fps / len(frames) / 1000.0
    return {"config": name, "kbps": round(kbps, 1),
            "psnr": round(float(np.mean(psnrs)), 3),
            "ssim": round(float(np.mean(ssims)), 4), **cfg_kwargs}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="tpu", choices=["spec", "tpu"])
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", default="352x288")
    ap.add_argument("--hd", action="store_true",
                    help="append a 1280x720 full-feature row (BASELINE "
                         "config 3) to the existing bench_quality.json")
    ap.add_argument("--hd1080", action="store_true",
                    help="append a 1920x1080 full-feature 8-frame row "
                         "(the headline resolution; pinned by "
                         "tests/test_quality_curve.py)")
    args = ap.parse_args(argv)

    if args.hd or args.hd1080:
        if args.hd1080:
            w, h, n, name = 1920, 1080, 8, "full_1080p_q12-40"
        else:
            w, h, n, name = 1280, 720, 4, "full_720p_q12-40"
        frames = synth_sequence(w, h, n)
        row = run_config(name,
                         dict(qi_min=12, qi_max=40, gop_size=100,
                              altref_range=5, ssim_target=0.93),
                         frames, w, h, args.backend, decode_frames=1)
        with open("bench_quality.json") as fh:
            out = json.load(fh)
        rows = [r for r in out.get("hd_rows", [])
                if r["config"] != name]
        rows.append(dict(row, size=f"{w}x{h}", frames=n,
                         backend=args.backend))
        out["hd_rows"] = rows
        with open("bench_quality.json", "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps(out["hd_rows"]))
        return 0

    w, h = (int(x) for x in args.size.split("x"))
    frames = synth_sequence(w, h, args.frames)

    rows = []
    for qi in (8, 20, 36, 56, 80, 104):
        rows.append(run_config(
            f"intra_qi{qi}", dict(qi_min=qi, qi_max=qi, gop_size=1),
            frames, w, h, args.backend))
    for qi_min, qi_max in ((4, 24), (12, 40), (24, 63), (40, 100)):
        rows.append(run_config(
            f"full_q{qi_min}-{qi_max}",
            dict(qi_min=qi_min, qi_max=qi_max, gop_size=100,
                 altref_range=5, ssim_target=0.93),
            frames, w, h, args.backend))

    out = {"metric": "quality_curve", "size": args.size,
           "frames": args.frames, "backend": args.backend, "rows": rows}
    with open("bench_quality.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
