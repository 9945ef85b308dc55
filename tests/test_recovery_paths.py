"""Quality-recovery control paths: scene-change forcing, redo-as-key, and
the -dump-recon debug surface (VERDICT r2 'recovery paths untested')."""
import io

import numpy as np

from vp8oclenc_tpu.config import EncoderConfig
from vp8oclenc_tpu.io.y4m import Frame
from vp8oclenc_tpu.pipeline.encoder import Encoder


def _flat(w, h, y=128, u=120, v=130):
    return Frame(np.full((h, w), y, np.uint8),
                 np.full((h // 2, w // 2), u, np.uint8),
                 np.full((h // 2, w // 2), v, np.uint8))


def test_scene_change_forces_keyframe():
    """A chroma cut after the 4-frame holdover window forces a keyframe
    (vp8enc.cpp:265-311) and bumps the stats counter."""
    w, h = 64, 48
    enc = Encoder(EncoderConfig(qi_min=10, qi_max=30, gop_size=100),
                  w, h, backend="spec")
    for _ in range(6):
        enc.encode_frame(_flat(w, h))
    assert enc.stats.scene_changes_by_color == 0
    enc.encode_frame(_flat(w, h, u=200, v=40))      # massive chroma cut
    assert enc.stats.scene_changes_by_color == 1
    assert enc.last_frame_stats["is_key"]


def test_scene_change_holdover_suppresses_serial_keys():
    """Cuts within 4 frames of the last key detection do NOT immediately
    force a key (the holdover rule)."""
    w, h = 64, 48
    enc = Encoder(EncoderConfig(qi_min=10, qi_max=30, gop_size=100),
                  w, h, backend="spec")
    enc.encode_frame(_flat(w, h))                   # frame 0: key
    enc.encode_frame(_flat(w, h, u=200, v=40))      # cut at frame 1 < 4
    assert not enc.last_frame_stats["is_key"]
    assert enc.stats.scene_changes_by_color == 0


def test_redo_as_key_on_bad_inter():
    """When the SSIM controller rejects an inter frame (avg SSIM below
    target), the frame is re-encoded as a key (vp8enc.cpp:443-453) and the
    stream still decodes."""
    from vp8oclenc_tpu.decoder.vp8dec import VP8Decoder

    w, h = 64, 48
    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, (h, w)).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    enc = Encoder(EncoderConfig(qi_min=110, qi_max=127, gop_size=100,
                                ssim_target=0.99), w, h, backend="spec")
    dec = VP8Decoder()
    dec.decode_frame(enc.encode_frame(Frame(base, u.copy(), v.copy())))
    # luma content fully replaced (chroma constant: no scene-change escape):
    # inter prediction fails everywhere, the controller must force a key
    y2 = rng.integers(0, 255, (h, w)).astype(np.uint8)
    payload = enc.encode_frame(Frame(y2, u.copy(), v.copy()))
    assert enc.last_frame_stats["is_key"]
    assert (enc.stats.scene_changes_by_ssim
            + enc.stats.scene_changes_by_replaced) >= 1
    out = dec.decode_frame(payload)
    assert out.is_key
    assert np.array_equal(out.y, enc.recon[0])


def test_dump_recon_cli_matches_decoder():
    """-dump-recon writes the encoder's reconstruction; it must equal the
    decoder oracle's output frame for frame (debug.h parity)."""
    import subprocess
    import sys
    import tempfile
    import os

    from vp8oclenc_tpu.io.y4m import Y4MWriter, Y4MReader
    from vp8oclenc_tpu.io.ivf import read_ivf
    from vp8oclenc_tpu.decoder.vp8dec import VP8Decoder

    w, h = 64, 48
    rng = np.random.default_rng(5)
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in.y4m")
        with open(src, "wb") as fh:
            yw = Y4MWriter(fh, w, h, 30, 1)
            base = rng.integers(0, 256, (h * 2, w * 2), dtype=np.uint8)
            for t in range(4):
                yw.write_frame(Frame(
                    np.ascontiguousarray(base[t:t + h, t:t + w]),
                    np.ascontiguousarray(base[t:t + h // 2, t:t + w // 2]),
                    np.ascontiguousarray(
                        base[t + 1:t + 1 + h // 2, t:t + w // 2])))
        out = os.path.join(td, "out.ivf")
        dump = os.path.join(td, "dump.y4m")
        r = subprocess.run(
            [sys.executable, "-m", "vp8oclenc_tpu", "-i", src, "-o", out,
             "-qmin", "10", "-qmax", "40", "-g", "2", "-backend", "spec",
             "-dump-recon", dump],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert r.returncode == 0, r.stderr
        _info, frames = read_ivf(open(out, "rb").read())
        dec = VP8Decoder()
        rd = Y4MReader(dump)
        for i, payload in enumerate(frames):
            got = dec.decode_frame(payload)
            ref = next(iter(rd))
            assert np.array_equal(got.y[:h, :w], ref.y), f"frame {i}"
            assert np.array_equal(got.u[:h // 2, :w // 2], ref.u), f"frame {i}"
            assert np.array_equal(got.v[:h // 2, :w // 2], ref.v), f"frame {i}"


def test_redo_as_key_speculative_tpu_matches_spec():
    """The TPU backend's SPECULATIVE redo-as-key (verdict read from the
    wire head at finalize, rollback to the pre-frame snapshot) must stay
    byte-identical to the synchronous spec path — in both encode_frame and
    the pipelined encode_frames (which must also re-dispatch the already-
    speculated next frame)."""
    w, h = 64, 48
    rng = np.random.default_rng(3)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    frames = [Frame(rng.integers(0, 255, (h, w)).astype(np.uint8),
                    u.copy(), v.copy()) for _ in range(4)]
    cfg = dict(qi_min=110, qi_max=127, gop_size=100, ssim_target=0.99)

    enc_s = Encoder(EncoderConfig(**cfg), w, h, backend="spec")
    want = [enc_s.encode_frame(f) for f in frames]
    assert (enc_s.stats.scene_changes_by_ssim
            + enc_s.stats.scene_changes_by_replaced) >= 2

    enc_t = Encoder(EncoderConfig(**cfg), w, h, backend="tpu")
    got = [enc_t.encode_frame(f) for f in frames]
    assert got == want
    assert (enc_t.stats.scene_changes_by_ssim
            + enc_t.stats.scene_changes_by_replaced) == \
        (enc_s.stats.scene_changes_by_ssim
         + enc_s.stats.scene_changes_by_replaced)

    enc_p = Encoder(EncoderConfig(**cfg), w, h, backend="tpu")
    got_p = list(enc_p.encode_frames(frames))
    assert got_p == want
