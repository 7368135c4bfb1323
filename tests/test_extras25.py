"""Round-8 wave: real WAV/PCM audio decode through the multimodal slot."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bridge_monitoring_pyspark_spark.operators.multimodal import (
    _wav_decode,
    synth_wav,
)
from bridge_monitoring_pyspark_spark.plans.catalog import all_queries

from testdata_paths import SF_SMOKE


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + b"\x00" * (len(body) & 1)


def _wav(fmt_body: bytes, data: bytes, extra: bytes = b"") -> bytes:
    chunks = _chunk(b"fmt ", fmt_body) + extra + _chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _pcm16_fmt(channels: int = 1, rate: int = 8000) -> bytes:
    align = channels * 2
    return struct.pack("<HHIIHH", 1, channels, rate, rate * align, align, 16)


def test_wav_roundtrip_matches_closed_form():
    # ids chosen to hit mono AND stereo, every rate residue, and both
    # odd and even LIST-chunk body lengths (the RIFF pad-byte path)
    for doc_id in (0, 1, 2, 3, 4, 9, 56, 57, 123, 4567):
        wav = _wav_decode(synth_wav(doc_id))
        ch, nf = 1 + doc_id % 2, 64 + doc_id % 57
        assert wav["channels"] == ch
        assert wav["n_frames"] == nf
        assert wav["sample_rate"] == 8000 + 1000 * (doc_id % 5)
        assert wav["bits"] == 16
        i = np.arange(nf * ch)
        expected = ((doc_id * 31 + i * 97) % 4096) - 2048
        assert (wav["samples"].ravel() == expected).all()
        assert wav["samples"].shape == (nf, ch)


def test_wav_decode_pcm8_unsigned_centered():
    # 8-bit PCM is unsigned; 128 is silence. Odd data size exercises the
    # data chunk's own pad byte.
    d = _wav_decode(_wav(struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8),
                         bytes([0, 128, 255])))
    assert d["bits"] == 8
    assert d["samples"].ravel().tolist() == [-128, 0, 127]


def test_wav_decode_skips_ancillary_chunks():
    pcm = struct.pack("<4h", 100, -100, 200, -200)
    extra = _chunk(b"LIST", b"INFOICMT" + struct.pack("<I", 5) + b"abcd\x00")
    d = _wav_decode(_wav(_pcm16_fmt(), pcm, extra=extra))
    assert d["samples"].ravel().tolist() == [100, -100, 200, -200]


def test_wav_decode_rejects_corrupt_input():
    good = synth_wav(7)
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        _wav_decode(b"X" + good[1:])
    with pytest.raises(ValueError, match="RIFF size"):
        _wav_decode(good[:-1])
    with pytest.raises(ValueError, match="truncated"):
        # valid RIFF size but a chunk body cut short
        trunc = good[:40]
        _wav_decode(trunc[:4] + struct.pack("<I", len(trunc) - 8) + trunc[8:])
    with pytest.raises(ValueError, match="only PCM"):
        bad = bytearray(good)
        struct.pack_into("<H", bad, good.index(b"fmt ") + 8, 3)  # IEEE float
        _wav_decode(bytes(bad))
    with pytest.raises(ValueError, match="block align"):
        fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 2, 16)  # align lies
        _wav_decode(_wav(fmt, b"\x00" * 8))
    with pytest.raises(ValueError, match="whole number of frames"):
        _wav_decode(_wav(_pcm16_fmt(channels=2), b"\x00" * 6))
    with pytest.raises(ValueError, match="data chunk before fmt"):
        chunks = _chunk(b"data", b"\x00\x00") + _chunk(b"fmt ", _pcm16_fmt())
        _wav_decode(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks)
    with pytest.raises(ValueError, match="missing fmt or data"):
        chunks = _chunk(b"fmt ", _pcm16_fmt())
        _wav_decode(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks)


def test_png_adam7_decodes_same_pixels_as_progressive():
    from bridge_monitoring_pyspark_spark.operators.multimodal import (
        _png_decode,
        synth_png,
    )

    for doc_id in range(20):  # every (w, h) combo of the fixture grid
        prog = _png_decode(synth_png(doc_id))
        adam = _png_decode(synth_png(doc_id, interlaced=True))
        assert np.array_equal(prog["pixels"], adam["pixels"]), doc_id


def test_png_adam7_large_and_degenerate_dims():
    # Dims > 8 exercise every pass with multiple rows/cols; tiny dims
    # exercise the empty-pass skip on both encoder and decoder.
    import zlib

    from bridge_monitoring_pyspark_spark.operators.multimodal import (
        _ADAM7,
        _PNG_SIG,
        _png_chunk,
        _png_decode,
        _png_filter_scanlines,
    )

    rng = np.random.default_rng(7)
    for w, h in [(16, 12), (9, 9), (1, 1), (2, 3), (8, 1), (1, 9)]:
        pix3 = rng.integers(0, 256, size=(h, w, 3)).astype(np.int64)
        parts = []
        for pi, (x0, y0, dx, dy) in enumerate(_ADAM7):
            sub = pix3[y0::dy, x0::dx, :]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.append(
                _png_filter_scanlines(sub.reshape(sub.shape[0], -1), 3, phase=pi)
            )
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
        buf = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(b"".join(parts)))
               + _png_chunk(b"IEND", b""))
        assert np.array_equal(_png_decode(buf)["pixels"], pix3), (w, h)


def test_png_adam7_rejects_short_and_trailing_raster():
    import zlib

    from bridge_monitoring_pyspark_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        _png_decode,
    )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)  # gray 1x1 Adam7

    def img(raw: bytes) -> bytes:
        return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(raw))
                + _png_chunk(b"IEND", b""))

    assert _png_decode(img(b"\x00\x09"))["pixels"].tolist() == [[[9]]]
    with pytest.raises(ValueError, match="interlaced"):
        _png_decode(img(b"\x00"))  # pass cut short
    with pytest.raises(ValueError, match="trailing"):
        _png_decode(img(b"\x00\x09\xff"))  # bytes after the last pass


def test_png16_matches_closed_form():
    from bridge_monitoring_pyspark_spark.operators.multimodal import (
        _png_decode,
        synth_png16,
    )

    for doc_id in (0, 5, 11, 123):
        got = _png_decode(synth_png16(doc_id))
        w, h = 4 + doc_id % 5, 3 + doc_id % 4
        i = np.arange(w * h)
        expected = ((doc_id * 9 + i * 257) % 65536).reshape(h, w, 1)
        assert got["pixels"].dtype == np.uint16
        assert np.array_equal(got["pixels"], expected), doc_id


def test_y4m_roundtrip_matches_closed_form():
    from bridge_monitoring_pyspark_spark.operators.multimodal import (
        _y4m_decode,
        synth_y4m,
    )

    for doc_id in range(12):  # every (w, h, nf, fps) combo
        v = _y4m_decode(synth_y4m(doc_id))
        w, h, nf = 4 + 2 * (doc_id % 3), 4 + 2 * (doc_id % 2), 3 + doc_id % 4
        assert (v["width"], v["height"], v["n_frames"]) == (w, h, nf)
        assert (v["fps_num"], v["fps_den"]) == (24 + doc_id % 2, 1)
        i = np.arange(w * h)
        for f in range(nf):
            expected = ((doc_id * 11 + f * 131 + i * 17) % 256).reshape(h, w)
            assert np.array_equal(v["frames"][f], expected), (doc_id, f)


def test_y4m_colorspace_variants_and_default():
    from bridge_monitoring_pyspark_spark.operators.multimodal import _y4m_decode

    v = _y4m_decode(b"YUV4MPEG2 W2 H2 F30:1 C444\n"
                    b"FRAME\n" + bytes(range(12)))
    assert v["frames"][0].tolist() == [[0, 1], [2, 3]]
    v = _y4m_decode(b"YUV4MPEG2 W2 H2 F30:1 Cmono\n"
                    b"FRAME\n" + bytes([9, 8, 7, 6]))
    assert v["frames"][0].tolist() == [[9, 8], [7, 6]]
    v = _y4m_decode(b"YUV4MPEG2 W2 H4 F30:1 C422\n"
                    b"FRAME\n" + bytes(16))  # 8 luma + 2*(1*4) chroma
    assert v["n_frames"] == 1
    # no C tag -> spec default C420jpeg
    v = _y4m_decode(b"YUV4MPEG2 W2 H2 F30:1\n" + b"FRAME\n" + bytes(6))
    assert v["colorspace"] == "420jpeg"


def test_y4m_rejects_corrupt_input():
    from bridge_monitoring_pyspark_spark.operators.multimodal import (
        _y4m_decode,
        synth_y4m,
    )

    good = synth_y4m(3)
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        _y4m_decode(b"XUV" + good[3:])
    with pytest.raises(ValueError, match="truncated frame"):
        _y4m_decode(good[:-1])
    with pytest.raises(ValueError, match="FRAME marker"):
        _y4m_decode(good.replace(b"FRAME Xsynth", b"FRAMI Xsynth"))
    with pytest.raises(ValueError, match="even dimensions"):
        _y4m_decode(b"YUV4MPEG2 W5 H4 F25:1 C420jpeg\n")
    with pytest.raises(NotImplementedError, match="colorspace"):
        _y4m_decode(good.replace(b"C420jpeg", b"C411what"))


def test_video_frame_luma_samples_even_frames(spark):
    rows = all_queries()["video_frame_luma"].build(spark, SF_SMOKE).collect()
    from bridge_monitoring_pyspark_spark.operators.multimodal import (
        _y4m_decode,
        synth_y4m,
    )

    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    for doc_id, frames in list(by_doc.items())[:10]:
        vid = _y4m_decode(synth_y4m(doc_id))
        assert [r.frame_idx for r in sorted(frames, key=lambda r: r.frame_idx)] \
            == list(range(0, vid["n_frames"], 2))
        for r in frames:
            luma = vid["frames"][r.frame_idx].astype(np.int64)
            assert r.luma_sum == int(luma.sum())
            assert (r.luma_min, r.luma_max) == (int(luma.min()), int(luma.max()))


def test_scene_cut_stats_matches_numpy(spark):
    rows = all_queries()["video_scene_cuts"].build(spark, SF_SMOKE).collect()
    from bridge_monitoring_pyspark_spark.operators.multimodal import (
        _y4m_decode,
        synth_y4m,
    )

    assert rows
    for r in rows[:10]:
        vid = _y4m_decode(synth_y4m(r.doc_id))
        n_px = vid["width"] * vid["height"]
        deltas = [
            int(np.abs(vid["frames"][f].astype(np.int64)
                       - vid["frames"][f - 1].astype(np.int64)).sum())
            for f in range(1, vid["n_frames"])
        ]
        assert r.n_frames == vid["n_frames"]
        assert r.n_cuts == sum(1 for d in deltas if d > 40 * n_px)
        assert r.max_delta == max(deltas)


def test_decode_audio_stats_matches_numpy(spark):
    rows = (
        all_queries()["multimodal_decode_wav"].build(spark, SF_SMOKE).collect()
    )
    assert rows, "empty decode output"
    for r in rows[:20]:
        wav = _wav_decode(synth_wav(r.doc_id))
        s = wav["samples"].astype(np.int64)
        ch0 = s[:, 0]
        nonneg = ch0 >= 0
        assert r.sample_rate == wav["sample_rate"]
        assert r.channels == wav["channels"]
        assert r.n_frames == wav["n_frames"]
        assert r.sum_samples == int(s.sum())
        assert r.sum_abs == int(np.abs(s).sum())
        assert r.peak_abs == int(np.abs(s).max())
        assert r.zero_cross == int((nonneg[1:] != nonneg[:-1]).sum())


def test_audio_frame_energy_windows(spark):
    rows = (
        all_queries()["audio_frame_energy"].build(spark, SF_SMOKE).collect()
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    for doc_id, wins in list(by_doc.items())[:10]:
        ch0 = _wav_decode(synth_wav(doc_id))["samples"][:, 0].astype(np.int64)
        wins.sort(key=lambda r: r.window_idx)
        assert [w.window_idx for w in wins] == list(range(len(wins)))
        assert sum(w.win_frames for w in wins) == len(ch0)
        for w in wins:
            seg = ch0[w.window_idx * 16 : w.window_idx * 16 + 16]
            assert w.win_frames == len(seg)
            assert w.energy == int((seg * seg).sum())
