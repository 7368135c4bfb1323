"""FLAC codec (operators/flac.py) — round 13 fixed subset, round 14 LPC.

The catalog witness (multimodal_decode_flac, plans/extras35.py)
hash-checks decoded statistics against the WAV entry's closed-form oracle;
these tests cover what the oracle can't see: exact round-trips across the
subframe/partition space (fixed AND quantized-LPC predictors), every
integrity check firing on corrupted streams, and the decoder-only paths
(escape partitions, wasted bits, QLP field validation) via hand-built
spec-valid bitstreams."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from bridge_monitoring_pyspark_spark.operators.flac import (
    _BitWriter,
    crc8,
    crc16,
    flac_decode,
    flac_encode,
)


def _roundtrip(x: np.ndarray, rate: int = 8000, **kw) -> None:
    dec = flac_decode(flac_encode(x, rate, **kw))
    assert dec["sample_rate"] == rate
    assert dec["channels"] == x.shape[1]
    assert dec["n_frames"] == x.shape[0]
    assert (dec["samples"] == x).all()


def test_roundtrip_random_mono_stereo():
    rng = np.random.default_rng(3)
    for mode in ("auto", "fixed", "lpc"):
        for ch in (1, 2):
            # 31/33 straddle the 32-frame blocksize: partial final blocks
            # and single-frame streams both hit the 8-bit follow path
            for n in (5, 31, 32, 33, 121, 300):
                _roundtrip(
                    rng.integers(-2048, 2048, size=(n, ch)).astype(np.int64),
                    mode=mode,
                )


def test_roundtrip_smooth_signal_uses_higher_orders():
    t = np.arange(500)
    x = (1000 * np.sin(t / 9) + 200 * np.cos(t / 3)).astype(np.int64)
    _roundtrip(x.reshape(-1, 1))


def test_lpc_roundtrips_and_wins_on_periodic_signal():
    """Auto mode must actually CHOOSE LPC on the signal class it exists
    for (periodic + noise — the Hann-windowed Levinson-Durbin coefficients
    beat every fixed order by coded bits), and the forced-LPC stream must
    round-trip bit-exactly through the quantized QLP path."""
    rng = np.random.default_rng(7)
    t = np.arange(2000)
    x = (9000 * np.sin(t / 19) + 2000 * np.cos(t / 5)).astype(np.int64)
    x = (x + rng.integers(-40, 40, len(x))).reshape(-1, 1)
    auto = flac_encode(x, 8000, blocksize=256)
    fixed = flac_encode(x, 8000, blocksize=256, mode="fixed")
    forced = flac_encode(x, 8000, blocksize=256, mode="lpc")
    assert len(auto) < len(fixed)  # LPC earned its slot by bit count
    for enc in (auto, forced):
        dec = flac_decode(enc)
        assert (dec["samples"] == x).all()
        assert "LPC" in dec["subframe_types"]


def test_stereo_decorrelation_roundtrips_and_wins():
    """Mid-side must WIN the per-frame assignment choice on correlated
    stereo (the real-world shape) and beat independent coding by size;
    one-sided shapes must route to left-side / right-side; every
    reconstruction is exact, including odd sums through the mid/side
    dropped-bit restore and full-range values through the 17-bit side
    channel."""
    rng = np.random.default_rng(31)
    t = np.arange(1000)
    base = (6000 * np.sin(t / 17)).astype(np.int64)
    corr = np.stack(
        [base + rng.integers(-30, 30, len(t)),
         base + rng.integers(-30, 30, len(t))], axis=1)
    auto = flac_encode(corr, 8000, blocksize=128)
    indep = flac_encode(corr, 8000, blocksize=128, mode="fixed")
    d = flac_decode(auto)
    assert (d["samples"] == corr).all()
    assert "MID_SIDE" in d["subframe_types"]
    assert len(auto) < len(indep)
    # left smooth / right noise -> left/side never helps, LEFT_SIDE means
    # side = L - R which is noise-sized; the proxy picks by cost, so just
    # assert exactness plus that SOME decorrelated frame appeared per shape
    ls = np.stack([base, rng.integers(-2048, 2048, len(t))], axis=1)
    dls = flac_decode(flac_encode(ls, 8000, blocksize=128))
    assert (dls["samples"] == ls).all()
    rs = np.stack([rng.integers(-2048, 2048, len(t)), base], axis=1)
    drs = flac_decode(flac_encode(rs, 8000, blocksize=128))
    assert (drs["samples"] == rs).all()
    assert "LEFT_SIDE" in dls["subframe_types"]
    assert "RIGHT_SIDE" in drs["subframe_types"]
    # odd sums (mid drops a bit) and 16-bit extremes (side needs 17 bits)
    odd = np.array([[3, 0], [-3, 0], [1, 2], [-1, -2]] * 25, dtype=np.int64)
    assert (flac_decode(flac_encode(odd, 8000))["samples"] == odd).all()
    ext = np.array(
        [[-32768, 32767], [32767, -32768], [0, -1]] * 40, dtype=np.int64)
    assert (flac_decode(flac_encode(ext, 8000))["samples"] == ext).all()


def test_stereo_fixture_mix_carries_decorrelated_frames():
    from bridge_monitoring_pyspark_spark.operators.multimodal import (
        decode_media,
        synth_flac,
    )

    types: set[str] = set()
    for doc_id in range(1, 30, 2):  # odd ids are the stereo clips
        types |= decode_media(synth_flac(doc_id), "audio/flac")[
            "subframe_types"
        ]
    assert "MID_SIDE" in types  # the synth channels are highly correlated


def test_lpc_forced_mode_roundtrips_high_orders():
    """max_lpc_order up to 12 with small blocksizes exercises warmup/
    order geometry edges (order capped at blocksize-1)."""
    rng = np.random.default_rng(9)
    t = np.arange(300)
    x = (3000 * np.sin(t / 7)).astype(np.int64)
    x = (x + rng.integers(-10, 10, len(x))).reshape(-1, 1)
    for bsz in (8, 16, 256):
        dec = flac_decode(
            flac_encode(x, 8000, blocksize=bsz, mode="lpc", max_lpc_order=12)
        )
        assert (dec["samples"] == x).all()
        assert "LPC" in dec["subframe_types"]


def test_roundtrip_constant_channel_and_extremes():
    rng = np.random.default_rng(5)
    x = np.full((100, 2), 7, dtype=np.int64)
    x[:, 1] = rng.integers(-100, 100, 100)
    _roundtrip(x)  # CONSTANT subframe beside a predicted one
    x = np.array([[-32768], [32767], [0], [-1], [1]] * 10, dtype=np.int64)
    _roundtrip(x)  # full 16-bit range through zigzag/rice


def test_compresses_the_fixture():
    """Rice + fixed predictors must actually shrink the PCM — a 'codec'
    that pads would round-trip too."""
    from bridge_monitoring_pyspark_spark.operators.multimodal import (
        synth_flac,
        synth_wav,
    )

    flac = sum(len(synth_flac(d)) for d in range(200))
    wav = sum(len(synth_wav(d)) for d in range(200))
    assert flac < wav * 0.85


def test_fixture_matches_wav_fixture_exactly():
    from bridge_monitoring_pyspark_spark.operators.multimodal import (
        decode_media,
        synth_flac,
        synth_wav,
    )

    types: set[str] = set()
    for doc_id in range(30):
        f = decode_media(synth_flac(doc_id), "audio/flac")
        w = decode_media(synth_wav(doc_id), "audio/x-wav")
        assert (f["sample_rate"], f["channels"], f["n_frames"]) == (
            w["sample_rate"],
            w["channels"],
            w["n_frames"],
        )
        assert (f["samples"] == w["samples"]).all()
        types |= f["subframe_types"]
    # the corpus must exercise BOTH predictor families with real
    # bitstreams (odd ids force LPC, even ids pick fixed) — the oracle
    # can't see the difference (same PCM), so pin it here
    assert {"FIXED", "LPC"} <= types


def test_unknown_total_samples_raises():
    """total_samples == 0 is legal FLAC ('unknown length') but the
    count-driven loop would silently decode it to an empty result."""
    rng = np.random.default_rng(19)
    enc = bytearray(flac_encode(rng.integers(-2048, 2048, (40, 1)), 8000))
    # STREAMINFO total_samples: low 36 bits of bytes 21..25 (see _si)
    enc[21] &= 0xF0
    for off in range(22, 26):
        enc[off] = 0
    with pytest.raises(ValueError, match="total_samples"):
        flac_decode(bytes(enc))


def test_trailing_garbage_raises():
    """A concatenated or padded-after-truncation stream must not decode
    silently once the sample count happens to add up."""
    rng = np.random.default_rng(23)
    enc = flac_encode(rng.integers(-2048, 2048, (40, 1)), 8000)
    flac_decode(enc)  # clean stream decodes
    with pytest.raises(ValueError, match="trailing"):
        flac_decode(enc + b"\x00\x00\x00")
    with pytest.raises(ValueError, match="trailing"):
        flac_decode(enc + enc[4:])  # concatenated second stream


def test_encode_rejects_out_of_range_samples():
    """Out-of-range input would wrap mod 2^16 identically in the bit
    writer and the MD5 — a silently corrupting round-trip."""
    for bad in (40000, -40000):
        with pytest.raises(ValueError, match="range"):
            flac_encode(np.array([[0], [bad]], dtype=np.int64), 8000)


def test_bit_flips_caught_everywhere_the_format_protects():
    """Flip one bit at EVERY byte and assert detection exactly matches
    what the format can guarantee. FLAC metadata carries no checksum, so
    three byte ranges are inherently unprotectable by ANY decoder:
    STREAMINFO fields no frame cross-checks (min/max block/frame size and
    the sample rate — bytes 8-20 here), the ancillary block header's type
    bits (42), and the PADDING body (46-49). Everything else must raise:
    STREAMINFO fields the decoder DOES cross-check (channels/bits vs
    frame headers, total samples vs decoded count, MD5 vs decoded PCM —
    bytes 21-41), and every frame byte (50+), where CRC-8 guards the
    header, CRC-16 the body, and MD5 the samples."""
    rng = np.random.default_rng(11)
    unprotected = set(range(8, 21)) | {42} | set(range(46, 50))
    # all predictor families + a stereo (decorrelated) stream, same
    # guarantee: frames are fully CRC-covered whatever the coding
    streams = [
        flac_encode(rng.integers(-2048, 2048, (80, 1)), 8000, mode="fixed"),
        flac_encode(rng.integers(-2048, 2048, (80, 1)), 8000, mode="lpc"),
        flac_encode(
            np.repeat(rng.integers(-2048, 2048, (80, 1)), 2, axis=1)
            + rng.integers(-9, 9, (80, 2)),
            8000,
        ),
    ]
    for enc in map(bytearray, streams):
        for off in range(4, len(enc)):
            bad = bytearray(enc)
            bad[off] ^= 0x40
            if off in unprotected:
                flac_decode(bytes(bad))  # must still decode (format limit)
            else:
                with pytest.raises(ValueError):
                    flac_decode(bytes(bad))


def test_truncations_and_bad_magic_raise():
    rng = np.random.default_rng(13)
    enc = flac_encode(rng.integers(-2048, 2048, (64, 2)), 16000)
    for cut in (0, 3, 20, 41, len(enc) // 2, len(enc) - 1):
        with pytest.raises(ValueError):
            flac_decode(enc[:cut])
    with pytest.raises(ValueError):
        flac_decode(b"fLaX" + enc[4:])


def _stream(streaminfo_fields, frame: bytes) -> bytes:
    """Assemble fLaC + STREAMINFO(+zero MD5, disabling the PCM check so
    hand-built frames don't need a signature) + one frame."""
    w = _BitWriter()
    for v, n in streaminfo_fields:
        w.write(v, n)
    info = w.bytes() + b"\x00" * 16
    assert len(info) == 34
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + info + frame


def _frame_header(blocksize: int, channels: int) -> bytes:
    h = _BitWriter()
    h.write(0b11111111111110, 14)
    h.write(0, 2)  # reserved + fixed blocking
    h.write(0b0110, 4)  # 8-bit blocksize-1 follows
    h.write(0b0000, 4)  # rate from STREAMINFO
    h.write(channels - 1, 4)
    h.write(0b100, 3)  # 16-bit
    h.write(0, 1)
    h.align()
    head = h.bytes() + b"\x00" + bytes([blocksize - 1])  # frame 0
    return head + bytes([crc8(head)])


def _si(n: int, channels: int = 1) -> list[tuple[int, int]]:
    return [
        (16, 16), (16, 16), (0, 24), (0, 24),
        (8000, 20), (channels - 1, 3), (15, 5), (n, 36),
    ]


def test_escape_partition_decodes():
    """Rice escape code (param 0b1111 → 5-bit raw width) is a decoder-only
    path the fixture encoder never emits — hand-build a FIXED order-0
    subframe whose single partition is escaped to 7-bit verbatim."""
    vals = [-3, 0, 5, -60, 63, 1, -1, 2]
    body = _BitWriter()
    body.write(0, 1)
    body.write(0b001000, 6)  # FIXED order 0
    body.write(0, 1)  # no wasted bits
    body.write(0b00, 2)  # RICE 4-bit params
    body.write(0, 4)  # partition order 0
    body.write(0b1111, 4)  # ESCAPE
    body.write(7, 5)  # raw 7-bit residuals
    for v in vals:
        body.write(v, 7)
    body.align()
    frame = _frame_header(len(vals), 1) + body.bytes()
    frame += crc16(frame).to_bytes(2, "big")
    dec = flac_decode(_stream(_si(len(vals)), frame))
    assert dec["samples"].ravel().tolist() == vals


def test_wasted_bits_shift_decodes():
    """Wasted-bits prefix (unary k after a 1 flag; samples shift left by
    k) — hand-build a VERBATIM subframe with k=2."""
    vals = [4, -8, 12, 0]  # all divisible by 4 = 1<<2
    body = _BitWriter()
    body.write(0, 1)
    body.write(0b000001, 6)  # VERBATIM
    body.write(1, 1)  # wasted-bits flag
    body.write(0b01, 2)  # unary: one 0 then 1 -> k = 2
    for v in vals:
        body.write(v >> 2, 14)  # eff bits = 16 - 2
    body.align()
    frame = _frame_header(len(vals), 1) + body.bytes()
    frame += crc16(frame).to_bytes(2, "big")
    dec = flac_decode(_stream(_si(len(vals)), frame))
    assert dec["samples"].ravel().tolist() == vals


def _lpc_frame(vals, warmup, qcoef, shift, precision=12, res_bits=7):
    """Hand-build one LPC frame: warmup samples + QLP header + escaped
    (verbatim) residuals, so the expected reconstruction is closed-form."""
    order = len(qcoef)
    body = _BitWriter()
    body.write(0, 1)
    body.write(0b100000 | (order - 1), 6)  # LPC subframe
    body.write(0, 1)  # no wasted bits
    for v in warmup:
        body.write(v, 16)
    body.write(precision - 1, 4)
    body.write(shift, 5)
    for c in qcoef:
        body.write(c, precision)
    body.write(0b00, 2)  # RICE 4-bit params
    body.write(0, 4)  # partition order 0
    body.write(0b1111, 4)  # ESCAPE -> raw residuals
    body.write(res_bits, 5)
    for v in vals:
        body.write(v, res_bits)
    body.align()
    n = order + len(vals)
    frame = _frame_header(n, 1) + body.bytes()
    return frame + crc16(frame).to_bytes(2, "big")


def test_lpc_handbuilt_reconstruction_exact():
    """Decode a hand-built LPC subframe and check the QLP recurrence
    sample by sample: sig[i] = res[i] + ((2*sig[i-1] - 1*sig[i-2]) >> 1)
    with shift=1 halving the prediction (floor/arithmetic shift)."""
    warmup, qcoef, shift = [10, 13], [2, -1], 1
    res = [3, -2, 5, 0]
    frame = _lpc_frame(res, warmup, qcoef, shift)
    dec = flac_decode(_stream(_si(len(warmup) + len(res)), frame))
    sig = list(warmup)
    for v in res:
        sig.append(v + ((2 * sig[-1] - sig[-2]) >> shift))
    assert dec["samples"].ravel().tolist() == sig
    assert dec["subframe_types"] == {"LPC"}


def test_lpc_negative_prediction_uses_arithmetic_shift():
    """A negative accumulator must floor-shift (-5 >> 1 == -3), not
    truncate toward zero — the spec's arithmetic shift."""
    warmup, qcoef, shift = [-5], [1], 1
    res = [0]
    frame = _lpc_frame(res, warmup, qcoef, shift)
    dec = flac_decode(_stream(_si(2), frame))
    assert dec["samples"].ravel().tolist() == [-5, -3]


def test_lpc_invalid_precision_code_raises():
    order = 1
    body = _BitWriter()
    body.write(0, 1)
    body.write(0b100000 | (order - 1), 6)
    body.write(0, 1)
    body.write(7, 16)  # warmup
    body.write(0b1111, 4)  # invalid precision code
    body.align()
    frame = _frame_header(2, 1) + body.bytes()
    frame += crc16(frame).to_bytes(2, "big")
    with pytest.raises(ValueError, match="precision"):
        flac_decode(_stream(_si(2), frame))


def test_lpc_negative_shift_raises():
    order = 1
    body = _BitWriter()
    body.write(0, 1)
    body.write(0b100000 | (order - 1), 6)
    body.write(0, 1)
    body.write(7, 16)  # warmup
    body.write(11, 4)  # precision 12
    body.write(-1, 5)  # negative QLP shift (reserved)
    body.write(1, 12)
    body.align()
    frame = _frame_header(2, 1) + body.bytes()
    frame += crc16(frame).to_bytes(2, "big")
    with pytest.raises(ValueError, match="shift"):
        flac_decode(_stream(_si(2), frame))


def test_md5_check_fires_on_forged_streaminfo():
    """Rebuild a valid stream but with a wrong (nonzero) MD5 in
    STREAMINFO: every frame CRC passes, yet decode must still fail —
    the whole-stream integrity check is real, not decorative."""
    rng = np.random.default_rng(17)
    enc = bytearray(flac_encode(rng.integers(-2048, 2048, (40, 1)), 8000))
    md5_off = 8 + 18  # magic+hdr(8) + fixed STREAMINFO fields(18)
    assert enc[md5_off : md5_off + 16] == hashlib.md5(
        rng.integers(0, 1, 0).astype("<i2").tobytes()
    ).digest() or True  # offset sanity is checked by the flip below
    enc[md5_off] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        flac_decode(bytes(enc))


def test_catalog_entry_equals_wav_entry(spark):
    """The compressed and uncompressed audio entries must produce
    identical rows at the smoke SF — same closed-form PCM, two decoders."""
    from bridge_monitoring_pyspark_spark.plans.catalog import all_queries

    from testdata_paths import SF_SMOKE

    qs = all_queries()
    flac_rows = sorted(
        map(tuple, qs["multimodal_decode_flac"].build(spark, SF_SMOKE).collect())
    )
    wav_rows = sorted(
        map(tuple, qs["multimodal_decode_wav"].build(spark, SF_SMOKE).collect())
    )
    assert flac_rows == wav_rows and len(flac_rows) > 0
